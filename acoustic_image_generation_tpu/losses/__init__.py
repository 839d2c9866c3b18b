from acoustic_image_generation_tpu.losses.classify import (
    accuracy,
    softmax_cross_entropy,
)
from acoustic_image_generation_tpu.losses.metric import (
    nca_loss,
    pairwise_sq_distances,
    triplet_all,
    triplet_hard,
)
from acoustic_image_generation_tpu.losses.recon import (
    huber_tf,
    kl_diag_gaussian,
    mse_tf,
    sigmoid_ce_logits,
)
from acoustic_image_generation_tpu.losses.regularization import l2_regularization

__all__ = [
    "accuracy",
    "softmax_cross_entropy",
    "nca_loss",
    "pairwise_sq_distances",
    "triplet_all",
    "triplet_hard",
    "huber_tf",
    "kl_diag_gaussian",
    "mse_tf",
    "sigmoid_ce_logits",
    "l2_regularization",
]
