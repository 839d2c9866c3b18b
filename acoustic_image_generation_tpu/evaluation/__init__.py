from acoustic_image_generation_tpu.evaluation.aggregate import trimmed_mean_std
from acoustic_image_generation_tpu.evaluation.iou import (
    box_weighted_iou,
    energy_mask,
    iou_real_vs_generated,
    localization_auc,
    threshold_fractions,
)
from acoustic_image_generation_tpu.evaluation.knn import knn_accuracy
from acoustic_image_generation_tpu.evaluation.retrieve import retrieval_ranks

__all__ = [
    "trimmed_mean_std",
    "box_weighted_iou",
    "energy_mask",
    "iou_real_vs_generated",
    "localization_auc",
    "threshold_fractions",
    "knn_accuracy",
    "retrieval_ranks",
]
