"""Reconstruction and latent losses with TF-1 reduction conventions.

The reference sums whatever landed in the ``tf.losses`` collection
(MSE + Huber + L2 regularizers) and adds a separately weighted KL
(``/root/reference/trainer/mfcctrainer.py:46-62``). Two KL conventions
coexist and both are kept:
- ``reduce_sum`` over the latent then ``FLAGS.latent_loss *
  reduce_mean`` over the batch (``mfcctrainer.py:56-59``);
- the same sum-KL divided by 1e6 (``trainer_three.py:60-66,110``).
Both are expressed through ``kl_diag_gaussian`` + an external weight.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse_tf(labels, predictions) -> jnp.ndarray:
    """``tf.losses.mean_squared_error``: mean over all elements."""
    return jnp.mean(jnp.square(predictions.astype(jnp.float32) - labels.astype(jnp.float32)))


def huber_tf(labels, predictions, delta: float = 1.0) -> jnp.ndarray:
    """``tf.losses.huber_loss``: elementwise Huber (delta=1), mean reduction
    (SUM_BY_NONZERO_WEIGHTS == mean for unit weights)."""
    err = predictions.astype(jnp.float32) - labels.astype(jnp.float32)
    abs_err = jnp.abs(err)
    quadratic = jnp.minimum(abs_err, delta)
    linear = abs_err - quadratic
    return jnp.mean(0.5 * quadratic**2 + delta * linear)


def sigmoid_ce_logits(labels, logits) -> jnp.ndarray:
    """``tf.nn.sigmoid_cross_entropy_with_logits`` (mean reduction):
    elementwise binary cross-entropy computed stably in LOGIT space,
    ``max(l,0) - l*t + log1p(exp(-|l|))`` == ``t*-logsigmoid(l) +
    (1-t)*-logsigmoid(-l)``.

    Not part of the reference's generation loss (``mfcctrainer.py:46-62``
    uses MSE+Huber on the sigmoid output) — provided as the opt-in
    reconstruction term for sparse targets, where the MSE gradient's
    ``sigmoid'(l)`` factor underflows to exactly zero once Adam drives
    background logits past ~-88 and training dies (the dead-sigmoid
    collapse; docs/RESULTS.md, scripts/diag_collapse.py). The BCE
    gradient w.r.t. the logit is ``sigmoid(l) - t``: bounded, never
    identically zero, self-correcting at any saturation depth."""
    l = logits.astype(jnp.float32)
    t = labels.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(l, 0.0) - l * t + jnp.log1p(jnp.exp(-jnp.abs(l)))
    )


def kl_diag_gaussian(mean, std, eps: float = 1e-8) -> jnp.ndarray:
    """Per-sample KL(N(mean, std) || N(0, 1)) in the reference's exact form:
    ``0.5 * sum(mean^2 + std^2 - log(eps + std^2) - 1, axis=1)``
    (``mfcctrainer.py:56-57``). Returns shape (batch,); callers apply their
    own batch reduction and weight."""
    m = mean.astype(jnp.float32)
    s = std.astype(jnp.float32)
    return 0.5 * jnp.sum(jnp.square(m) + jnp.square(s) - jnp.log(eps + jnp.square(s)) - 1.0, axis=1)
