"""Classification losses/metrics (``/root/reference/models/base.py:86-148``,
``/root/reference/trainer/trainer_class.py:47-56``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(labels_onehot, logits) -> jnp.ndarray:
    """``tf.nn.softmax_cross_entropy_with_logits`` + mean over batch."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(-jnp.sum(labels_onehot * logp, axis=-1))


def accuracy(logits, labels_onehot) -> jnp.ndarray:
    """argmax-match accuracy (``base.buildAccuracy``)."""
    pred = jnp.argmax(logits, axis=1)
    true = jnp.argmax(labels_onehot, axis=1)
    return jnp.mean((pred == true).astype(jnp.float32))
