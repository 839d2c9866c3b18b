"""Weight decay as an explicit loss term.

TF's ``kernel_regularizer=l2_regularizer(scale)`` adds ``scale * sum(w^2)/2``
per kernel into the losses collection, which ``tf.losses.get_total_loss()``
silently folds into the training objective (UNetSound 8e-5
``/root/reference/models/unet_sound2.py:159``, video UNet 7e-5, ResNet 5e-4
via ``vision.py:54``). Here it is explicit: sum over *kernel* leaves
(biases and BN scales carry no regularizer in the reference) of a param
subtree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_KERNEL_LEAF_NAMES = ("kernel", "weights")


def l2_regularization(params, scale: float) -> jnp.ndarray:
    """0.5 * scale * sum of squared kernel entries over the pytree."""
    if scale == 0.0:
        return jnp.float32(0.0)
    total = jnp.float32(0.0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", None))
        if key in _KERNEL_LEAF_NAMES:
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return 0.5 * scale * total
