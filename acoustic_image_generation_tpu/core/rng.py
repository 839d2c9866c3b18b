"""Explicit keyed RNG policy.

The reference draws reparameterization noise from graph-global
``tf.random_normal`` (``/root/reference/models/unet_noconc.py:64``) and
modality dropout from ``tf.random_uniform``
(``/root/reference/trainer/trainer_three.py:470-474``) with no seed
discipline. Here every stochastic consumer derives its key from a single
experiment seed via deterministic folds, so runs are exactly replayable:

    key(seed) --fold epoch--> epoch key --fold step--> step key
    step key --split by role--> {"latent", "moddrop", "dropout", "data"}
"""

from __future__ import annotations

import jax

# Stable role indices: folding by name hash would depend on PYTHONHASHSEED.
_ROLES = ("latent", "moddrop", "dropout", "data", "init")
_ROLE_INDEX = {name: i for i, name in enumerate(_ROLES)}


def experiment_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    return jax.random.fold_in(key, epoch)


def step_key(key: jax.Array, step) -> jax.Array:
    """Fold in a step index. ``step`` may be a traced int32 inside jit."""
    return jax.random.fold_in(key, step)


def role_key(key: jax.Array, role: str) -> jax.Array:
    return jax.random.fold_in(key, _ROLE_INDEX[role])


def train_step_rngs(key: jax.Array, step) -> dict[str, jax.Array]:
    """The rng dict handed to flax ``Module.apply`` for one train step
    (plus "data" for batch-level augmentations like the music
    correspondence shuffle)."""
    k = step_key(key, step)
    return {
        role: role_key(k, role) for role in ("latent", "moddrop", "dropout", "data")
    }
