"""TF1-exact Adam.

``tf.compat.v1.train.AdamOptimizer`` (what every reference trainer uses,
e.g. ``/root/reference/trainer/mfcctrainer.py:64``) applies

    lr_t   = lr * sqrt(1 - b2^t) / (1 - b1^t)
    theta -= lr_t * m_t / (sqrt(v_t) + eps)

i.e. the bias correction is folded into the step size and ``eps`` is
added to the *uncorrected* ``sqrt(v_t)``. ``optax.adam`` instead adds
``eps`` to the bias-corrected ``sqrt(v_hat)`` — equivalent to TF with an
epsilon inflated by ``1/sqrt(1 - b2^t)`` (~32x at step 1), which is
enough to push trained weights ~half an update-step apart over the first
few iterations (measured in tests/test_parity_tf.py's trajectory test).
This module provides the TF1 form so training is parity-exact; the
Trainer uses it by default (``OptimConfig.tf1_adam``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def scale_by_tf1_adam(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, updates
        )
        count = state.count + 1
        t = count.astype(jnp.float32)
        alpha = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        out = jax.tree_util.tree_map(
            lambda m, v: alpha * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adam_tf1(
    learning_rate: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Drop-in ``optax.adam`` replacement with TF1 AdamOptimizer numerics."""
    return optax.chain(
        scale_by_tf1_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-learning_rate),
    )
