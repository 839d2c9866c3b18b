"""Functional training state (replaces TF graph variables + Saver slots)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar; epoch bookkeeping lives host-side
    params: Any
    batch_stats: Any  # {} when no BN in the task's models
    opt_state: Any
