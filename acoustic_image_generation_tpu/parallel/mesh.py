"""Device mesh + sharding policy.

New subsystem with no reference counterpart (the reference is single-GPU,
``/root/reference/main.py:176,287``; SURVEY.md §2.6). Default layout is a
1-axis ``data`` mesh over all local devices (a TPU v5e-8 slice over ICI):

- batches are sharded on their leading axis (clips/frames);
- params, batch stats and optimizer state are fully replicated;
- gradient all-reduce is inserted by XLA/pjit automatically from the
  sharding annotations — no hand-written collectives needed at these model
  sizes (the largest model, ResNet50, is ~25M params ≈ 100 MB f32, far
  under per-chip HBM).

A second ``model`` axis is accepted for future tensor sharding; everything
here is written against ``jax.sharding`` so multi-host DCN meshes work
unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, *, data_axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=(data_axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batch arrays."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array leaf of ``batch`` with its leading axis split over
    the data axis. Leading dims must divide the mesh size (the host
    pipeline pads remainder batches to keep shapes static)."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
