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


def make_mesh(
    num_devices: int | None = None,
    *,
    data_axis: str = "data",
    model_parallel: int = 1,
    model_axis: str = "model",
) -> Mesh:
    """1-axis ``data`` mesh, or a 2D ``(data, model)`` mesh when
    ``model_parallel > 1`` (tensor parallelism: the model axis is the
    minor/fastest-varying one so TP collectives ride adjacent ICI links)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if model_parallel <= 1:
        return Mesh(np.asarray(devices), axis_names=(data_axis,))
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=(data_axis, model_axis))


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


def form_global_batch(batch, mesh: Mesh):
    """Assemble the globally-sharded batch from this process's local rows.

    Companion of the loader's host sharding
    (``data/pipeline.AcousticImageDataLoader(shard_index=, shard_count=)``):
    each host reads/decodes only its contiguous row slice of every global
    batch; this stitches those rows into one global ``jax.Array`` whose
    leading axis is sharded over the ``data`` mesh axis. Multi-process,
    the rows land on the host's own addressable devices
    (``jax.make_array_from_process_local_data``) — no cross-host batch
    movement, only the gradient all-reduce crosses hosts. Single-process
    this degrades to :func:`shard_batch`.

    Requires the standard SPMD layout contract: hosts appear in the mesh
    in process order and ``local rows x process_count = global rows``
    (the loader guarantees the row counts; meshes from :func:`make_mesh`
    use ``jax.devices()`` order, which satisfies the former).
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def fsdp_sharding(params, mesh: Mesh, *, min_size: int = 1 << 18,
                  min_shard_rows: int = 8):
    """ZeRO-3-style parameter sharding over the data axis.

    Large parameters are split along a *channel* axis; everything else
    stays replicated. Gradients and Adam moments inherit the layout
    through jit, so optimizer-state HBM scales down with the mesh; XLA
    inserts the all-gathers before use and reduce-scatters on the
    gradients (the standard FSDP schedule), riding ICI. The reference has
    no counterpart (single GPU); this exists so the framework scales past
    per-chip HBM without model surgery.

    Layout policy (round 2 — fixes the round-1 "involuntary full
    rematerialization" SPMD warnings): only the last two axes are
    candidates (the I/O channel dims of HWIO conv kernels and the in/out
    dims of dense kernels — sharding *spatial* kernel dims produces
    layouts the partitioner cannot service), preferring the trailing
    (output) axis; a parameter must hold at least ``min_size`` elements
    AND give every device at least ``min_shard_rows`` rows of the chosen
    axis. Small conv kernels (e.g. the 3x3x133x128 UNet decoder convs
    whose transposed/grad ops triggered the warnings) stay replicated —
    their bytes are noise next to the ResNet trunk and the Adam moments
    this rule exists to split.
    """
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]

    def spec(p):
        shape = getattr(p, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if size >= min_size and len(shape) >= 2:
            for i in (len(shape) - 1, len(shape) - 2):
                if shape[i] % n == 0 and shape[i] // n >= min_shard_rows:
                    parts = [None] * len(shape)
                    parts[i] = axis
                    return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def tp_sharding(params, mesh: Mesh, *, min_channels: int = 256):
    """Tensor-parallel layout over a 2D ``(data, model)`` mesh.

    Conv/dense kernels with a wide trailing (output-channel) dimension are
    split over the ``model`` axis; XLA/GSPMD propagates channel-sharded
    activations through the network and inserts the per-layer collectives
    (all-gathers where a conv needs its full input channels, partial-sum
    reductions where the contraction dim is sharded) — the standard
    Megatron-style schedule, derived entirely from sharding annotations.
    Everything else (biases, BN affines/stats, small kernels, scalars)
    stays replicated over the whole mesh. Apply to a TrainState shape
    tree: Adam moments share the params' shapes, so one rule shards them
    identically and optimizer HBM scales down with the model axis.

    Like :func:`fsdp_sharding`, only layouts the partitioner can service
    are chosen: trailing axis only, divisible by the axis size, at least
    ``min_channels`` channels so each device keeps a full MXU lane tile,
    and **4-D conv kernels only**. Dense (2-D) kernels in this model
    family all border the 150-d VAE latent (e.g. the generator's
    150->2304 latent-decode dense); column-splitting one propagates a
    model-axis sharding onto the tiny latent tensors, whose reshapes the
    SPMD partitioner can only service by involuntary full
    rematerialization (verified at full depth by
    ``__graft_entry__.compile_full_depth``) — and the bytes saved are
    noise next to the trunk convs this rule exists to split.
    """
    assert "model" in mesh.axis_names, "tp_sharding needs a (data, model) mesh"
    n = mesh.shape["model"]

    def spec(p):
        shape = getattr(p, "shape", ())
        if len(shape) == 4 and shape[-1] >= min_channels and shape[-1] % n == 0:
            parts = [None] * len(shape)
            parts[-1] = "model"
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def spatial_sharding(mesh: Mesh, *, rank: int = 4) -> NamedSharding:
    """Spatial partitioning for serving: split an image batch's HEIGHT
    dimension over the data axis, so a latency-bound request whose batch
    is smaller than the mesh still uses every chip. GSPMD inserts the
    halo exchanges the convolution windows need at partition boundaries.
    ``rank``: ndim of the activation (4 = NHWC)."""
    parts = [None] * rank
    parts[1] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*parts))
