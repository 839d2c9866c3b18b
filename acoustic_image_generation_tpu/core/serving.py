"""Self-contained StableHLO serving artifacts (``jax.export``).

The reference stack has no serving layer — deployment means carrying the
full TF1 Python stack plus a checkpoint (SURVEY.md §1: "no scheduler, no
distributed communication layer, no serving layer"; the closest thing is
re-running ``main.py --mode test``). The TPU build ships a real one: a
trained generator's forward pass — mfcc-map tiling + ResNet50
conditioning + UNet decode, optionally followed by the ``find_logen``
energy inversion (``/root/reference/iouenergythreshold.py:294-323``) —
is serialized into ONE versioned artifact with the weights baked in as
StableHLO constants. Any JAX runtime on the artifact's platforms
executes it with no model code, no Python config, and no checkpoint
plumbing:

    model = load_artifact("flagship.aigserve")
    gen, energy = model.generate(mfcc, video, seed=0)

The batch dimension is shape-polymorphic by default (one compile serves
any batch size); weights are f32/bf16 exactly as trained, and the int8
trunk (``trunk_quant="int8"``) bakes its calibrated scales in, so the
artifact reproduces the serving ladder of docs/PERF.md bit-for-bit.

Artifact layout (a directory):
  ``module.stablehlo``  serialized ``jax.export.Exported`` bytes
  ``manifest.json``     format version, input/output signature,
                        channels, platforms, SHA-256 weight digest
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

FORMAT = "aig-serving-v1"


def runtime_platforms() -> tuple:
    """Lowering-platform names servable by this process's backend.

    ``jax.default_backend()`` reports the *backend* name — ``'gpu'`` on
    both CUDA and ROCm runtimes — while ``jax.export`` lowering
    platforms are spelled ``'cuda'``/``'rocm'``. Resolve the concrete
    vendor from the device platform version so a cuda-lowered artifact
    loads on a CUDA runtime but a rocm-only artifact is still rejected
    there (not deferred to a confusing first-call failure)."""
    backend = jax.default_backend()
    if backend == "gpu":
        return (default_export_platform(),)
    return (backend,)


def default_export_platform() -> str:
    """The lowering-platform name matching *this* runtime.

    Used both to pick a valid export platform (e.g. ``bench.py``'s
    artifact mode — ``'gpu'`` is not a lowering name) and by
    :func:`runtime_platforms` to gate artifact loading: on a GPU
    backend the concrete vendor comes from the device platform
    version."""
    backend = jax.default_backend()
    if backend != "gpu":
        return backend
    version = getattr(jax.devices()[0].client, "platform_version", "")
    return "rocm" if "rocm" in version.lower() else "cuda"


def _write_artifact(
    exported, out_dir: str, manifest: dict, weight_leaves=None
) -> dict:
    """Serialize an ``Exported`` + manifest into the artifact directory;
    fills the ``format``/``module_bytes``/``module_sha256`` fields and
    returns the completed manifest. When ``weight_leaves`` is given the
    artifact uses external weights: the flat leaf list is written to
    ``weights.msgpack`` (flax msgpack — preserves bf16/int8/f8 dtypes)
    and the module expects them as its leading call arguments."""
    import flax.serialization

    os.makedirs(out_dir, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(out_dir, "module.stablehlo"), "wb") as f:
        f.write(blob)
    manifest = {
        "format": FORMAT,
        **manifest,
        "module_bytes": len(blob),
        "module_sha256": hashlib.sha256(blob).hexdigest(),
    }
    if weight_leaves is not None:
        wblob = flax.serialization.to_bytes(list(weight_leaves))
        with open(os.path.join(out_dir, "weights.msgpack"), "wb") as f:
            f.write(wblob)
        manifest["external_weights"] = True
        manifest["weights_bytes"] = len(wblob)
        manifest["external_weights_sha256"] = hashlib.sha256(wblob).hexdigest()
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def _export_external(serve, weights, args, platforms):
    """Lower ``serve(weights, *inputs)`` with the weight pytree as module
    *arguments* instead of baked StableHLO constants.

    Baked-constant modules embed every parameter in the serialized
    StableHLO, which makes the large-latent projection/joint modules
    ~460 MB — bigger than some proxied runtimes' compile-request caps
    (docs/SERVING.md). External mode keeps the module a few MB of pure
    program; the weights travel beside it in ``weights.msgpack`` and
    :func:`load_artifact` re-attaches them. Returns ``(exported,
    flat_host_leaves)``."""
    leaves, treedef = jax.tree_util.tree_flatten(weights)
    leaves = [np.asarray(leaf) for leaf in leaves]

    def serve_flat(flat, *inputs):
        return serve(jax.tree_util.tree_unflatten(treedef, flat), *inputs)

    leaf_ts = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves]
    exported = jax_export.export(jax.jit(serve_flat), platforms=list(platforms))(
        leaf_ts, *args
    )
    return exported, leaves


def _batch_dim(batch):
    """\"poly\" -> a fresh symbolic batch dim; int -> itself."""
    if batch == "poly":
        (b,) = jax_export.symbolic_shape("b")
        return b
    return int(batch)


def _spatial_serving_mesh(n: int):
    """A 1-axis local mesh of ``n`` devices plus the spatial-serving
    shardings (video height split — ``parallel.spatial_sharding``
    semantics — and replicated)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = jax.devices()
    if len(devs) < n:
        raise RuntimeError(
            f"spatial_shards={n} needs {n} local devices, have {len(devs)}"
        )
    mesh = Mesh(np.array(devs[:n]), ("data",))
    vid_sh = NamedSharding(mesh, PartitionSpec(None, "data"))
    rep = NamedSharding(mesh, PartitionSpec())
    return mesh, vid_sh, rep


def _params_digest(*trees: Any) -> str:
    h = hashlib.sha256()
    for tree in trees:
        for leaf in jax.tree_util.tree_leaves(tree):
            arr = np.asarray(jax.device_get(leaf))
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes())
    return h.hexdigest()


def export_generation(
    task,
    state,
    out_dir: str,
    *,
    energy: bool = False,
    qtrunk=None,
    batch: int | str = "poly",
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    spatial_shards: int = 1,
    external_weights: bool = False,
) -> dict:
    """Serialize ``task.generate`` (GenerationTask) around a trained
    ``state`` into a deployable artifact directory.

    Args:
      task: a task exposing ``generate(params, batch_stats, mfcc, video,
        key, qtrunk=)`` — the flagship ``GenerationTask``.
      state: trained ``TrainState`` (params + batch_stats are baked into
        the module as constants).
      out_dir: artifact directory (created; files overwritten).
      energy: also emit the ``find_logen`` spatial energy map as a second
        output (12-channel recipes only).
      qtrunk: calibrated int8 trunk pytree (``Trainer._qtrunk``) to bake
        in, or None for the bf16/f32 trunk.
      batch: "poly" for a shape-polymorphic batch dimension, or a fixed
        int batch size. Measured on v5e (docs/PERF.md): polymorphism is
        ~free for the bf16 trunk but HALVES int8-trunk throughput (s8
        conv schedules specialize on static shapes) — export int8
        artifacts at fixed batch sizes.
      platforms: lowering platforms for the artifact.
      spatial_shards: >1 bakes the spatial-partitioned serving layout in
        (``parallel.spatial_sharding``): the video's height dimension is
        split over that many devices and GSPMD's halo exchanges ride the
        module, so a latency-bound request uses a whole slice. Requires
        that many local devices at export AND serve time; the serve-time
        platform must also match (a sharded module is not
        cross-platform-portable the way a 1-device one is).
      external_weights: ship the weights in ``weights.msgpack`` next to
        a small pure-program module instead of baking them in as
        StableHLO constants (incompatible with ``spatial_shards>1``).

    Returns the manifest dict.
    """
    from acoustic_image_generation_tpu.dsp.energy import find_logen

    channels = int(task.cfg.data.num_channels)
    if energy and channels != 12:
        raise ValueError("energy inversion is defined for 12-channel MFCC images")
    if external_weights and spatial_shards > 1:
        raise ValueError(
            "external_weights is incompatible with spatial_shards>1 "
            "(the sharded module bakes replicated weight constants)"
        )
    if qtrunk is not None and getattr(task.cfg.model, "fused_qgemm", False):
        raise ValueError(
            "export with fused_qgemm is unsupported: the Pallas GEMM "
            "lowers as a TPU-only Mosaic custom call (artifacts must be "
            "platform-portable) and the fused path measured slower than "
            "XLA anyway (docs/PERF.md) — export without --fused_qgemm"
        )
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    qtrunk_host = jax.device_get(qtrunk) if qtrunk is not None else None
    weights = {"params": params, "batch_stats": batch_stats}
    if qtrunk_host is not None:
        weights["qtrunk"] = qtrunk_host

    def serve(w, mfcc, video, seed):
        key = jax.random.key(seed)
        gen = task.generate(
            w["params"], w["batch_stats"], mfcc, video, key,
            qtrunk=w.get("qtrunk"),
        )
        return (gen, find_logen(gen)) if energy else (gen,)

    b = _batch_dim(batch)
    args = (
        jax.ShapeDtypeStruct((b, 12), np.float32),
        jax.ShapeDtypeStruct((b, 224, 298, 3), np.float32),
        jax.ShapeDtypeStruct((), np.int32),
    )
    leaves = None
    if external_weights:
        exported, leaves = _export_external(serve, weights, args, platforms)
    else:
        baked = lambda m, v, s: serve(weights, m, v, s)  # noqa: E731
        if spatial_shards > 1:
            mesh, vid_sh, rep = _spatial_serving_mesh(spatial_shards)
            jit_serve = jax.jit(
                baked,
                in_shardings=(rep, vid_sh, rep),
                out_shardings=rep,
            )
        else:
            jit_serve = jax.jit(baked)
        exported = jax_export.export(jit_serve, platforms=list(platforms))(*args)

    return _write_artifact(exported, out_dir, weight_leaves=leaves, manifest={
        "kind": "generation",
        "platforms": list(platforms),
        "batch": "poly" if batch == "poly" else int(batch),
        "channels": channels,
        "energy": bool(energy),
        "spatial_shards": int(spatial_shards),
        "trunk_quant": "int8" if qtrunk_host is not None else "none",
        "inputs": {
            "mfcc": ["b", 12],
            "video": ["b", 224, 298, 3],
            "seed": [],
        },
        "outputs": (["generated", "energy"] if energy else ["generated"]),
        "weights_sha256": _params_digest(params, batch_stats, qtrunk_host),
    })


def export_classification(
    task,
    state,
    out_dir: str,
    *,
    batch: int | str = "poly",
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    external_weights: bool = False,
) -> dict:
    """Serialize a trained DualCamNet classifier (``ClassificationTask``)
    into a serving artifact: per-frame acoustic images (or mfcc vectors
    when ``model.mfccmap`` is set) in, per-clip logits out — the
    deployment counterpart of the reference's ``trainer_class.py`` test
    path (``/root/reference/trainer/trainer_class.py:47-54`` 12-frame
    logit mean)."""
    channels = int(task.cfg.data.num_channels)
    num_frames = int(task.num_frames)
    mfccmap = bool(task.cfg.model.mfccmap)
    params = jax.device_get(state.params)
    weights = {"params": params}

    from acoustic_image_generation_tpu.data.preprocess import Batch as _Batch

    def serve(w, inputs):
        params = w["params"]
        zeros_like_frames = jnp.zeros((inputs.shape[0],), jnp.int32)
        if mfccmap:
            batch_ = _Batch(
                acoustic=jnp.zeros((inputs.shape[0], 36, 48, channels)),
                audio=jnp.zeros((inputs.shape[0], 1024)),
                mfcc=inputs,
                video=jnp.zeros((inputs.shape[0], 1, 1, 3)),
                action=zeros_like_frames,
                location=zeros_like_frames,
                filtered_mfcc=jnp.zeros_like(inputs),
            )
        else:
            batch_ = _Batch(
                acoustic=inputs,
                audio=jnp.zeros((inputs.shape[0], 1024)),
                mfcc=jnp.zeros((inputs.shape[0], 12)),
                video=jnp.zeros((inputs.shape[0], 1, 1, 3)),
                action=zeros_like_frames,
                location=zeros_like_frames,
                filtered_mfcc=jnp.zeros((inputs.shape[0], 12)),
            )
        return (task._logits(params, batch_),)

    b = _batch_dim(batch)
    frames = b * num_frames
    if mfccmap:
        in_t = jax.ShapeDtypeStruct((frames, 12), np.float32)
        in_spec = ["b*F", 12]
    else:
        in_t = jax.ShapeDtypeStruct((frames, 36, 48, channels), np.float32)
        in_spec = ["b*F", 36, 48, channels]
    leaves = None
    if external_weights:
        exported, leaves = _export_external(serve, weights, (in_t,), platforms)
    else:
        exported = jax_export.export(
            jax.jit(lambda x: serve(weights, x)), platforms=list(platforms)
        )(in_t)

    return _write_artifact(exported, out_dir, weight_leaves=leaves, manifest={
        "kind": "classification",
        "platforms": list(platforms),
        "batch": "poly" if batch == "poly" else int(batch),
        "channels": channels,
        "num_frames": num_frames,
        "num_classes": int(task.cfg.data.num_classes),
        "mfccmap": mfccmap,
        "inputs": {"mfcc" if mfccmap else "acoustic": in_spec},
        "outputs": ["clip_logits"],
        "weights_sha256": _params_digest(params),
    })


def export_embedding(
    task,
    state,
    out_dir: str,
    *,
    use_mean: bool = False,
    batch: int | str = "poly",
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    external_weights: bool = False,
) -> dict:
    """Serialize a trained 3-VAE embedding model (``EmbedTask``) into a
    serving artifact: one second of each modality in (acoustic frames,
    raw audio samples, video frames — the spectrogram frontend is baked
    into the module), three aligned latents out. The deployment
    counterpart of the reference's offline ``extract_triplet.py`` →
    kNN/retrieval flow (``/root/reference/extract_features_unetraces.py:
    108-110``); ``use_mean`` exports the ``mean.py`` variant."""
    from acoustic_image_generation_tpu.data.preprocess import Batch as _Batch

    channels = int(task.cfg.data.num_channels)
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    weights = {"params": params, "batch_stats": batch_stats}

    def serve(w, acoustic, audio, video, seed):
        frames = acoustic.shape[0]
        batch_ = _Batch(
            acoustic=acoustic,
            audio=audio,
            mfcc=jnp.zeros((frames, 12)),
            video=video,
            action=jnp.zeros((frames,), jnp.int32),
            location=jnp.zeros((frames,), jnp.int32),
            filtered_mfcc=jnp.zeros((frames, 12)),
        )
        z = task.embeddings(
            w["params"], w["batch_stats"], batch_, jax.random.key(seed),
            use_mean=use_mean,
        )
        return (z["acoustic"], z["audio"], z["video"])

    frames = _batch_dim(batch) * 12
    args = (
        jax.ShapeDtypeStruct((frames, 36, 48, channels), np.float32),
        jax.ShapeDtypeStruct((frames, 1024), np.float32),
        jax.ShapeDtypeStruct((frames, 224, 298, 3), np.float32),
        jax.ShapeDtypeStruct((), np.int32),
    )
    leaves = None
    if external_weights:
        exported, leaves = _export_external(serve, weights, args, platforms)
    else:
        exported = jax_export.export(
            jax.jit(lambda *a: serve(weights, *a)), platforms=list(platforms)
        )(*args)

    return _write_artifact(exported, out_dir, weight_leaves=leaves, manifest={
        "kind": "embedding",
        "platforms": list(platforms),
        "batch": "poly" if batch == "poly" else int(batch),
        "channels": channels,
        "latent_dim": int(task.cfg.model.num_class),
        "use_mean": bool(use_mean),
        "inputs": {
            "acoustic": ["b*12", 36, 48, channels],
            "audio": ["b*12", 1024],
            "video": ["b*12", 224, 298, 3],
            "seed": [],
        },
        "outputs": ["z_acoustic", "z_audio", "z_video"],
        "weights_sha256": _params_digest(params, batch_stats),
    })


def export_projection(
    task,
    state,
    out_dir: str,
    *,
    batch: int | str = "poly",
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    external_weights: bool = False,
) -> dict:
    """Serialize a trained projection model (``ProjectTask``) into a
    serving artifact: one second of video frames and/or raw audio in,
    generated acoustic images out — the video/audio encoders' latents
    are translated into the acoustic latent space by the associators and
    the acoustic decoder renders from the translated latent alone
    (``/root/reference/trainer/trainer_proietta.py:49-56,102-111``,
    ``unet_z.py:63`` external-latent decode; no acoustic input is
    consumed at serve time). Note the module is large (~460 MB at f32:
    the video VAE's 1024-latent dense layers become baked constants) —
    proxied runtimes with request-size caps may reject the compile even
    though local runtimes handle it fine — or pass
    ``external_weights=True`` for a few-MB pure-program module with the
    weights shipped beside it in ``weights.msgpack``."""
    from acoustic_image_generation_tpu.data.preprocess import Batch as _Batch

    channels = int(task.cfg.data.num_channels)
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    weights = {"params": params, "batch_stats": batch_stats}

    def serve(w, audio, video, seed):
        frames = audio.shape[0]
        batch_ = _Batch(
            acoustic=jnp.zeros((frames, 36, 48, channels)),
            audio=audio,
            mfcc=jnp.zeros((frames, 12)),
            video=video,
            action=jnp.zeros((frames,), jnp.int32),
            location=jnp.zeros((frames,), jnp.int32),
            filtered_mfcc=jnp.zeros((frames, 12)),
        )
        rngs = {"latent": jax.random.key(seed)}
        _, out, mean, std, _, _ = task._forward(
            w["params"], w["batch_stats"], batch_, rngs, train=False
        )
        return (out.output.astype(jnp.float32),)

    frames = _batch_dim(batch) * 12
    args = (
        jax.ShapeDtypeStruct((frames, 1024), np.float32),
        jax.ShapeDtypeStruct((frames, 224, 298, 3), np.float32),
        jax.ShapeDtypeStruct((), np.int32),
    )
    leaves = None
    if external_weights:
        exported, leaves = _export_external(serve, weights, args, platforms)
    else:
        exported = jax_export.export(
            jax.jit(lambda *a: serve(weights, *a)), platforms=list(platforms)
        )(*args)

    return _write_artifact(exported, out_dir, weight_leaves=leaves, manifest={
        "kind": "projection",
        "platforms": list(platforms),
        "batch": "poly" if batch == "poly" else int(batch),
        "channels": channels,
        "encoder_type": task.encoder_type,
        "fusion": bool(task.fusion),
        "inputs": {
            "audio": ["b*12", 1024],
            "video": ["b*12", 224, 298, 3],
            "seed": [],
        },
        "outputs": ["generated"],
        "weights_sha256": _params_digest(params, batch_stats),
    })


def export_joint(
    task,
    state,
    out_dir: str,
    *,
    batch: int | str = "poly",
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    external_weights: bool = False,
) -> dict:
    """Serialize a trained joint-MVAE model (``JointTask`` with
    ``onlyaudiovideo`` — JointTwomvae — or ``fusion`` — JointTwomvae2)
    into a serving artifact: one second of video + raw audio in,
    generated acoustic images out via the joint associator's acoustic
    feature-map head and the acoustic decoder's ``from_features`` stage
    (``/root/reference/trainer/trainermulti.py:52-59,99-100``). The
    plain jointmvae variant conditions its associator on real acoustic
    features and has no acoustic-free serve path — exporting it raises."""
    from acoustic_image_generation_tpu.data.preprocess import Batch as _Batch

    if not (task.onlyaudiovideo or task.fusion):
        raise ValueError(
            "joint serving needs --onlyaudiovideo or --fusion (the plain "
            "jointmvae associator consumes real acoustic features)"
        )
    channels = int(task.cfg.data.num_channels)
    params = jax.device_get(state.params)
    batch_stats = jax.device_get(state.batch_stats)
    weights = {"params": params, "batch_stats": batch_stats}
    variant = "onlyaudiovideo" if task.onlyaudiovideo else "fusion"

    def serve(w, audio, video, seed):
        params, batch_stats = w["params"], w["batch_stats"]
        frames = audio.shape[0]
        batch_ = _Batch(
            acoustic=jnp.zeros((frames, 36, 48, channels)),
            audio=audio,
            mfcc=jnp.zeros((frames, 12)),
            video=video,
            action=jnp.zeros((frames,), jnp.int32),
            location=jnp.zeros((frames,), jnp.int32),
            filtered_mfcc=jnp.zeros((frames, 12)),
        )
        rngs = {"latent": jax.random.key(seed)}
        inputs = task._inputs(batch_)
        _, f_vi, f_au = task._features(
            params, batch_stats, inputs, rngs, train=False
        )
        assoc = ("associator1", task.associator1) if task.onlyaudiovideo else (
            "associator", task.associator
        )
        pred = assoc[1].apply({"params": params[assoc[0]]}, f_vi, f_au)
        ac_out = task._stage2(params, batch_stats, "acoustic", pred["ac"], rngs)
        return (ac_out.output.astype(jnp.float32),)

    frames = _batch_dim(batch) * 12
    args = (
        jax.ShapeDtypeStruct((frames, 1024), np.float32),
        jax.ShapeDtypeStruct((frames, 224, 298, 3), np.float32),
        jax.ShapeDtypeStruct((), np.int32),
    )
    leaves = None
    if external_weights:
        exported, leaves = _export_external(serve, weights, args, platforms)
    else:
        exported = jax_export.export(
            jax.jit(lambda *a: serve(weights, *a)), platforms=list(platforms)
        )(*args)

    return _write_artifact(exported, out_dir, weight_leaves=leaves, manifest={
        "kind": "joint",
        "platforms": list(platforms),
        "batch": "poly" if batch == "poly" else int(batch),
        "channels": channels,
        "variant": variant,
        "inputs": {
            "audio": ["b*12", 1024],
            "video": ["b*12", 224, 298, 3],
            "seed": [],
        },
        "outputs": ["generated"],
        "weights_sha256": _params_digest(params, batch_stats),
    })


class ServingModel:
    """A loaded serving artifact: ``generate(mfcc, video, seed)`` for
    generation artifacts, ``classify(inputs)`` for classification ones."""

    def __init__(self, exported, manifest: dict, weights=None):
        self._exported = exported
        self.manifest = manifest
        jit_call = jax.jit(exported.call)
        if weights is not None:
            # external-weights artifact: the module's leading argument is
            # the flat weight-leaf list from weights.msgpack. Commit the
            # leaves to device memory once here — host arrays would be
            # re-transferred on EVERY call (measured 66 s/call for the
            # ~1 GB projection weights through the dev tunnel vs
            # milliseconds once resident).
            self._weights = [jax.device_put(w) for w in weights]
            self._call = lambda *inputs: jit_call(self._weights, *inputs)
        else:
            self._call = jit_call

    @property
    def kind(self) -> str:
        return self.manifest.get("kind", "generation")

    def _check_batch(self, n: int) -> None:
        fixed = self.manifest["batch"]
        if fixed != "poly" and n != fixed:
            raise ValueError(
                f"artifact was exported at fixed batch {fixed}, got {n}"
            )

    def generate(self, mfcc, video, seed: int = 0):
        """Run the baked generator.

        Returns ``generated (N,36,48,C)`` float32, plus
        ``energy (N,36,48)`` when the artifact was exported with
        ``energy=True``.
        """
        if self.kind != "generation":
            raise ValueError(f"{self.kind} artifact has no generate()")
        mfcc = np.asarray(mfcc, np.float32)
        video = np.asarray(video, np.float32)
        self._check_batch(mfcc.shape[0])
        shards = self.manifest.get("spatial_shards", 1)
        if shards > 1:
            _, vid_sh, rep = _spatial_serving_mesh(shards)
            mfcc = jax.device_put(mfcc, rep)
            video = jax.device_put(video, vid_sh)
        out = self._call(mfcc, video, np.int32(seed))
        if self.manifest["energy"]:
            gen, en = out
            return np.asarray(gen), np.asarray(en)
        (gen,) = out
        return np.asarray(gen)

    def embed(self, acoustic, audio, video, seed: int = 0):
        """One second per row of each modality in ((N*12,36,48,C) acoustic
        frames, (N*12,1024) audio samples, (N*12,224,298,3) video frames)
        -> dict of aligned per-second latents (N, latent_dim)."""
        if self.kind != "embedding":
            raise ValueError(f"{self.kind} artifact has no embed()")
        acoustic = np.asarray(acoustic, np.float32)
        audio = np.asarray(audio, np.float32)
        video = np.asarray(video, np.float32)
        if acoustic.shape[0] % 12:
            raise ValueError(
                f"leading dim {acoustic.shape[0]} is not a multiple of 12 "
                "frames/second"
            )
        self._check_batch(acoustic.shape[0] // 12)
        z_ac, z_au, z_vi = self._call(acoustic, audio, video, np.int32(seed))
        return {
            "acoustic": np.asarray(z_ac),
            "audio": np.asarray(z_au),
            "video": np.asarray(z_vi),
        }

    def project(self, audio, video, seed: int = 0):
        """One second per row (audio samples (N*12,1024), video frames
        (N*12,224,298,3)) -> generated acoustic images (N,36,48,C).
        Serves both projection artifacts (translated-latent decode) and
        joint artifacts (joint-MVAE feature-map decode) — same
        signature, same semantics: acoustic images from video/audio."""
        if self.kind not in ("projection", "joint"):
            raise ValueError(f"{self.kind} artifact has no project()")
        audio = np.asarray(audio, np.float32)
        video = np.asarray(video, np.float32)
        if audio.shape[0] % 12:
            raise ValueError(
                f"leading dim {audio.shape[0]} is not a multiple of 12 "
                "frames/second"
            )
        self._check_batch(audio.shape[0] // 12)
        (gen,) = self._call(audio, video, np.int32(seed))
        return np.asarray(gen)

    def classify(self, inputs):
        """Per-frame acoustic images (N*F,36,48,C) — or mfcc vectors
        (N*F,12) for mfccmap artifacts — to per-clip logits
        (N, num_classes)."""
        if self.kind != "classification":
            raise ValueError(f"{self.kind} artifact has no classify()")
        inputs = np.asarray(inputs, np.float32)
        frames = self.manifest["num_frames"]
        if inputs.shape[0] % frames:
            raise ValueError(
                f"leading dim {inputs.shape[0]} is not a multiple of the "
                f"artifact's {frames} frames/clip"
            )
        self._check_batch(inputs.shape[0] // frames)
        (logits,) = self._call(inputs)
        return np.asarray(logits)


def load_artifact(art_dir: str) -> ServingModel:
    """Load an artifact directory written by :func:`export_generation`."""
    with open(os.path.join(art_dir, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("format") != FORMAT:
        raise ValueError(
            f"unsupported serving artifact format {manifest.get('format')!r}"
        )
    with open(os.path.join(art_dir, "module.stablehlo"), "rb") as f:
        blob = f.read()
    # Cross-check the manifest against the module blob before
    # deserializing: a mismatched/tampered manifest+module pair (files
    # copied between artifact dirs) must fail loudly at load time, not
    # as a confusing unpack/shape error on the first call.
    if "module_bytes" in manifest and manifest["module_bytes"] != len(blob):
        raise ValueError(
            f"manifest.json records {manifest['module_bytes']} StableHLO "
            f"bytes but module.stablehlo has {len(blob)} — manifest and "
            "module do not belong to the same export"
        )
    if "module_sha256" in manifest:
        digest = hashlib.sha256(blob).hexdigest()
        if digest != manifest["module_sha256"]:
            raise ValueError(
                "module.stablehlo digest mismatch vs manifest.json "
                f"({digest[:12]}… != {manifest['module_sha256'][:12]}…) — "
                "manifest and module do not belong to the same export"
            )
    exported = jax_export.deserialize(blob)
    if not set(runtime_platforms()) & set(exported.platforms):
        raise RuntimeError(
            f"artifact lowered for {exported.platforms}, runtime is "
            f"{jax.default_backend()!r}"
        )
    shards = manifest.get("spatial_shards", 1)
    if shards > 1 and len(jax.devices()) < shards:
        raise RuntimeError(
            f"artifact is spatially sharded over {shards} devices; "
            f"runtime has {len(jax.devices())}"
        )
    weights = None
    if manifest.get("external_weights"):
        import flax.serialization

        with open(os.path.join(art_dir, "weights.msgpack"), "rb") as f:
            wblob = f.read()
        recorded = manifest.get("external_weights_sha256")
        if recorded is not None:
            digest = hashlib.sha256(wblob).hexdigest()
            if digest != recorded:
                raise ValueError(
                    "weights.msgpack digest mismatch vs manifest.json "
                    f"({digest[:12]}… != {recorded[:12]}…) — weights and "
                    "manifest do not belong to the same export"
                )
        restored = flax.serialization.msgpack_restore(wblob)
        weights = [restored[str(i)] for i in range(len(restored))]
    return ServingModel(exported, manifest, weights=weights)
