"""Benchmark: flagship generation-training throughput on the local chip.

Measures the AAAI'21 generation train step — device MFCC frontend +
ResNet50 conditioning + UNetAcResNet, MSE+Huber+KL+L2 loss, backward, Adam
— in bfloat16, reporting audio-visual clips/sec/chip (1 clip = 1 second =
12 synchronized frames of acoustic image + audio + video).

The measured configuration is the framework's production recipe
(docs/PERF.md): the ResNet trunk is frozen exactly like the reference
(``/root/reference/models/vision.py:68-71`` var_list — only conv_map/
logits + the UNet train), its BatchNorms run on running averages
(``ModelConfig.trunk_bn="frozen"``), and the trunk features at the
stop_gradient boundary are computed ONCE per window per dataset and
reused every epoch (``train/feature_cache.py``). The steady-state step —
what every epoch after the first runs — is conv_map + generator
fwd+bwd+Adam on cached features. Epoch 1 (cache fill) runs at the
uncached rate; amortized over the reference's 50-100-epoch recipes the
sustained rate is within a few % of steady state (see docs/PERF.md for
the full table: train-BN 187, eval-BN uncached 252, cached 1244
clips/s/chip at 64-clip batches on v5e).

Modes (AIG_BENCH_MODE): train (default, cached steady state) | infer |
artifact (serving-artifact round-trip) | pipeline | scan. AIG_BENCH_CACHE=0 measures the uncached full step;
AIG_BENCH_TRUNK_BN=train restores the reference-faithful train-mode BN;
AIG_BENCH_FEAT_DTYPE=f8_e4m3 holds cached features in float8 (half HBM).

Baseline: the driver north-star target of 5,000 clips/sec on a v5e-8
(BASELINE.json) == 625 clips/sec/chip; ``vs_baseline`` is measured/625.
The TF1 reference has no published throughput (BASELINE.md).

Prints ONE JSON line.

Tunnel-wedge watchdog: on this environment's tunneled TPU a process can
wedge permanently inside one RPC (frozen CPU time, no output — observed
on ~1h+ runs and on unlucky fresh processes) while a NEW process reaches
the chip fine. ``__main__`` therefore runs the measurement in a child
process with a hard time cap and retries in a fresh process on
timeout/crash (AIG_BENCH_TIMEOUT seconds per attempt, default 1200;
AIG_BENCH_ATTEMPTS, default 3; AIG_BENCH_NO_WATCHDOG=1 runs in-process).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC_CHIP = 5000.0 / 8.0

# >1 when the train bench shards over a device mesh: emitted numbers stay
# per-chip so vs_baseline is comparable across hosts of any slice size
_DP_DEVICES = 1


def _emit(metric: str, clips_per_sec: float, *, unit: str = "clips/sec/chip",
          baseline: bool = True) -> None:
    clips_per_sec = clips_per_sec / _DP_DEVICES
    rec = {"metric": metric, "value": round(clips_per_sec, 2), "unit": unit}
    if baseline:
        rec["vs_baseline"] = round(clips_per_sec / BASELINE_CLIPS_PER_SEC_CHIP, 4)
    if _DP_DEVICES > 1:
        rec["devices"] = _DP_DEVICES
    print(json.dumps(rec))


def main() -> None:
    if os.environ.get("AIG_BENCH_SELFTEST") == "1":
        # watchdog self-test: exercise child spawn -> metric detection ->
        # forwarding without touching a backend (tests/test_cli.py)
        _emit("bench_selftest", BASELINE_CLIPS_PER_SEC_CHIP)
        return

    # warmup-only speedup: persist compiled executables across runs
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("AIG_JAX_CACHE", "/tmp/aig_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # AIG_BENCH_CPU_MESH=N: virtual N-device CPU mesh to exercise the DP
    # path off-hardware (sitecustomize may pin jax_platforms, so the env
    # vars alone are not enough — same fallback as __graft_entry__,
    # including the raised XLA CPU collective rendezvous timeouts that a
    # single-core host emulating N devices needs to survive)
    mesh_n = int(os.environ.get("AIG_BENCH_CPU_MESH", "0"))
    if mesh_n:
        flags = os.environ.get("XLA_FLAGS", "")
        if "collective_call_terminate_timeout" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
                + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
            ).strip()
        try:
            jax.config.update("jax_num_cpu_devices", mesh_n)
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (e.g. by the driver)
        # CPU-feature-keyed cache dir: XLA:CPU AOT cache entries are not
        # keyed by target microarch and can SIGILL on a different host
        # generation (see __graft_entry__._cpu_cache_dir)
        if "AIG_JAX_CACHE" not in os.environ:
            import __graft_entry__ as _ge

            jax.config.update(
                "jax_compilation_cache_dir", _ge._cpu_cache_dir()
            )

    from acoustic_image_generation_tpu.core.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        OptimConfig,
        ParallelConfig,
        RunConfig,
    )
    from acoustic_image_generation_tpu.data.preprocess import preprocess_batch
    from acoustic_image_generation_tpu.train.generation import GenerationTask

    # 128-clip default: measured 1237.9 (64) / 1268.1 (128) cached
    # clips/sec/chip; 192 clips exhausts HBM alongside the device-resident
    # feature pool. 128 is the measured sweet spot on one v5e core.
    # Full-trunk variants OOM at 128; their measured sweet spots differ:
    # serving peaks at 96 (390.3 int8 / 251.2 bf16 vs 340.1 / 240.4 at
    # 64), the uncached TRAIN step at 64 (bf16: 252 vs 239.9 at 96; int8
    # batch-insensitive at ~349).
    mode = os.environ.get("AIG_BENCH_MODE", "train")  # train|infer|pipeline|scan
    use_cache = os.environ.get("AIG_BENCH_CACHE", "1") == "1"
    trunk_bn = os.environ.get("AIG_BENCH_TRUNK_BN", "frozen")  # frozen|train
    # the feature cache requires the frozen-BN trunk (Trainer only builds
    # the cached step when trunk_bn=='frozen'); train-mode BN recomputes
    # the trunk every step by definition, so the combination is meaningless
    use_cache = use_cache and trunk_bn == "frozen"
    if mode in ("infer", "artifact"):
        default_clips = "96"
    elif not use_cache:
        default_clips = "64"  # full-trunk train step OOMs at 128 clips
    else:
        default_clips = "128"
    clips = int(os.environ.get("AIG_BENCH_CLIPS", default_clips))
    # AIG_BENCH_TRUNK_QUANT=int8: BN-folded W8A8 trunk (models/quant.py) —
    # the uncached-step accelerator (int8 MXU + halved HBM traffic)
    trunk_quant = os.environ.get("AIG_BENCH_TRUNK_QUANT", "none")
    # AIG_BENCH_FUSED_CONV=1: generator conv chains through the fused
    # Pallas kernels (ops/pallas_conv) instead of XLA's fusions
    fused_conv = os.environ.get("AIG_BENCH_FUSED_CONV", "0") == "1"
    # AIG_BENCH_FUSED_QGEMM=1: int8 trunk's 1x1 convs through the fused
    # Pallas streaming GEMM (ops/pallas_qgemm) instead of XLA's fusions
    fused_qgemm = os.environ.get("AIG_BENCH_FUSED_QGEMM", "0") == "1"

    if mode == "pipeline":
        return _pipeline_bench(clips)
    if mode == "ingest":
        return _ingest_bench(clips)

    # AIG_BENCH_TASK=classify|embed: opt-in throughput probes for the
    # other reference task families (trainer_class.py / trainer_three.py
    # equivalents) through the SAME production Trainer step. Not part of
    # the default ladder — measured numbers live in docs/PERF.md.
    bench_task = os.environ.get("AIG_BENCH_TASK", "generation")
    if bench_task != "generation":
        return _task_bench(bench_task)

    # Data-parallel scale-out (train/scan): with >1 device visible, WEAK
    # scaling — every chip keeps its measured sweet-spot batch and the
    # global batch grows by the device count, grads all-reduce over ICI.
    # Emitted numbers are divided back to per-chip so vs_baseline stays
    # comparable on any slice size. AIG_BENCH_DP=0 pins single-device.
    global _DP_DEVICES
    if mode in ("train", "scan") and os.environ.get("AIG_BENCH_DP", "1") == "1":
        _DP_DEVICES = jax.device_count()
    if _DP_DEVICES > 1:
        clips *= _DP_DEVICES

    frames = 12 * clips
    rng = np.random.default_rng(0)
    acoustic = jnp.asarray(rng.random((frames, 36, 48, 12), dtype=np.float32))
    audio = jnp.asarray(
        rng.integers(-(2**15), 2**15, (frames, 1024)).astype(np.int32)
    )
    video = jnp.asarray(rng.integers(0, 255, (frames, 224, 298, 3)).astype(np.uint8))
    action = jnp.zeros((frames,), jnp.int32)

    # AIG_BENCH_FEAT_DTYPE=f8_e4m3: hold the resident features in float8
    # (ModelConfig.cache_features_dtype — half the HBM footprint; the
    # production cached step upcasts inside jit)
    feat_dtype = os.environ.get("AIG_BENCH_FEAT_DTYPE", "bf16")
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=clips, sample_length=1),
        model=ModelConfig(
            embedding=True, mfcc=True, num_skip_conn=1, trunk_bn=trunk_bn,
            cache_trunk_features=use_cache, trunk_quant=trunk_quant,
            fused_conv=fused_conv, fused_qgemm=fused_qgemm,
            cache_features_dtype=feat_dtype,
        ),
        optim=OptimConfig(learning_rate=1e-4),
        run=RunConfig(exp_name="bench", checkpoint_dir="/tmp/aig_bench_ck"),
        parallel=ParallelConfig(
            compute_dtype="bfloat16", num_devices=max(_DP_DEVICES, 1)
        ),
    )
    task = GenerationTask(cfg)

    if mode in ("infer", "artifact"):
        @jax.jit
        def init(acoustic, audio, video, action):
            batch = preprocess_batch(
                acoustic[:1], audio[:1], video[:1], action[:1], action[:1]
            )
            return task.init_variables(jax.random.key(0), batch)

        params, batch_stats = init(acoustic, audio, video, action)
        qtrunk = None
        if trunk_quant != "none":
            from acoustic_image_generation_tpu.data.preprocess import normalize_video

            # one-time prepack + static activation calibration on this batch
            qtrunk = task.build_qtrunk(params, batch_stats, normalize_video(video))
            jax.block_until_ready(qtrunk)
        fn = _artifact_bench if mode == "artifact" else _infer_bench
        return fn(task, params, batch_stats, audio, video, clips, qtrunk)

    # ---------------------------------------------------- train / scan
    # The measured step IS the production step: bench instantiates the
    # real Trainer and times its jitted `_train_step_impl` /
    # `_train_step_cached_impl` (train/trainer.py `_step_core`: production
    # `_prepare`, TF1-exact Adam, the same cached-feature math the
    # pipeline runs). Bench only holds the data device-resident and owns
    # the timing boundaries — there is no hand-rolled twin of the step.
    import types

    from acoustic_image_generation_tpu.train.trainer import Trainer

    trainer = Trainer(task, cfg)
    clip = lambda x: x.reshape(clips, 12, *x.shape[1:])
    raw_host = types.SimpleNamespace(
        acoustic=clip(acoustic), audio=clip(audio), video=clip(video),
        action=jnp.zeros((clips,), jnp.int32),
        location=jnp.zeros((clips,), jnp.int32),
        valid=clips,
    )
    raw = trainer.device_batch(raw_host)
    state = trainer.init_state(raw_host)

    qtrunk = None
    if trunk_quant != "none":
        from acoustic_image_generation_tpu.data.preprocess import normalize_video

        # one-time prepack + static activation calibration on this batch
        qtrunk = task.build_qtrunk(
            state.params, state.batch_stats, normalize_video(video)
        )
        qtrunk = jax.device_put(qtrunk, trainer._replicated)
        jax.block_until_ready(qtrunk)

    use_feat = use_cache and mode in ("train", "scan")
    feat = None
    if use_feat:
        # epoch-1 cache fill via the production trunk-split (single
        # storage-rounding point for every cache tier), amortized across
        # the remaining epochs of any real recipe (50-100 epochs upstream)
        feat = trainer._trunk_features(state, raw["video"], qtrunk)
        jax.block_until_ready(feat)
        # the cached step never reads the video tensor — swap in a dummy
        # exactly like the production cached path (trainer.py docstring)
        raw["video"] = jax.device_put(
            jnp.zeros((clips, 12, 1, 1, 3), jnp.uint8), trainer._batch_sharding
        )

    if mode == "scan":
        return _scan_bench(trainer, state, raw, feat, qtrunk, clips)

    if use_feat:
        step = lambda s: trainer._train_step_cached(s, raw, feat)
    else:
        step = lambda s: trainer._train_step(s, raw, qtrunk)

    # warmup (compile + 2 steady steps); fetching the loss VALUE forces
    # real execution — on a tunneled TPU, block_until_ready alone returns
    # before the remote computation finishes and wildly overstates
    # throughput, so every timing boundary below is a value fetch.
    for _ in range(3):
        state, metrics = step(state)
    float(jax.device_get(metrics["loss"]))

    n_steps = int(os.environ.get("AIG_BENCH_STEPS", "20" if use_feat else "10"))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state)
    # the last step depends on every earlier step's params; fetching its
    # loss waits for the whole chain
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    _emit("generation_train_clips_per_sec_chip", n_steps * clips / dt)


def _artifact_bench(task, params, batch_stats, audio, video, clips: int, qtrunk=None) -> None:
    """Serving-artifact throughput (AIG_BENCH_MODE=artifact): export the
    generator to a StableHLO artifact (core/serving.py), reload it, and
    time the loaded module on the same batch/methodology as infer mode —
    the measured check behind docs/PERF.md's 'the artifact executes the
    same XLA program' claim. Input prep (MFCC frontend + normalize) runs
    in a jitted prologue exactly like the infer path."""
    import types

    from acoustic_image_generation_tpu.core import serving
    from acoustic_image_generation_tpu.data.preprocess import (
        normalize_mfcc,
        normalize_video,
    )
    from acoustic_image_generation_tpu.dsp.mfcc import mfcc_from_frames

    state = types.SimpleNamespace(params=params, batch_stats=batch_stats)
    art_dir = os.environ.get("AIG_BENCH_ARTIFACT_DIR", "/tmp/aig_bench_artifact")
    # AIG_BENCH_ARTIFACT_BATCH=poly|fixed: the deployment default is the
    # shape-polymorphic batch; "fixed" exports at this run's exact batch
    # (measures what symbolic dims cost the conv schedules)
    art_batch = (
        "poly"
        if os.environ.get("AIG_BENCH_ARTIFACT_BATCH", "poly") == "poly"
        else clips * 12
    )
    # AIG_BENCH_ARTIFACT_EXTERNAL=1: external-weights artifact (small
    # pure-program module + weights.msgpack) — measures what the
    # weights-as-arguments calling convention costs vs baked constants
    external = os.environ.get("AIG_BENCH_ARTIFACT_EXTERNAL", "0") == "1"
    t0 = time.perf_counter()
    serving.export_generation(
        task, state, art_dir, qtrunk=qtrunk, batch=art_batch,
        platforms=(serving.default_export_platform(),),
        external_weights=external,
    )
    export_s = time.perf_counter() - t0
    model = serving.load_artifact(art_dir)

    @jax.jit
    def prep(audio, video):
        mfcc = normalize_mfcc(mfcc_from_frames(audio.astype(jnp.float32)))
        return mfcc, normalize_video(video)

    mfcc, vid = prep(audio, video)
    out = model._call(mfcc, vid, np.int32(0))
    float(jnp.sum(out[0]))
    n_steps = int(os.environ.get("AIG_BENCH_STEPS", "40"))
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(n_steps):
        out = model._call(mfcc, vid, np.int32(i))
        acc = acc + out[0][0, 0, 0, 0]
    float(acc)
    dt = time.perf_counter() - t0
    print(f"artifact export {export_s:.1f}s", file=sys.stderr)
    if os.environ.get("AIG_BENCH_ARTIFACT_HTTP", "0") == "1":
        # measure the SAME calls through the tools-serve daemon on
        # localhost (core/server.py + core/client.py): the delta vs the
        # direct number above is the HTTP + npz-serialization cost of
        # the network deployment topology
        from acoustic_image_generation_tpu.core.client import ArtifactClient
        from acoustic_image_generation_tpu.core.server import ArtifactServer

        http_srv = ArtifactServer(art_dir, port=0)
        http_srv.start()
        client = ArtifactClient(f"http://{http_srv.host}:{http_srv.port}")
        mfcc_np, vid_np = np.asarray(mfcc), np.asarray(vid)
        client.generate(mfcc_np, vid_np, seed=0)  # warm
        t0 = time.perf_counter()
        for i in range(n_steps):
            client.generate(mfcc_np, vid_np, seed=i)
        http_dt = time.perf_counter() - t0
        http_srv.shutdown()
        _emit(
            "generation_artifact_http_clips_per_sec_chip",
            n_steps * clips / http_dt,
        )
    _emit("generation_artifact_infer_clips_per_sec_chip", n_steps * clips / dt)


def _infer_bench(task, params, batch_stats, audio, video, clips: int, qtrunk=None) -> None:
    """Forward-only serving throughput: mfcc + video -> acoustic image."""
    from acoustic_image_generation_tpu.data.preprocess import (
        normalize_mfcc,
        normalize_video,
    )
    from acoustic_image_generation_tpu.dsp.mfcc import mfcc_from_frames

    @jax.jit
    def serve(params, batch_stats, audio, video, key):
        mfcc = normalize_mfcc(mfcc_from_frames(audio.astype(jnp.float32)))
        return task.generate(
            params, batch_stats, mfcc, normalize_video(video), key, qtrunk
        )

    out = serve(params, batch_stats, audio, video, jax.random.key(0))
    float(jnp.sum(out))
    # serving needs more steps than train to reach steady state: there is
    # no donated-buffer dependency chain, so the first dispatches pay
    # pipeline-fill costs (measured: 177 clips/s at 10 steps vs 243.8 at
    # 40 on the tunneled chip)
    n_steps = int(os.environ.get("AIG_BENCH_STEPS", "40"))
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(n_steps):
        out = serve(params, batch_stats, audio, video, jax.random.key(i))
        acc = acc + out[0, 0, 0, 0]  # chain a data dependency across steps
    float(acc)
    dt = time.perf_counter() - t0
    _emit("generation_infer_clips_per_sec_chip", n_steps * clips / dt)


def _task_bench(kind: str) -> None:
    """Train-step throughput for the non-flagship task families through
    the SAME production Trainer step and timing methodology as the
    flagship: ``classify`` = DualCamNet on real acoustic images
    (``/root/reference/trainer/trainer_class.py``), ``embed`` = 3-VAE
    triplet alignment (``trainer_three.py``). Opt-in via
    ``AIG_BENCH_TASK``; measured numbers live in docs/PERF.md."""
    import types

    from acoustic_image_generation_tpu.core.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        OptimConfig,
        ParallelConfig,
        RunConfig,
    )
    from acoustic_image_generation_tpu.train.trainer import Trainer

    # measured sweet spots on one v5e core: DualCamNet is tiny (256);
    # the embed step carries the 224x298 video VAE fwd+bwd (32)
    defaults = {"classify": 256, "embed": 32}
    if kind not in defaults:
        raise SystemExit(f"unknown AIG_BENCH_TASK={kind!r}")
    clips = int(os.environ.get("AIG_BENCH_CLIPS", str(defaults[kind])))
    global _DP_DEVICES
    if os.environ.get("AIG_BENCH_DP", "1") == "1":
        _DP_DEVICES = jax.device_count()
    if _DP_DEVICES > 1:
        clips *= _DP_DEVICES

    if kind == "classify":
        model = ModelConfig(model="DualCamNet", mfcc=True)
    else:
        model = ModelConfig(embedding=True)
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=clips, sample_length=1),
        model=model,
        optim=OptimConfig(learning_rate=1e-4),
        run=RunConfig(exp_name=f"bench_{kind}", checkpoint_dir="/tmp/aig_bench_ck"),
        parallel=ParallelConfig(
            compute_dtype="bfloat16", num_devices=max(_DP_DEVICES, 1)
        ),
    )
    if kind == "classify":
        from acoustic_image_generation_tpu.train.classify import ClassificationTask

        task = ClassificationTask(cfg)
    else:
        from acoustic_image_generation_tpu.train.embed import EmbedTask

        task = EmbedTask(cfg)
    trainer = Trainer(task, cfg)

    rng = np.random.default_rng(0)
    frames = 12 * clips
    raw_host = types.SimpleNamespace(
        acoustic=jnp.asarray(
            rng.random((clips, 12, 36, 48, 12), dtype=np.float32)
        ),
        audio=jnp.asarray(
            rng.integers(-(2**15), 2**15, (clips, 12, 1024)).astype(np.int32)
        ),
        video=jnp.asarray(
            rng.integers(0, 255, (clips, 12, 224, 298, 3)).astype(np.uint8)
        ),
        # real class spread so triplet mining / CE see non-degenerate
        # batches (all-one-class batches zero out the hard-triplet loss)
        action=jnp.asarray(
            rng.integers(0, cfg.data.num_classes, (clips,)).astype(np.int32)
        ),
        location=jnp.zeros((clips,), jnp.int32),
        valid=clips,
    )
    raw = trainer.device_batch(raw_host)
    state = trainer.init_state(raw_host)
    step = lambda s: trainer._train_step(s, raw, None)

    for _ in range(3):
        state, metrics = step(state)
    float(jax.device_get(metrics["loss"]))
    n_steps = int(os.environ.get("AIG_BENCH_STEPS", "20"))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    _emit(f"{kind}_train_clips_per_sec_chip", n_steps * clips / dt)


def _scan_bench(trainer, state, raw, feat, qtrunk, clips: int) -> None:
    """Fuse K production train steps into ONE jitted program (lax.scan):
    a single dispatch per K steps amortizes the per-call overhead of
    remote/tunneled execution. Per-step RNGs derive from ``state.step``
    inside `_step_core` exactly as in the per-call path."""
    scan_k = int(os.environ.get("AIG_BENCH_SCAN", "8"))

    @partial(jax.jit, donate_argnums=(0,))
    def train_scan(state, raw, feat, qtrunk):
        def body(s, _):
            if feat is not None:
                s, metrics = trainer._train_step_cached_impl(s, raw, feat)
            else:
                s, metrics = trainer._train_step_impl(s, raw, qtrunk)
            return s, metrics["loss"]

        state, losses = jax.lax.scan(body, state, None, length=scan_k)
        return state, losses[-1]

    state, loss = train_scan(state, raw, feat, qtrunk)
    float(jax.device_get(loss))
    n_outer = int(os.environ.get("AIG_BENCH_STEPS", "5"))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        state, loss = train_scan(state, raw, feat, qtrunk)
    float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    _emit("generation_train_clips_per_sec_chip", n_outer * scan_k * clips / dt)


def _ingest_bench(clips: int) -> None:
    """Input-pipeline throughput in isolation: C++ shard ingest (cpp/
    ingest.cc) -> threaded loader -> host RawBatches -> device_put, no
    train step. Epoch 0 measures cold decode; epoch 1 measures the
    epoch-level decoded-window cache (pipeline.cache_windows) that
    epochs 2+ of a real run ride. The emitted number is the cold rate —
    the honest 'can the pipeline feed the chip' figure; the cache rate
    prints to stderr for docs/PERF.md. On this 1-core dev host the cold
    rate is CPU-bound (~150 clips/s measured in round 1); a v5e host has
    ~100 cores and the C++ decode releases the GIL, so it scales per
    thread."""
    import sys

    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader

    flat_list = _ensure_bench_dataset()

    # AIG_BENCH_THREADS="1,2,4,8": decode worker-pool scaling curve —
    # cold-rate clips/s per ThreadPoolExecutor width (the C++ ingest is
    # called through ctypes, which releases the GIL for the foreign
    # call, so the pool scales with host cores; on a 1-core host the
    # curve saturating at 1 thread is the expected result and the
    # evidence for the per-core scaling claim in docs/PERF.md).
    sweep = os.environ.get("AIG_BENCH_THREADS", "")
    if sweep:
        # warm the OS page cache first so every width measures decode CPU,
        # not first-touch file IO (otherwise the first width pays cold
        # reads the later ones don't)
        for raw in AcousticImageDataLoader(
            flat_list, "training", clips, use_native=True
        ).batches(0):
            pass
        curve = []
        for nt in (int(s) for s in sweep.split(",")):
            loader = AcousticImageDataLoader(
                flat_list, "training", clips, use_native=True,
                num_io_threads=nt,
            )
            t0 = time.perf_counter()
            n = 0
            for raw in loader.batches(0):
                n += raw.valid
            curve.append((nt, n / (time.perf_counter() - t0)))
            print(f"ingest threads={nt}: {curve[-1][1]:.1f} clips/s",
                  file=sys.stderr, flush=True)
        best = max(curve, key=lambda c: c[1])
        _emit("ingest_clips_per_sec", best[1], unit="clips/sec/host",
              baseline=False)
        return

    loader = AcousticImageDataLoader(
        flat_list, "training", clips, use_native=True, cache_windows=True
    )
    rates = []
    for epoch in range(2):
        t0 = time.perf_counter()
        n = 0
        for raw in loader.batches(epoch):
            jax.block_until_ready(jax.device_put(raw.acoustic))
            n += raw.valid
        rates.append(n / (time.perf_counter() - t0))
    print(
        f"ingest cold {rates[0]:.1f} clips/s; cached epoch {rates[1]:.1f} clips/s",
        file=sys.stderr,
    )
    # host-side IO/decode measurement: no chip involved, and the
    # 625-clips/s/chip train target is not a meaningful baseline
    _emit("ingest_clips_per_sec", rates[0], unit="clips/sec/host",
          baseline=False)


def _ensure_bench_dataset() -> str:
    """Synthetic reshard dataset shared by the pipeline/ingest benches,
    cached under /tmp across runs."""
    import shutil

    from acoustic_image_generation_tpu.data.convert import reshard
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset

    tmp = "/tmp/aig_bench_data_v1"
    flat_list = os.path.join(tmp, "flat", "training.txt")
    if not os.path.exists(flat_list):
        os.makedirs(tmp, exist_ok=True)
        lists = write_synthetic_dataset(
            os.path.join(tmp, "gz"), num_classes=2, videos_per_class=4,
            seconds_per_video=16,
        )
        got = reshard(lists["training"], os.path.join(tmp, "flat"))
        assert got == flat_list, got
        shutil.rmtree(os.path.join(tmp, "gz"), ignore_errors=True)
    return flat_list


def _pipeline_bench(clips: int) -> None:
    """Sustained end-to-end throughput: C++ shard ingest -> threaded loader
    -> device transfer -> full jitted train step, on real (synthetic,
    uncompressed) TFRecord shards. This is the honest 'clips/sec the whole
    system sustains' number, not just the compute-step rate.

    CAVEAT on the dev machine (measured 6 clips/s): this host has ONE cpu
    core (ingest tops out ~150 clips/s against the 187 clips/s train
    step) and the TPU hangs off an HTTP tunnel, so the ~154 MB of video
    per 64-clip step transfers at tunnel speed — the number here measures
    the tunnel, not the framework. On a real v5e host (~100 host cores,
    PCIe-attached chips) ingest scales per GIL-released C++ decode thread
    and the transfer is >10 GB/s, so sustained ~= the train-step rate.
    With the feature cache on (the default), epochs 2+ skip the video
    transfer entirely. The dataset is cached under /tmp across runs (the
    first run pays ~3 min of synthetic-shard writing)."""
    from acoustic_image_generation_tpu.core.config import (
        DataConfig, ExperimentConfig, ModelConfig, OptimConfig, ParallelConfig,
        RunConfig,
    )
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.train.generation import GenerationTask
    from acoustic_image_generation_tpu.train.trainer import Trainer

    # the Trainer meshes over every visible device: weak-scale the global
    # batch and normalize the emitted number back to per-chip, matching
    # the train/scan modes
    global _DP_DEVICES
    _DP_DEVICES = jax.device_count()
    clips *= _DP_DEVICES

    use_cache = os.environ.get("AIG_BENCH_CACHE", "1") == "1"
    tmp = "/tmp/aig_bench_data_v1"
    flat_list = _ensure_bench_dataset()
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=clips, sample_length=1),
        model=ModelConfig(
            embedding=True, mfcc=True, num_skip_conn=1,
            trunk_bn="frozen" if use_cache else "train",
            cache_trunk_features=use_cache,
        ),
        optim=OptimConfig(learning_rate=1e-4, num_epochs=1),
        run=RunConfig(exp_name="bench", checkpoint_dir=os.path.join(tmp, "ck")),
        parallel=ParallelConfig(compute_dtype="bfloat16"),
    )
    loader = AcousticImageDataLoader(flat_list, "training", clips, use_native=True)
    trainer = Trainer(GenerationTask(cfg), cfg)
    it = loader.batches(0)
    state = trainer.init_state(next(iter(it)))
    # warmup: compile + 1 steady step (epoch 0 also fills the feature cache)
    warm = 0
    metrics = None
    for raw in loader.batches(0):
        state, metrics = trainer.train_step(state, raw)
        warm += 1
    float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    n_clips = 0
    for epoch in range(1, 1 + int(os.environ.get("AIG_BENCH_EPOCHS", "2"))):
        for raw in loader.batches(epoch):
            state, metrics = trainer.train_step(state, raw)
            n_clips += raw.valid
    float(jax.device_get(metrics["loss"]))  # drain the pipeline
    dt = time.perf_counter() - t0
    _emit("pipeline_train_clips_per_sec_chip", n_clips / dt)


def _child_bench(env_overrides: dict, attempts: int, timeout: float):
    """One bounded, retried child bench run; returns the parsed JSON
    record or None."""
    env = dict(os.environ, AIG_BENCH_CHILD="1", **env_overrides)
    for attempt in range(1, attempts + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired as e:
            out = e.stdout or b""
            print(
                f"bench attempt {attempt}/{attempts} {env_overrides}: no "
                f"result within {timeout:.0f}s (wedged tunnel RPC?) — "
                "killed, retrying",
                file=sys.stderr,
            )
        else:
            out = proc.stdout or b""
            if proc.returncode == 0 and b'"metric"' in out:
                for line in out.decode().splitlines():
                    if '"metric"' in line:
                        return json.loads(line)
            print(
                f"bench attempt {attempt}/{attempts} {env_overrides}: exit "
                f"{proc.returncode}, no metric line — retrying",
                file=sys.stderr,
            )
        if out:
            sys.stderr.buffer.write(out)
            sys.stderr.flush()
    return None


def _run_with_watchdog() -> int:
    """Run ``main()`` in a child process, bounded and retried.

    The child emits the JSON line; a wedged child (no exit within
    AIG_BENCH_TIMEOUT) or a crashed child is killed and retried in a
    fresh process — the wedge is a per-process tunnel-connection state,
    so a new process usually reaches the chip fine.

    When the primary run is the default configuration (cached train
    step), the watchdog then measures the other rungs of the perf ladder
    in further child processes and merges them into the final JSON line
    (``ladder`` fields), so BENCH_r*.json alone carries the context that
    otherwise lives in docs/PERF.md: ``cached`` is the steady-state
    production recipe (epochs 2+, frozen trunk features reused),
    ``uncached_int8`` is epoch-1/fresh-data with the W8A8 trunk, and
    ``reference_faithful`` re-creates the reference's own configuration
    (train-mode BN, full trunk every step). Disable with
    AIG_BENCH_LADDER=0. Rung failures degrade to null fields.

    Everything is bounded by AIG_BENCH_BUDGET seconds of TOTAL wall
    clock (default 1380 — the outer driver kills the whole bench at
    ~30 min, and a killed bench records NO metric at all, which is
    strictly worse than a metric without ladder fields). The primary
    metric line prints (and flushes) the moment the primary rung
    succeeds; if the ladder then completes within budget, the merged
    line prints after it. Ladder rungs get ONE attempt each inside the
    remaining budget and are skipped outright when <150 s remain."""
    attempts = int(os.environ.get("AIG_BENCH_ATTEMPTS", "3"))
    # 720s per primary attempt: a fully cold remote compile of the cached
    # step runs ~5-7 min on the tunneled chip, and killing mid-compile
    # forfeits the work (the remote compile may not reach the cache)
    timeout = float(os.environ.get("AIG_BENCH_TIMEOUT", "720"))
    budget = float(os.environ.get("AIG_BENCH_BUDGET", "1380"))
    t0 = time.monotonic()
    remaining = lambda: budget - (time.monotonic() - t0)
    rec = _child_bench({}, attempts, min(timeout, max(remaining(), 60.0)))
    if rec is None:
        print(f"bench: all {attempts} attempts failed", file=sys.stderr)
        return 1
    # emit the headline NOW: a later wedge/kill must never cost the round
    # its metric (round-3 lost its BENCH to exactly that)
    print(json.dumps(rec))
    sys.stdout.flush()

    is_default = (
        os.environ.get("AIG_BENCH_SELFTEST") != "1"
        and os.environ.get("AIG_BENCH_MODE", "train") == "train"
        and os.environ.get("AIG_BENCH_CACHE", "1") == "1"
        and os.environ.get("AIG_BENCH_TRUNK_QUANT", "none") == "none"
        and os.environ.get("AIG_BENCH_TASK", "generation") == "generation"
        and os.environ.get("AIG_BENCH_LADDER", "1") == "1"
    )
    if is_default:
        l_att = int(os.environ.get("AIG_BENCH_LADDER_ATTEMPTS", "1"))
        l_to = float(os.environ.get("AIG_BENCH_LADDER_TIMEOUT", "420"))
        rungs = {}
        for name, env in (
            ("uncached_int8",
             {"AIG_BENCH_CACHE": "0", "AIG_BENCH_TRUNK_QUANT": "int8"}),
            ("reference_faithful",
             {"AIG_BENCH_CACHE": "0", "AIG_BENCH_TRUNK_BN": "train"}),
        ):
            left = remaining() - 30.0
            if left < 150.0:
                print(f"bench ladder: skipping {name} ({left:.0f}s left "
                      "in budget)", file=sys.stderr)
                rungs[name] = None
                continue
            rungs[name] = _child_bench(env, l_att, min(l_to, left))
        rec["ladder"] = {
            "cached": rec["value"],
            **{k: (v["value"] if v else None) for k, v in rungs.items()},
        }
        if any(rungs.values()):
            print(json.dumps(rec))
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    if os.environ.get("AIG_BENCH_CHILD") == "1" or (
        os.environ.get("AIG_BENCH_NO_WATCHDOG") == "1"
    ):
        main()
    else:
        sys.exit(_run_with_watchdog())
