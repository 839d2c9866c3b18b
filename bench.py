"""Benchmark: flagship generation-training throughput on the local chip.

Measures the full AAAI'21 generation train step — device MFCC frontend +
ResNet50 conditioning + UNetAcResNet, MSE+Huber+KL+L2 loss, backward, Adam
— in bfloat16, and reports audio-visual clips/sec/chip (1 clip = 1 second
= 12 synchronized frames of acoustic image + audio + video).

Baseline: the driver north-star target of 5,000 clips/sec on a v5e-8
(BASELINE.json) == 625 clips/sec/chip; ``vs_baseline`` is measured/625.
The TF1 reference has no published throughput (BASELINE.md).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC_CHIP = 5000.0 / 8.0


def main() -> None:
    import optax

    from acoustic_image_generation_tpu.data.preprocess import preprocess_batch
    from acoustic_image_generation_tpu.losses import (
        huber_tf,
        kl_diag_gaussian,
        l2_regularization,
        mse_tf,
    )
    from acoustic_image_generation_tpu.models import ResNet50, UNetAcResNet
    from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap

    import os  # noqa: PLC0415
    # 64-clip default: measured 177.7 (16) / 183.6 (32) / 186.5 (64)
    # clips/sec/chip with the frozen trunk — compute-bound past 32.
    clips = int(os.environ.get("AIG_BENCH_CLIPS", "64"))
    mode = os.environ.get("AIG_BENCH_MODE", "train")  # train | infer | pipeline

    if mode == "pipeline":
        return _pipeline_bench(clips)
    frames = 12 * clips
    rng = np.random.default_rng(0)
    acoustic = rng.random((frames, 36, 48, 12), dtype=np.float32)
    audio = rng.integers(-(2**15), 2**15, (frames, 1024)).astype(np.int32)
    video = rng.integers(0, 255, (frames, 224, 298, 3)).astype(np.uint8)
    action = np.zeros((frames,), np.int32)

    remat = os.environ.get("AIG_BENCH_REMAT", "0") == "1"
    # Pallas fused conv+BN-stats for the trunk's 1x1 convs. Measured: the
    # single-level-blocked Pallas GEMM loses more than the saved stats
    # read pass (75.3 vs 181.9 clips/s at 48 clips) — XLA's GEMM emitter
    # + separate reduction wins. Off by default; kept as a correct,
    # tested baseline for a future k-tiled accumulator kernel.
    fused = os.environ.get("AIG_BENCH_FUSED_BN", "0") == "1"
    # freeze_trunk matches the reference trainer: var_list is UNet +
    # conv_map/logits only (mfcctrainer.py:64, vision.py:70), so the
    # ImageNet backbone contributes forward FLOPs only.
    resnet = ResNet50(
        dtype=jnp.bfloat16, remat=remat, freeze_trunk=True, fused_bn_stats=fused
    )
    generator = UNetAcResNet(skips=1, dtype=jnp.bfloat16)

    @jax.jit
    def init():
        rv = resnet.init({"params": jax.random.key(0)}, jnp.zeros((1, 224, 298, 3)), train=False)
        gv = generator.init(
            {"params": jax.random.key(1), "latent": jax.random.key(2)},
            jnp.zeros((1, 36, 48, 12)),
            jnp.zeros((1, 12, 16, 12)),
        )
        return {"resnet": rv["params"], "generator": gv["params"]}, rv["batch_stats"]

    params, batch_stats = init()
    from acoustic_image_generation_tpu.train.generation import GenerationTask

    tx = optax.multi_transform(
        {"train": optax.adam(1e-4), "frozen": optax.set_to_zero()},
        GenerationTask.param_labels,
    )
    opt_state = jax.jit(tx.init)(params)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, acoustic, audio, video, action, key):
        batch = preprocess_batch(acoustic, audio, video, action, action)

        def loss_fn(p):
            feat, mut = resnet.apply(
                {"params": p["resnet"], "batch_stats": batch_stats},
                batch.video, train=True, mutable=["batch_stats"],
            )
            out = generator.apply(
                {"params": p["generator"]}, tile_mfccmap(batch.mfcc), feat,
                rngs={"latent": key},
            )
            recon = out.output.astype(jnp.float32)
            loss = (
                mse_tf(batch.acoustic, recon)
                + huber_tf(batch.acoustic, recon)
                + 1e-6 * jnp.mean(kl_diag_gaussian(out.mean, out.std))
                + l2_regularization(p["resnet"], 5e-4)
            )
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    args = (
        jnp.asarray(acoustic), jnp.asarray(audio), jnp.asarray(video), jnp.asarray(action),
    )

    if mode == "infer":
        # forward-only serving throughput: mfcc + video -> acoustic image
        from acoustic_image_generation_tpu.data.preprocess import (
            normalize_mfcc,
            normalize_video,
        )
        from acoustic_image_generation_tpu.dsp.mfcc import mfcc_from_frames

        @jax.jit
        def serve(params, batch_stats, audio, video, key):
            mfcc = normalize_mfcc(mfcc_from_frames(audio.astype(jnp.float32)))
            vid = normalize_video(video)
            feat = resnet.apply(
                {"params": params["resnet"], "batch_stats": batch_stats},
                vid, train=False,
            )
            out = generator.apply(
                {"params": params["generator"]}, tile_mfccmap(mfcc), feat,
                rngs={"latent": key},
            )
            return out.output

        out = serve(params, batch_stats, args[1], args[2], jax.random.key(0))
        float(jnp.sum(out))
        # serving needs more steps than train to reach steady state: there
        # is no donated-buffer dependency chain, so the first dispatches
        # pay pipeline-fill costs (measured: 177 clips/s at 10 steps vs
        # 243.8 at 40 on the tunneled chip)
        n_steps = int(os.environ.get("AIG_BENCH_STEPS", "40"))
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(n_steps):
            out = serve(params, batch_stats, args[1], args[2], jax.random.key(i))
            acc = acc + out[0, 0, 0, 0]  # chain a data dependency across steps
        float(acc)
        dt = time.perf_counter() - t0
        clips_per_sec = n_steps * (frames / 12) / dt
        print(json.dumps({
            "metric": "generation_infer_clips_per_sec_chip",
            "value": round(clips_per_sec, 2),
            "unit": "clips/sec/chip",
            "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC_CHIP, 4),
        }))
        return

    scan_k = int(os.environ.get("AIG_BENCH_SCAN", "0"))
    if scan_k:
        # fuse scan_k train steps into ONE jitted program (lax.scan over
        # per-step latent keys): a single dispatch per K steps amortizes
        # the per-call overhead of remote/tunneled execution
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_scan(params, batch_stats, opt_state, acoustic, audio, video, action, keys):
            def body(carry, key):
                p, bs, opt = carry
                p, bs, opt, loss = _step_body(p, bs, opt, acoustic, audio, video, action, key)
                return (p, bs, opt), loss

            (params, batch_stats, opt_state), losses = jax.lax.scan(
                body, (params, batch_stats, opt_state), keys
            )
            return params, batch_stats, opt_state, losses[-1]

        def _step_body(params, batch_stats, opt_state, acoustic, audio, video, action, key):
            batch = preprocess_batch(acoustic, audio, video, action, action)

            def loss_fn(p):
                feat, mut = resnet.apply(
                    {"params": p["resnet"], "batch_stats": batch_stats},
                    batch.video, train=True, mutable=["batch_stats"],
                )
                out = generator.apply(
                    {"params": p["generator"]}, tile_mfccmap(batch.mfcc), feat,
                    rngs={"latent": key},
                )
                recon = out.output.astype(jnp.float32)
                loss = (
                    mse_tf(batch.acoustic, recon)
                    + huber_tf(batch.acoustic, recon)
                    + 1e-6 * jnp.mean(kl_diag_gaussian(out.mean, out.std))
                    + l2_regularization(p["resnet"], 5e-4)
                )
                return loss, mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), new_stats, opt_state, loss

        keys = jax.random.split(jax.random.key(0), scan_k)
        params, batch_stats, opt_state, loss = train_scan(
            params, batch_stats, opt_state, *args, keys
        )
        float(loss)
        n_outer = int(os.environ.get("AIG_BENCH_STEPS", "5"))
        t0 = time.perf_counter()
        for i in range(n_outer):
            params, batch_stats, opt_state, loss = train_scan(
                params, batch_stats, opt_state, *args,
                jax.random.split(jax.random.key(i + 1), scan_k),
            )
        float(loss)
        dt = time.perf_counter() - t0
        clips_per_sec = n_outer * scan_k * (frames / 12) / dt
        print(json.dumps({
            "metric": "generation_train_clips_per_sec_chip",
            "value": round(clips_per_sec, 2),
            "unit": "clips/sec/chip",
            "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC_CHIP, 4),
        }))
        return

    # warmup (compile + 2 steady steps); fetching the loss VALUE forces
    # real execution — on a tunneled TPU, block_until_ready alone returns
    # before the remote computation finishes and wildly overstates
    # throughput, so every timing boundary below is a value fetch.
    for i in range(3):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, *args, jax.random.key(i)
        )
    float(loss)

    n_steps = int(os.environ.get("AIG_BENCH_STEPS", "10"))
    # materialize per-step keys up front: creating a key inside the loop
    # costs a tiny host->device transfer per step
    keys = list(jax.random.split(jax.random.key(100), n_steps))
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, *args, keys[i]
        )
    # the last step depends on every earlier step's params; fetching its
    # loss waits for the whole chain
    float(loss)
    dt = time.perf_counter() - t0

    clips_per_sec = n_steps * (frames / 12) / dt
    print(
        json.dumps(
            {
                "metric": "generation_train_clips_per_sec_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/sec/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC_CHIP, 4),
            }
        )
    )


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
    The dataset is cached under /tmp across runs (the first run pays
    ~3 min of synthetic-shard writing)."""
    import os
    import shutil

    from acoustic_image_generation_tpu.core.config import (
        DataConfig, ExperimentConfig, ModelConfig, OptimConfig, ParallelConfig,
        RunConfig,
    )
    from acoustic_image_generation_tpu.data.convert import reshard
    from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
    from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset
    from acoustic_image_generation_tpu.train.generation import GenerationTask
    from acoustic_image_generation_tpu.train.trainer import Trainer

    tmp = "/tmp/aig_bench_data_v1"
    try:
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
        cfg = ExperimentConfig(
            data=DataConfig(batch_size=clips, sample_length=1),
            model=ModelConfig(embedding=True, mfcc=True, num_skip_conn=1),
            optim=OptimConfig(learning_rate=1e-4, num_epochs=1),
            run=RunConfig(exp_name="bench", checkpoint_dir=os.path.join(tmp, "ck")),
            parallel=ParallelConfig(compute_dtype="bfloat16"),
        )
        loader = AcousticImageDataLoader(
            flat_list, "training", clips, use_native=True
        )
        trainer = Trainer(GenerationTask(cfg), cfg)
        it = loader.batches(0)
        state = trainer.init_state(next(iter(it)))
        # warmup: compile + 1 steady step
        warm = 0
        for raw in loader.batches(0):
            state, metrics = trainer.train_step(state, raw)
            warm += 1
            if warm >= 2:
                break
        float(jax.device_get(metrics["loss"]))
        t0 = time.perf_counter()
        n_clips = 0
        metrics = None
        for epoch in range(int(os.environ.get("AIG_BENCH_EPOCHS", "2"))):
            for raw in loader.batches(epoch):
                state, metrics = trainer.train_step(state, raw)
                n_clips += raw.valid
        float(jax.device_get(metrics["loss"]))  # drain the pipeline
        dt = time.perf_counter() - t0
        clips_per_sec = n_clips / dt
        print(json.dumps({
            "metric": "pipeline_train_clips_per_sec_chip",
            "value": round(clips_per_sec, 2),
            "unit": "clips/sec/chip",
            "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC_CHIP, 4),
        }))
    finally:
        pass  # dataset cache is kept for the next run


if __name__ == "__main__":
    main()
