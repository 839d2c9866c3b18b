"""Shared pieces of the on-chip synthetic-benchmark studies.

Factored out of ``study_synthetic.py`` so the multi-seed convergence
protocol (``study_protocol.py``) and the single-seed study drive the
SAME dataset, flagship step and evaluation code. Everything here runs
on the real TPU with device-resident data; reference semantics are the
TrainerMask recipe (``/root/reference/trainer/mfcctrainer.py:28-82``)
with the frozen trunk (``vision.py:68-71``).
"""
from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

# persist compiled executables across processes: the tunnel-wedge retry
# loop (study_protocol) relaunches in fresh processes, which would
# otherwise pay ~5 min of compiles per attempt
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("AIG_JAX_CACHE", "/tmp/aig_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
from acoustic_image_generation_tpu.data.preprocess import preprocess_batch
from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset
from acoustic_image_generation_tpu.evaluation.iou import (
    iou_real_vs_generated,
    localization_auc,
    threshold_fractions,
)
from acoustic_image_generation_tpu.losses import (
    huber_tf,
    kl_diag_gaussian,
    l2_regularization,
    mse_tf,
    sigmoid_ce_logits,
)
from acoustic_image_generation_tpu.models import ResNet50, UNetAcResNet
from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap
from acoustic_image_generation_tpu.train.generation import GenerationTask

BATCH = 32 * 12  # frames per step
CHUNK = 768


def build_dataset(videos: int = 8):
    """Synthetic localization dataset + video-level train/test split.
    Returns dict of list paths."""
    tmp = f"/tmp/aig_study_ds_v{videos}" if videos != 8 else "/tmp/aig_study_ds"
    if not os.path.exists(tmp):
        write_synthetic_dataset(
            tmp, num_classes=2, videos_per_class=videos, seconds_per_video=8,
            seed=7,
        )
    n_train_v = videos * 3 // 4
    lists = {}
    for split, rng_v in (
        ("training", range(1, n_train_v + 1)),
        ("testing", range(n_train_v + 1, videos + 1)),
    ):
        keep = []
        with open(os.path.join(tmp, "lists/training.txt")) as f:
            for line in f:
                loc = int(line.split("/data_")[1][:3])
                v = (loc - 1) % videos + 1
                if v in rng_v:
                    keep.append(line.strip())
        path = os.path.join(tmp, f"lists/{split}_study.txt")
        with open(path, "w") as f:
            f.write("\n".join(keep) + "\n")
        lists[split] = path
    lists["root"] = tmp
    return lists


def load_split(list_path: str, mode: str):
    loader = AcousticImageDataLoader(list_path, mode, 8)
    ac, au, vi, act = [], [], [], []
    for raw in loader.batches(0):
        n = raw.valid
        ac.append(raw.acoustic[:n]); au.append(raw.audio[:n])
        vi.append(raw.video[:n]); act.append(raw.action[:n])
    return (np.concatenate(ac), np.concatenate(au), np.concatenate(vi),
            np.concatenate(act))


def device_split(arrays):
    """(ac, au, vi, act) clip arrays -> device-resident frame tensors."""
    ac, au, vi, act = arrays
    flat = lambda x: x.reshape(-1, *x.shape[2:])
    d = [jax.device_put(flat(x)) for x in (ac, au, vi)]
    dact = jax.device_put(np.repeat(act, 12))
    return d, dact


def clip_perm(rng, n_frames):
    """Shuffle whole 12-frame clips: frames of one clip stay contiguous so
    clip_logits / per-clip labels stay aligned."""
    clips = rng.permutation(n_frames // 12)
    return (clips[:, None] * 12 + np.arange(12)[None, :]).reshape(-1)


class Flagship:
    """ResNet50 + UNetAcResNet 1-skip with jitted train/eval steps —
    the TrainerMask recipe on device-resident data.

    ``blob_weight`` is a CLEARLY-FLAGGED DEVIATION from the reference
    loss (off by default): the micro-benchmark's render-from-latent
    plateau (docs/RESULTS.md) is a weak-gradient cliff — the source blob
    covers a few % of the 36x48 field, so the position-specific part of
    the reconstruction gradient through the 150-d latent drowns in the
    background term. ``blob_weight=L`` reweights the squared error by
    ``(1 + L * target_energy) / mean(...)`` (target-normalized, scale
    preserved), amplifying exactly the gradient the diagnosis found too
    weak. Reported metrics remain the reference's UNWEIGHTED MSE.

    ``recon="bce"`` is a second CLEARLY-FLAGGED DEVIATION (default
    "mse" = the reference loss). diag_collapse.py traces the plateau's
    true mechanism: with ~94% of the synthetic target near zero, every
    decoder layer receives sign-consistent gradients and Adam (whose
    per-step size never shrinks with the gradient) drives the
    background logits ~-40/epoch into sigmoid saturation; past logit
    ~-88 sigmoid' underflows to EXACTLY zero and training is
    irreversibly dead by epoch ~5 in f32 and bf16 alike (the 0.016379
    "plateau" is the all-zeros predictor: E[target^2]). Replacing
    MSE+Huber with sigmoid cross-entropy moves the reconstruction
    gradient to logit space — d/dlogit = (y - t) — which cannot vanish
    at saturation and self-corrects any overshoot. Reported metrics
    remain the reference's UNWEIGHTED MSE in output space."""

    def __init__(self, lr: float = 1e-3, blob_weight: float = 0.0,
                 dtype=jnp.bfloat16, recon: str = "mse"):
        self.resnet = ResNet50(dtype=dtype, freeze_trunk=True)
        self.gen = UNetAcResNet(skips=1, dtype=dtype)
        self.tx = optax.multi_transform(
            {"train": optax.adam(lr), "frozen": optax.set_to_zero()},
            GenerationTask.param_labels,
        )

        resnet, gen, tx = self.resnet, self.gen, self.tx

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, batch_stats, opt_state, d0, d1, d2, dact,
                       idx, key):
            b = preprocess_batch(d0[idx], d1[idx], d2[idx], dact[idx], dact[idx])

            def loss_fn(p):
                feat, mut = resnet.apply(
                    {"params": p["resnet"], "batch_stats": batch_stats},
                    b.video, train=True, mutable=["batch_stats"],
                )
                out = gen.apply(
                    {"params": p["generator"]}, tile_mfccmap(b.mfcc), feat,
                    rngs={"latent": key},
                )
                recon_img = out.output.astype(jnp.float32)
                if recon == "bce":
                    rec_loss = sigmoid_ce_logits(b.acoustic, out.logits)
                elif blob_weight:
                    w = 1.0 + blob_weight * jax.lax.stop_gradient(b.acoustic)
                    rec_loss = jnp.mean(
                        w * jnp.square(b.acoustic - recon_img)
                    ) / jnp.mean(w) + huber_tf(b.acoustic, recon_img)
                else:
                    rec_loss = (mse_tf(b.acoustic, recon_img)
                                + huber_tf(b.acoustic, recon_img))
                loss = (rec_loss
                        + 1e-6 * jnp.mean(kl_diag_gaussian(out.mean, out.std))
                        + l2_regularization(p["resnet"], 5e-4))
                return loss, (mut["batch_stats"], mse_tf(b.acoustic, recon_img))

            (loss, (new_stats, mse)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            upd, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, upd), new_stats, opt_state, mse

        @jax.jit
        def generate(params, batch_stats, ac, au, vi, act, key):
            b = preprocess_batch(ac, au, vi, act, act)
            feat = resnet.apply(
                {"params": params["resnet"], "batch_stats": batch_stats},
                b.video, train=False,
            )
            out = gen.apply(
                {"params": params["generator"]}, tile_mfccmap(b.mfcc), feat,
                rngs={"latent": key},
            )
            return b.acoustic, out.output.astype(jnp.float32)

        @jax.jit
        def test_metrics(params, batch_stats, d0, d1, d2, dact, key):
            real, recon = generate(params, batch_stats, d0, d1, d2, dact, key)
            mse = jnp.mean(jnp.square(real - recon))
            ious = iou_real_vs_generated(real, recon)
            return mse, ious, recon

        self.train_step = train_step
        self.generate = generate
        self._test_metrics = test_metrics

    def init(self, seed: int):
        resnet, gen = self.resnet, self.gen

        @jax.jit
        def _init():
            rv = resnet.init(
                {"params": jax.random.key(seed * 31 + 0)},
                jnp.zeros((1, 224, 298, 3)), train=False,
            )
            gv = gen.init(
                {"params": jax.random.key(seed * 31 + 1),
                 "latent": jax.random.key(2)},
                jnp.zeros((1, 36, 48, 12)), jnp.zeros((1, 12, 16, 12)),
            )
            return {"resnet": rv["params"], "generator": gv["params"]}, \
                rv["batch_stats"]

        params, batch_stats = _init()
        opt_state = jax.jit(self.tx.init)(params)
        return params, batch_stats, opt_state

    def test_metrics_chunked(self, params, batch_stats, d, dact, key):
        n = d[0].shape[0]
        tot, ious, recons = 0.0, [], []
        for i in range(0, n, CHUNK):
            sl = slice(i, min(i + CHUNK, n))
            m, io, rc = self._test_metrics(
                params, batch_stats, d[0][sl], d[1][sl], d[2][sl], dact[sl], key
            )
            tot += float(jax.device_get(m)) * (sl.stop - sl.start)
            ious.append(np.asarray(io)); recons.append(np.asarray(rc))
        return tot / n, np.concatenate(ious), np.concatenate(recons)

    def generate_chunked(self, params, batch_stats, d, dact, key):
        n = d[0].shape[0]
        outs = []
        for i in range(0, n, CHUNK):
            sl = slice(i, min(i + CHUNK, n))
            _, rc = self.generate(
                params, batch_stats, d[0][sl], d[1][sl], d[2][sl], dact[sl], key
            )
            outs.append(np.asarray(rc))
        return np.concatenate(outs)

    def train_epochs(self, params, batch_stats, opt_state, dtr, dtr_act,
                     *, seed: int, epochs: int, start_epoch: int = 0,
                     rng=None, eval_every: int | None = None,
                     dte=None, dte_act=None, on_eval=None):
        """Run ``epochs`` epochs; optionally evaluate every ``eval_every``
        epochs and call ``on_eval(epoch, train_mse, test_mse) -> bool``
        (return True to stop early)."""
        n_tr = dtr[0].shape[0]
        steps_per_epoch = n_tr // BATCH
        rng = rng or np.random.default_rng(seed)
        mse = None
        for epoch in range(start_epoch, start_epoch + epochs):
            perm = clip_perm(rng, n_tr)
            for s in range(steps_per_epoch):
                idx = jnp.asarray(perm[s * BATCH:(s + 1) * BATCH])
                params, batch_stats, opt_state, mse = self.train_step(
                    params, batch_stats, opt_state, *dtr, dtr_act, idx,
                    jax.random.key(seed * 1_000_000 + epoch * 1000 + s),
                )
            if eval_every and (epoch % eval_every == eval_every - 1):
                tm, _, _ = self.test_metrics_chunked(
                    params, batch_stats, dte, dte_act, jax.random.key(9)
                )
                if on_eval and on_eval(epoch, float(jax.device_get(mse)), tm):
                    break
        return params, batch_stats, opt_state, mse


def localization_summary(ious):
    fr = threshold_fractions(np.asarray(ious))
    return fr, localization_auc(fr)
