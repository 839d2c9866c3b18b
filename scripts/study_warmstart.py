"""Warm-start surrogate study on the REAL TPU.

docs/RESULTS.md documents the render-from-latent plateau: the flagship
(frozen-trunk UNetAcResNet, `/root/reference/trainer/mfcctrainer.py:38-45`)
reliably stalls at test MSE ~0.016 at micro-scale, and the reference-scale
step-count run (scripts/study_synthetic.py, AIG_STUDY_EPOCHS=10000) shows
the plateau is NOT a step-count problem. The remaining hypothesis is that
it is a frozen-RANDOM-trunk problem: the reference warm-starts its trunk
from ImageNet (`/root/reference/models/vision.py:20-42`), which this
environment cannot download (zero egress).

This study substitutes a synthetic pretraining for ImageNet: train the
full ResNet50 (trunk included) on a supervised proxy task — predict the
sound source's spatial position map and the clip's class from the video
frame — then warm-start the flagship generation recipe from that trunk
(conv_map/logits re-initialized, exactly the reference's restore
exclusion at vision.py:31-36) and compare against the random-trunk
plateau. If the warm-started run clears 0.016, the plateau is a trunk
initialization problem and the reference recipe's warm start is
load-bearing, closing the docs/RESULTS.md finding.

Env knobs: AIG_WS_SEED, AIG_WS_PRETRAIN_EPOCHS (default 300),
AIG_WS_EPOCHS (flagship epochs, default 1000).
"""
import os

import _bootstrap  # noqa: F401  (repo root onto sys.path)
import json
import time
from functools import partial

SEED = int(os.environ.get("AIG_WS_SEED", "0"))
PRETRAIN_EPOCHS = int(os.environ.get("AIG_WS_PRETRAIN_EPOCHS", "300"))
EPOCHS = int(os.environ.get("AIG_WS_EPOCHS", "1000"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

assert jax.devices()[0].platform != "cpu"

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
    softmax_cross_entropy,
)
from acoustic_image_generation_tpu.models import ResNet50, UNetAcResNet
from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap
from acoustic_image_generation_tpu.train.generation import GenerationTask

t_start = time.time()

# ---------------------------------------------------------------- dataset
# Same dataset + video-level split as scripts/study_synthetic.py so the
# two studies' numbers are directly comparable.
tmp = "/tmp/aig_study_ds"
if not os.path.exists(tmp):
    write_synthetic_dataset(
        tmp, num_classes=2, videos_per_class=8, seconds_per_video=8, seed=7
    )
lists = {}
for split, rng_v in (("training", range(1, 7)), ("testing", range(7, 9))):
    keep = []
    with open(os.path.join(tmp, "lists/training.txt")) as f:
        for line in f:
            loc = int(line.split("/data_")[1][:3])
            v = (loc - 1) % 8 + 1
            if v in rng_v:
                keep.append(line.strip())
    path = os.path.join(tmp, f"lists/{split}_study.txt")
    with open(path, "w") as f:
        f.write("\n".join(keep) + "\n")
    lists[split] = path


def load_all(list_path, mode):
    loader = AcousticImageDataLoader(list_path, mode, 8)
    ac, au, vi, act = [], [], [], []
    for raw in loader.batches(0):
        n = raw.valid
        ac.append(raw.acoustic[:n]); au.append(raw.audio[:n])
        vi.append(raw.video[:n]); act.append(raw.action[:n])
    return (np.concatenate(ac), np.concatenate(au), np.concatenate(vi),
            np.concatenate(act))


tr_ac, tr_au, tr_vi, tr_act = load_all(lists["training"], "training")
te_ac, te_au, te_vi, te_act = load_all(lists["testing"], "testing")
flat = lambda x: x.reshape(-1, *x.shape[2:])
dtr = [jax.device_put(flat(x)) for x in (tr_ac, tr_au, tr_vi)]
dtr_act = jax.device_put(np.repeat(tr_act, 12))
dte = [jax.device_put(flat(x)) for x in (te_ac, te_au, te_vi)]
dte_act = jax.device_put(np.repeat(te_act, 12))
n_tr, n_te = dtr[0].shape[0], dte[0].shape[0]
print(f"device data: {n_tr} train / {n_te} test frames "
      f"({time.time()-t_start:.0f}s)", flush=True)

BATCH = 32 * 12
steps_per_epoch = n_tr // BATCH
rng = np.random.default_rng(SEED)


def clip_perm(rng, n_frames):
    clips = rng.permutation(n_frames // 12)
    return (clips[:, None] * 12 + np.arange(12)[None, :]).reshape(-1)


# --------------------------------------------------- phase 1: pretraining
# Proxy labels derived from the TRAIN acoustic images (a pretraining
# dataset label, like any detection corpus): per-frame channel-mean
# energy, 3x3-avg-pooled to the conv_map's 12x16 lattice, min-max
# normalized to [0,1].
@jax.jit
def position_targets(ac):
    e = jnp.mean(ac, axis=-1)  # (n,36,48)
    e = e.reshape(e.shape[0], 12, 3, 16, 3).mean((2, 4))  # (n,12,16)
    lo = e.min(axis=(1, 2), keepdims=True)
    hi = e.max(axis=(1, 2), keepdims=True)
    return (e - lo) / (hi - lo + 1e-8)


ttr = position_targets(dtr[0])

# full-trunk backward: remat per unit + a smaller batch to fit the
# 16 GB HBM (the flagship's frozen trunk never pays this memory)
# f32 for the pretraining phase: one early overflowing batch in bf16
# poisons the BN running-stat EMA with NaN forever (train-mode loss
# recovers, the 0.997-EMA does not) — observed in the first bf16 run
resnet_pre = ResNet50(dtype=jnp.float32, freeze_trunk=False, remat=True)
PRE_BATCH = 8 * 12


@jax.jit
def init_pre():
    rv = resnet_pre.init(
        {"params": jax.random.key(SEED * 31)}, jnp.zeros((1, 224, 298, 3)),
        train=False,
    )
    k1, k2, k3 = jax.random.split(jax.random.key(SEED * 31 + 7), 3)
    head = {
        "w1": jax.random.normal(k1, (12, 32)) * 0.3,
        "b1": jnp.zeros((32,)),
        "w2": jax.random.normal(k2, (32, 1)) * 0.3,
        "b2": jnp.zeros((1,)),
        "wc": jax.random.normal(k3, (12, 2)) * 0.3,
        "bc": jnp.zeros((2,)),
    }
    return {"resnet": rv["params"], "head": head}, rv["batch_stats"]


pre_params, pre_stats = init_pre()
pre_tx = optax.adam(3e-4)
pre_opt = jax.jit(pre_tx.init)(pre_params)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def pretrain_step(params, batch_stats, opt_state, video_u8, targets, labels, idx):
    from acoustic_image_generation_tpu.data import preprocess

    video = preprocess.normalize_video(video_u8[idx])
    tgt = targets[idx]
    lab = jax.nn.one_hot(labels[idx], 2)

    def loss_fn(p):
        feat, mut = resnet_pre.apply(
            {"params": p["resnet"], "batch_stats": batch_stats},
            video, train=True, mutable=["batch_stats"],
        )
        f = feat.astype(jnp.float32)  # (B,12,16,12) conv_map output
        h = jax.nn.relu(jnp.einsum("bhwc,cd->bhwd", f, p["head"]["w1"])
                        + p["head"]["b1"])
        pos = jax.nn.sigmoid(
            jnp.einsum("bhwd,de->bhwe", h, p["head"]["w2"])[..., 0]
            + p["head"]["b2"][0]
        )
        l_pos = jnp.mean(jnp.square(pos - tgt))
        pooled = f.mean(axis=(1, 2))
        logits = pooled @ p["head"]["wc"] + p["head"]["bc"]
        l_cls = softmax_cross_entropy(lab, logits)
        return l_pos + l_cls, (mut["batch_stats"], l_pos, l_cls)

    (loss, (new_stats, l_pos, l_cls)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    upd, opt_state = pre_tx.update(grads, opt_state)
    return (optax.apply_updates(params, upd), new_stats, opt_state,
            l_pos, l_cls)


pre_steps = n_tr // PRE_BATCH
for epoch in range(PRETRAIN_EPOCHS):
    perm = clip_perm(rng, n_tr)
    for s in range(pre_steps):
        idx = jnp.asarray(perm[s * PRE_BATCH:(s + 1) * PRE_BATCH])
        pre_params, pre_stats, pre_opt, l_pos, l_cls = pretrain_step(
            pre_params, pre_stats, pre_opt, dtr[2], ttr, dtr_act, idx
        )
    if epoch % 25 == 24 or epoch == 0:
        print(f"pretrain epoch {epoch}: pos {float(l_pos):.5f} "
              f"cls {float(l_cls):.5f} ({time.time()-t_start:.0f}s)",
              flush=True)

pretrained_trunk = {
    k: v for k, v in pre_params["resnet"].items()
    if k not in ("conv_map", "logits")
}
pretrained_stats = jax.device_get(pre_stats)
bad = sum(
    int(np.size(x) - np.isfinite(x).sum())
    for x in jax.tree_util.tree_leaves(pretrained_stats)
)
assert bad == 0, f"{bad} non-finite running-stat entries after pretraining"
print(f"pretraining done ({time.time()-t_start:.0f}s)", flush=True)

# ----------------------------------------------- phase 2: flagship, warm
resnet = ResNet50(dtype=jnp.bfloat16, freeze_trunk=True)
gen = UNetAcResNet(skips=1, dtype=jnp.bfloat16)


@jax.jit
def init_flagship():
    rv = resnet.init({"params": jax.random.key(SEED * 31 + 1)},
                     jnp.zeros((1, 224, 298, 3)), train=False)
    gv = gen.init(
        {"params": jax.random.key(SEED * 31 + 2), "latent": jax.random.key(2)},
        jnp.zeros((1, 36, 48, 12)), jnp.zeros((1, 12, 16, 12)),
    )
    return {"resnet": rv["params"], "generator": gv["params"]}, rv["batch_stats"]


params, batch_stats = init_flagship()
# the warm start: pretrained trunk + BN stats, FRESH conv_map (the
# reference excludes conv_map/logits when restoring ImageNet weights,
# vision.py:31-36)
params = {
    "resnet": {**params["resnet"], **pretrained_trunk},
    "generator": params["generator"],
}
batch_stats = jax.device_put(pretrained_stats)

tx = optax.multi_transform(
    {"train": optax.adam(1e-3), "frozen": optax.set_to_zero()},
    GenerationTask.param_labels,
)
opt_state = jax.jit(tx.init)(params)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def train_step(params, batch_stats, opt_state, d0, d1, d2, dact, idx, key):
    b = preprocess_batch(d0[idx], d1[idx], d2[idx], dact[idx], dact[idx])

    def loss_fn(p):
        feat, mut = resnet.apply(
            {"params": p["resnet"], "batch_stats": batch_stats},
            b.video, train=True, mutable=["batch_stats"],
        )
        out = gen.apply({"params": p["generator"]}, tile_mfccmap(b.mfcc), feat,
                        rngs={"latent": key})
        recon = out.output.astype(jnp.float32)
        loss = (mse_tf(b.acoustic, recon) + huber_tf(b.acoustic, recon)
                + 1e-6 * jnp.mean(kl_diag_gaussian(out.mean, out.std))
                + l2_regularization(p["resnet"], 5e-4))
        return loss, (mut["batch_stats"], mse_tf(b.acoustic, recon))

    (loss, (new_stats, mse)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    upd, opt_state = tx.update(grads, opt_state)
    return optax.apply_updates(params, upd), new_stats, opt_state, mse


@jax.jit
def test_metrics(params, batch_stats, d0, d1, d2, dact, key):
    b = preprocess_batch(d0, d1, d2, dact, dact)
    feat = resnet.apply({"params": params["resnet"], "batch_stats": batch_stats},
                        b.video, train=False)
    out = gen.apply({"params": params["generator"]}, tile_mfccmap(b.mfcc), feat,
                    rngs={"latent": key})
    recon = out.output.astype(jnp.float32)
    mse = jnp.mean(jnp.square(b.acoustic - recon))
    return mse, iou_real_vs_generated(b.acoustic, recon)


mse0, ious0 = test_metrics(params, batch_stats, *dte, dte_act, jax.random.key(9))
auc0 = localization_auc(threshold_fractions(np.asarray(ious0)))
print(f"warm-started, untrained head: test MSE {float(mse0):.5f} "
      f"AUC {auc0:.4f}", flush=True)

history = []
eval_every = max(10, EPOCHS // 100)
for epoch in range(EPOCHS):
    perm = clip_perm(rng, n_tr)
    mse = None
    for s in range(steps_per_epoch):
        idx = jnp.asarray(perm[s * BATCH:(s + 1) * BATCH])
        params, batch_stats, opt_state, mse = train_step(
            params, batch_stats, opt_state, *dtr, dtr_act, idx,
            jax.random.key(SEED * 1_000_000 + epoch * 1000 + s),
        )
    if epoch % eval_every == eval_every - 1 or epoch == 0:
        tm, _ = test_metrics(params, batch_stats, *dte, dte_act,
                             jax.random.key(9))
        history.append((epoch, float(jax.device_get(mse)), float(tm)))
        print(f"epoch {epoch}: train MSE {history[-1][1]:.5f} "
              f"test MSE {history[-1][2]:.5f} "
              f"({time.time()-t_start:.0f}s)", flush=True)

mse1, ious1 = test_metrics(params, batch_stats, *dte, dte_act, jax.random.key(9))
fr1 = threshold_fractions(np.asarray(ious1))
auc1 = localization_auc(fr1)
print(json.dumps({
    "pretrain_epochs": PRETRAIN_EPOCHS,
    "flagship_epochs": EPOCHS,
    "untrained": {"test_mse": float(mse0), "auc": round(auc0, 4)},
    "warmstarted_trained": {"test_mse": float(mse1), "auc": round(auc1, 4)},
    "iou_fractions": {str(k): round(v, 3) for k, v in fr1.items()},
    "random_trunk_plateau_reference": 0.0164,
    "wall_s": round(time.time() - t_start, 1),
}, indent=1), flush=True)
