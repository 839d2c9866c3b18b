"""End-to-end training study on the REAL TPU: train the flagship generator
on the synthetic localization benchmark, then evaluate everything the
reference measures — reconstruction MSE, IoU/AUC localization, and
classify-generated accuracy (saveimagesresnet protocol). Data lives on
device; only tiny index arrays cross the tunnel per step."""
import os

import _bootstrap  # noqa: F401  (repo root onto sys.path)
import json
import tempfile
import time

SEED = int(os.environ.get("AIG_STUDY_SEED", "0"))
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

assert jax.devices()[0].platform != "cpu"

from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
from acoustic_image_generation_tpu.data.preprocess import preprocess_batch
from acoustic_image_generation_tpu.data.synthetic import write_synthetic_dataset
from acoustic_image_generation_tpu.dsp.energy import find_logen
from acoustic_image_generation_tpu.evaluation.iou import (
    energy_mask,
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
from acoustic_image_generation_tpu.models import DualCamNet, ResNet50, UNetAcResNet
from acoustic_image_generation_tpu.models.dualcamnet import clip_logits
from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap

t_start = time.time()

# ---------------------------------------------------------------- dataset
# AIG_STUDY_VIDEOS scales the dataset (default 8 videos/class = 96 train
# clips; the reference protocol trains on ~17k clips — data scale is one
# of the plateau hypotheses in docs/RESULTS.md)
VIDEOS = int(os.environ.get("AIG_STUDY_VIDEOS", "8"))
tmp = f"/tmp/aig_study_ds_v{VIDEOS}" if VIDEOS != 8 else "/tmp/aig_study_ds"
if not os.path.exists(tmp):
    write_synthetic_dataset(
        tmp, num_classes=2, videos_per_class=VIDEOS, seconds_per_video=8,
        seed=7,
    )
# manual video-level split: first 3/4 of each class's videos train, rest test
n_train_v = VIDEOS * 3 // 4
lists = {}
for split, rng_v in (
    ("training", range(1, n_train_v + 1)),
    ("testing", range(n_train_v + 1, VIDEOS + 1)),
):
    keep = []
    with open(os.path.join(tmp, "lists/training.txt")) as f:
        for line in f:
            loc = int(line.split("/data_")[1][:3])
            v = (loc - 1) % VIDEOS + 1
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
print(f"train clips {len(tr_act)}, test clips {len(te_act)} "
      f"({time.time()-t_start:.0f}s)", flush=True)

flat = lambda x: x.reshape(-1, *x.shape[2:])
# device-resident frame tensors
dtr = [jax.device_put(flat(x)) for x in (tr_ac, tr_au, tr_vi)]
dtr_act = jax.device_put(np.repeat(tr_act, 12))
dte = [jax.device_put(flat(x)) for x in (te_ac, te_au, te_vi)]
dte_act = jax.device_put(np.repeat(te_act, 12))
n_tr, n_te = dtr[0].shape[0], dte[0].shape[0]
print(f"device data: {n_tr} train frames, {n_te} test frames", flush=True)

# ------------------------------------------------------------- flagship
resnet = ResNet50(dtype=jnp.bfloat16, freeze_trunk=True)
gen = UNetAcResNet(skips=1, dtype=jnp.bfloat16)
BATCH = 32 * 12  # frames per step


@jax.jit
def init():
    rv = resnet.init({"params": jax.random.key(SEED * 31 + 0)}, jnp.zeros((1, 224, 298, 3)), train=False)
    gv = gen.init({"params": jax.random.key(SEED * 31 + 1), "latent": jax.random.key(2)},
                  jnp.zeros((1, 36, 48, 12)), jnp.zeros((1, 12, 16, 12)))
    return {"resnet": rv["params"], "generator": gv["params"]}, rv["batch_stats"]


params, batch_stats = init()
from acoustic_image_generation_tpu.train.generation import GenerationTask
tx = optax.multi_transform(
    {"train": optax.adam(1e-3), "frozen": optax.set_to_zero()},
    GenerationTask.param_labels,
)
opt_state = jax.jit(tx.init)(params)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def train_step(params, batch_stats, opt_state, d0, d1, d2, dact, idx, key):
    b = preprocess_batch(d0[idx], d1[idx], d2[idx], dact[idx], dact[idx])

    def loss_fn(p):
        feat, mut = resnet.apply({"params": p["resnet"], "batch_stats": batch_stats},
                                 b.video, train=True, mutable=["batch_stats"])
        out = gen.apply({"params": p["generator"]}, tile_mfccmap(b.mfcc), feat,
                        rngs={"latent": key})
        recon = out.output.astype(jnp.float32)
        loss = (mse_tf(b.acoustic, recon) + huber_tf(b.acoustic, recon)
                + 1e-6 * jnp.mean(kl_diag_gaussian(out.mean, out.std))
                + l2_regularization(p["resnet"], 5e-4))
        return loss, (mut["batch_stats"], mse_tf(b.acoustic, recon))

    (loss, (new_stats, mse)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    upd, opt_state = tx.update(grads, opt_state)
    return optax.apply_updates(params, upd), new_stats, opt_state, mse


@jax.jit
def generate(params, batch_stats, ac, au, vi, act, key):
    b = preprocess_batch(ac, au, vi, act, act)
    feat = resnet.apply({"params": params["resnet"], "batch_stats": batch_stats},
                        b.video, train=False)
    out = gen.apply({"params": params["generator"]}, tile_mfccmap(b.mfcc), feat,
                    rngs={"latent": key})
    return b.acoustic, out.output.astype(jnp.float32)


@jax.jit
def test_metrics(params, batch_stats, d0, d1, d2, dact, key):
    real, recon = generate(params, batch_stats, d0, d1, d2, dact, key)
    mse = jnp.mean(jnp.square(real - recon))
    ious = iou_real_vs_generated(real, recon)
    return mse, ious, recon


# Chunked wrappers: at AIG_STUDY_VIDEOS scale a single trunk forward
# over the whole split would not fit HBM; evaluate/generate in
# fixed-size frame chunks and aggregate on host.
CHUNK = 768


def test_metrics_chunked(params, batch_stats, d0, d1, d2, dact, key):
    n = d0.shape[0]
    tot, ious, recons = 0.0, [], []
    for i in range(0, n, CHUNK):
        sl = slice(i, min(i + CHUNK, n))
        m, io, rc = test_metrics(
            params, batch_stats, d0[sl], d1[sl], d2[sl], dact[sl], key
        )
        tot += float(jax.device_get(m)) * (sl.stop - sl.start)
        ious.append(np.asarray(io)); recons.append(np.asarray(rc))
    return tot / n, np.concatenate(ious), np.concatenate(recons)


def generate_chunked(params, batch_stats, d0, d1, d2, dact, key):
    n = d0.shape[0]
    outs = []
    for i in range(0, n, CHUNK):
        sl = slice(i, min(i + CHUNK, n))
        _, rc = generate(
            params, batch_stats, d0[sl], d1[sl], d2[sl], dact[sl], key
        )
        outs.append(np.asarray(rc))
    return np.concatenate(outs)


# pre-training baseline
rng = np.random.default_rng(SEED)
mse0, ious0, _ = test_metrics_chunked(params, batch_stats, *dte, dte_act, jax.random.key(9))
fr0 = threshold_fractions(np.asarray(ious0))
auc0 = localization_auc(fr0)
print(f"untrained: test MSE {float(mse0):.5f}  AUC {auc0:.4f}", flush=True)

# 300 epochs ~ 900 steps (micro-scale default). The reference's real
# protocol runs ~80k steps; AIG_STUDY_EPOCHS lets the study match that
# scale (the cached/frozen trunk makes 30k+ steps a <1 h run) to test
# whether the render-from-latent plateau (docs/RESULTS.md) clears with
# reference-length optimization.
EPOCHS = int(os.environ.get("AIG_STUDY_EPOCHS", "300"))
steps_per_epoch = n_tr // BATCH
CLIPS_PER_STEP = BATCH // 12


def clip_perm(rng, n_frames):
    """Shuffle whole 12-frame clips: frames of one clip stay contiguous so
    clip_logits / per-clip labels stay aligned."""
    clips = rng.permutation(n_frames // 12)
    return (clips[:, None] * 12 + np.arange(12)[None, :]).reshape(-1)


history = []
for epoch in range(EPOCHS):
    perm = clip_perm(rng, n_tr)
    mse = None
    for s in range(steps_per_epoch):
        idx = jnp.asarray(perm[s * BATCH:(s + 1) * BATCH])
        params, batch_stats, opt_state, mse = train_step(
            params, batch_stats, opt_state, *dtr, dtr_act, idx,
            jax.random.key(SEED * 1_000_000 + epoch * 1000 + s),
        )
    eval_every = max(10, EPOCHS // 100)
    if epoch % eval_every == eval_every - 1 or epoch == 0:
        tm, ti, _ = test_metrics_chunked(params, batch_stats, *dte, dte_act, jax.random.key(9))
        history.append((epoch, float(jax.device_get(mse)), float(tm)))
        print(f"epoch {epoch}: train MSE {history[-1][1]:.5f} "
              f"test MSE {history[-1][2]:.5f} ({time.time()-t_start:.0f}s)", flush=True)

mse1, ious1, recon_test = test_metrics_chunked(params, batch_stats, *dte, dte_act, jax.random.key(9))
fr1 = threshold_fractions(np.asarray(ious1))
auc1 = localization_auc(fr1)
print(f"trained: test MSE {float(mse1):.5f}  AUC {auc1:.4f}", flush=True)

# --------------------------------------------- classify real vs generated
dcn = DualCamNet(num_classes=2, num_frames=12, dtype=jnp.bfloat16)
dv = jax.jit(lambda: dcn.init({"params": jax.random.key(3)}, jnp.zeros((12, 36, 48, 12))))()
dcn_params = dv["params"]
dtx = optax.adam(1e-3)
dopt = jax.jit(dtx.init)(dcn_params)


@partial(jax.jit, donate_argnums=(0, 1))
def dcn_step(dcn_params, dopt, d0, d1, d2, dact, idx):
    b = preprocess_batch(d0[idx], d1[idx], d2[idx], dact[idx], dact[idx])
    labels = jax.nn.one_hot(b.action[::12], 2)

    def loss_fn(p):
        fl = dcn.apply({"params": p}, b.acoustic)
        logits = clip_logits(fl.astype(jnp.float32), 12)
        return softmax_cross_entropy(labels, logits)

    loss, grads = jax.value_and_grad(loss_fn)(dcn_params)
    upd, dopt = dtx.update(grads, dopt)
    return optax.apply_updates(dcn_params, upd), dopt, loss


for epoch in range(30):
    perm = clip_perm(rng, n_tr)
    for s in range(steps_per_epoch):
        idx = jnp.asarray(perm[s * BATCH:(s + 1) * BATCH])
        dcn_params, dopt, dl = dcn_step(dcn_params, dopt, *dtr, dtr_act, idx)
print(f"dualcamnet trained, final CE {float(jax.device_get(dl)):.4f} "
      f"({time.time()-t_start:.0f}s)", flush=True)


@jax.jit
def dcn_acc(dcn_params, images, act):
    fl = dcn.apply({"params": dcn_params}, images)
    logits = clip_logits(fl.astype(jnp.float32), 12)
    labels = act[::12]
    return jnp.mean((jnp.argmax(logits, 1) == labels).astype(jnp.float32))


b_te = jax.jit(preprocess_batch)(*dte, dte_act, dte_act)
acc_real = float(dcn_acc(dcn_params, b_te.acoustic, dte_act))
acc_gen = float(dcn_acc(dcn_params, recon_test, dte_act))

# trainer_reconstructed_class protocol: train a second DualCamNet ON
# generated images (frozen generator), evaluate on generated test images
recon_train = generate_chunked(params, batch_stats, *dtr, dtr_act, jax.random.key(11))
dcn2_params = jax.jit(lambda: dcn.init({"params": jax.random.key(5)},
                                       jnp.zeros((12, 36, 48, 12))))()["params"]
dopt2 = jax.jit(dtx.init)(dcn2_params)


@partial(jax.jit, donate_argnums=(0, 1))
def dcn2_step(p, opt, images, dact, idx):
    labels = jax.nn.one_hot(dact[idx][::12], 2)

    def loss_fn(p):
        fl = dcn.apply({"params": p}, images[idx])
        logits = clip_logits(fl.astype(jnp.float32), 12)
        return softmax_cross_entropy(labels, logits)

    loss, grads = jax.value_and_grad(loss_fn)(p)
    upd, opt = dtx.update(grads, opt)
    return optax.apply_updates(p, upd), opt, loss


recon_train = jax.device_put(recon_train)
for epoch in range(30):
    perm = clip_perm(rng, n_tr)
    for s in range(steps_per_epoch):
        idx = jnp.asarray(perm[s * BATCH:(s + 1) * BATCH])
        dcn2_params, dopt2, dl2 = dcn2_step(dcn2_params, dopt2, recon_train, dtr_act, idx)
acc_gen_trained = float(dcn_acc(dcn2_params, recon_test, dte_act))

# ------------------------------------------------- Flickr box localization
# (showimages_bb protocol): the synthetic Flickr shards annotate a box
# around a real marker; the trained generator's energy should fall inside
from types import SimpleNamespace

from acoustic_image_generation_tpu.data.synthetic import write_flickr_dataset
from acoustic_image_generation_tpu.evaluation.localize_boxes import run_box_iou_sweep

fl_dir = "/tmp/aig_study_flickr"
if not os.path.exists(fl_dir):
    write_flickr_dataset(fl_dir, num_videos=4, seconds_per_video=4, seed=3)
floader = AcousticImageDataLoader(
    os.path.join(fl_dir, "lists/flickr_testing.txt"), "testing", 8,
    include_boxes=True,
)


class _TaskAdapter:
    def _forward(self, p, bs, b, rngs, train):
        feat = resnet.apply({"params": p["resnet"], "batch_stats": bs},
                            b.video, train=False)
        out = gen.apply({"params": p["generator"]}, tile_mfccmap(b.mfcc), feat,
                        rngs={"latent": rngs["latent"]})
        return out, bs


box = run_box_iou_sweep(
    _TaskAdapter(), SimpleNamespace(params=params, batch_stats=batch_stats), floader
)
print(f"box AUC {box['auc']:.4f} ({time.time()-t_start:.0f}s)", flush=True)
print(json.dumps({
    "untrained": {"test_mse": float(mse0), "auc": round(auc0, 4)},
    "trained": {"test_mse": float(mse1), "auc": round(auc1, 4)},
    "iou_fractions_trained": {str(k): round(v, 3) for k, v in fr1.items()},
    "dualcamnet_acc_real": round(acc_real, 4),
    "dualcamnet_acc_generated": round(acc_gen, 4),
    "dualcamnet_trained_on_generated_acc": round(acc_gen_trained, 4),
    "flickr_box_auc": round(box["auc"], 4),
    "flickr_box_iou_ge_05": round(float(np.mean(box["iou"] >= 0.5)), 4),
    "train_clips": int(len(tr_act)), "test_clips": int(len(te_act)),
    "epochs": EPOCHS, "wall_s": round(time.time() - t_start, 1),
}, indent=1), flush=True)
