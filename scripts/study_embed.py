"""Embedding study on the REAL TPU: train the 3-VAE triplet recipe
(trainer_three) on the synthetic benchmark, export per-modality latents,
and run the kNN + cross-modal retrieval evaluations."""
import os

import _bootstrap  # noqa: F401  (repo root onto sys.path)
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

assert jax.devices()[0].platform != "cpu"

# multi-seed protocol knobs (the reference runs every config 5x and
# trims min/max in meanstd.py; scripts/sweep_embed drives this)
SEED = int(os.environ.get("AIG_EMBED_SEED", "0"))
EPOCHS = int(os.environ.get("AIG_EMBED_EPOCHS", "120"))

from acoustic_image_generation_tpu.core.config import (
    DataConfig, ExperimentConfig, ModelConfig, OptimConfig, ParallelConfig, RunConfig,
)
from acoustic_image_generation_tpu.data.pipeline import AcousticImageDataLoader
from acoustic_image_generation_tpu.data.preprocess import preprocess_batch
from acoustic_image_generation_tpu.evaluation.knn import knn_accuracy
from acoustic_image_generation_tpu.evaluation.retrieve import retrieval_ranks
from acoustic_image_generation_tpu.train.embed import EmbedTask

t0 = time.time()
tmp = "/tmp/aig_study_ds"  # reuse the generation study's dataset
lists = {s: os.path.join(tmp, f"lists/{s}_study.txt") for s in ("training", "testing")}
assert os.path.exists(lists["training"]), "run scripts/study_synthetic.py first"

# spectrogram z-norm stats over the training split (the reference's
# stats2s artifacts, outdoor_data_mfcc.py:119-159)
from acoustic_image_generation_tpu.data.stats import (
    compute_spectrogram_stats, save_stats,
)

stats_dir = os.path.join(os.path.dirname(lists["training"]), "stats2s")
if not os.path.exists(os.path.join(stats_dir, "global_mean_prod_2s.npy")):
    stat_loader = AcousticImageDataLoader(lists["training"], "training", 8)
    mean, std = compute_spectrogram_stats(stat_loader)
    save_stats(stats_dir, mean, std)
    print(f"stats2s written ({time.time()-t0:.0f}s)", flush=True)


def load_all(list_path, mode):
    loader = AcousticImageDataLoader(list_path, mode, 8)
    ac, au, vi, act = [], [], [], []
    for raw in loader.batches(0):
        n = raw.valid
        ac.append(raw.acoustic[:n]); au.append(raw.audio[:n])
        vi.append(raw.video[:n]); act.append(raw.action[:n])
    return (np.concatenate(ac), np.concatenate(au), np.concatenate(vi),
            np.concatenate(act))


tr = load_all(lists["training"], "training")
te = load_all(lists["testing"], "testing")
flat = lambda x: x.reshape(-1, *x.shape[2:])
dtr = [jax.device_put(flat(x)) for x in tr[:3]] + [jax.device_put(np.repeat(tr[3], 12))]
dte = [jax.device_put(flat(x)) for x in te[:3]] + [jax.device_put(np.repeat(te[3], 12))]
n_tr = dtr[0].shape[0]
print(f"{n_tr//12} train / {dte[0].shape[0]//12} test clips ({time.time()-t0:.0f}s)",
      flush=True)

# AIG_EMBED_RECON=bce: the flagged logit-space CE deviation
# (OptimConfig.bce) — repairs the dead-sigmoid collapse of the VIDEO
# VAE on the synthetic benchmark's near-black frames (docs/RESULTS.md);
# default = reference MSE+Huber loss
BCE = os.environ.get("AIG_EMBED_RECON", "mse") == "bce"
cfg = ExperimentConfig(
    data=DataConfig(batch_size=16, sample_length=1,
                    train_file=lists["training"],
                    normalize_spectrogram=True),
    model=ModelConfig(embedding=True),  # triplet variant
    optim=OptimConfig(learning_rate=1e-4, num_epochs=1, bce=BCE),
    run=RunConfig(exp_name="embed_study", checkpoint_dir="/tmp/aig_embed_ck", seed=SEED),
    parallel=ParallelConfig(compute_dtype="bfloat16"),
)
task = EmbedTask(cfg)

BATCH = 16 * 12


@jax.jit
def make_batch(d0, d1, d2, dact, idx):
    return preprocess_batch(d0[idx], d1[idx], d2[idx], dact[idx], dact[idx])


init_batch = make_batch(*dtr, jnp.arange(BATCH))
params, batch_stats = jax.jit(task.init_variables)(jax.random.key(SEED), init_batch)
tx = optax.adam(1e-4)
opt = jax.jit(tx.init)(params)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def step(params, batch_stats, opt, d0, d1, d2, dact, idx, key):
    b = preprocess_batch(d0[idx], d1[idx], d2[idx], dact[idx], dact[idx])
    rngs = {"latent": key, "moddrop": key, "dropout": key}

    def loss_fn(p):
        loss, metrics, new_stats = task.loss(p, batch_stats, b, rngs, train=True)
        return loss, (metrics, new_stats)

    (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    upd, opt = tx.update(grads, opt)
    return optax.apply_updates(params, upd), new_stats, opt, metrics


rng = np.random.default_rng(SEED)


def clip_perm(n_frames):
    clips = rng.permutation(n_frames // 12)
    return (clips[:, None] * 12 + np.arange(12)[None, :]).reshape(-1)


steps_per_epoch = n_tr // BATCH
for epoch in range(EPOCHS):
    perm = clip_perm(n_tr)
    for s in range(steps_per_epoch):
        idx = jnp.asarray(perm[s * BATCH:(s + 1) * BATCH])
        params, batch_stats, opt, metrics = step(
            params, batch_stats, opt, *dtr, idx, jax.random.key(SEED * 1_000_000 + epoch * 100 + s)
        )
    if epoch % 20 == 19 or epoch == 0:
        m = {k: round(float(v), 4) for k, v in jax.device_get(metrics).items()}
        print(f"epoch {epoch}: {m} ({time.time()-t0:.0f}s)", flush=True)


@jax.jit
def embed(params, batch_stats, d0, d1, d2, dact, key):
    b = preprocess_batch(d0, d1, d2, dact, dact)
    return task.embeddings(params, batch_stats, b, key)


z_tr = jax.device_get(embed(params, batch_stats, *dtr, jax.random.key(1)))
z_te = jax.device_get(embed(params, batch_stats, *dte, jax.random.key(2)))
y_tr, y_te = tr[3], te[3]  # per-clip labels

results = {"knn15": {}, "retrieval_rank1": {}}
for mod in ("acoustic", "audio", "video"):
    results["knn15"][mod] = round(
        knn_accuracy(z_tr[mod], y_tr, z_te[mod], y_te, k=15), 4
    )
for a, g in (("video", "acoustic"), ("audio", "acoustic"), ("video", "audio")):
    r = retrieval_ranks(z_te[a], y_te, z_te[g], y_te, num_classes=2)
    results["retrieval_rank1"][f"{a}->{g}"] = round(r["rank1"], 4)
results["epochs"] = EPOCHS
results["seed"] = SEED
results["wall_s"] = round(time.time() - t0, 1)
print(json.dumps(results, indent=1), flush=True)
out = os.environ.get("AIG_EMBED_OUT")
if out:
    out_dir = os.path.dirname(out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f)
