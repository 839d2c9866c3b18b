"""Diagnose the render-from-latent plateau (docs/RESULTS.md) on-chip.

Settles ADVICE round-3 finding #3 — is the bit-constant screening test
MSE (0.016379 at every trace point of every seed) an evaluation bug or a
genuinely constant predictor? — and probes WHY the plateau holds:

1. target statistics: a predictor collapsed to the per-pixel mean field
   has test MSE == mean per-pixel variance; compare against 0.016379.
2. input-dependence: per-pixel std of the reconstruction ACROSS test
   frames (0 == input-independent), plus its within-image spatial std.
3. params-dependence: reported test MSE before/after one further train
   epoch, at full float precision (the jsonl rounds to 6 decimals).
4. saturation: pre-sigmoid logit stats of the final conv (|logit| >> 4
   == vanishing sigmoid gradient).
5. latent signal: ||mean|| vs ||std|| of the VAE head on test frames —
   whether the sampled-z position signal is drowned by unit noise.

Usage: python scripts/diag_plateau.py [epochs]   (default 100)
"""
import os
import sys
import time

import _bootstrap  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

assert jax.devices()[0].platform != "cpu"

import _study_lib as lib
from acoustic_image_generation_tpu.data.preprocess import preprocess_batch
from acoustic_image_generation_tpu.models.unet_ac import tile_mfccmap

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
t0 = time.time()

lists = lib.build_dataset()
dtr, dtr_act = lib.device_split(lib.load_split(lists["training"], "training"))
dte, dte_act = lib.device_split(lib.load_split(lists["testing"], "testing"))

# ---- 1. target statistics ------------------------------------------------
b_te = jax.jit(preprocess_batch)(*dte, dte_act, dte_act)
targets = np.asarray(jax.device_get(b_te.acoustic), np.float64)
mean_field = targets.mean(axis=0)  # per-pixel mean over frames
var_about_mean_field = float(np.mean((targets - mean_field) ** 2))
var_about_scalar = float(np.var(targets))
print(f"[1] test targets: {targets.shape}  global mean {targets.mean():.6f}")
print(f"    MSE of per-pixel-mean-field predictor = {var_about_mean_field:.6f}")
print(f"    MSE of global-scalar-mean predictor   = {var_about_scalar:.6f}")
print(f"    observed plateau test MSE             = 0.016379", flush=True)

# ---- train a short plateau run ------------------------------------------
flag = lib.Flagship()
params, batch_stats, opt_state = flag.init(0)
params, batch_stats, opt_state, _ = flag.train_epochs(
    params, batch_stats, opt_state, dtr, dtr_act, seed=0, epochs=EPOCHS
)
print(f"[-] trained seed 0 for {EPOCHS} epochs ({time.time()-t0:.0f}s)",
      flush=True)

tm1, _, recon = flag.test_metrics_chunked(
    params, batch_stats, dte, dte_act, jax.random.key(9)
)
recon = np.asarray(recon, np.float64)

# ---- 2. input-dependence -------------------------------------------------
across = float(recon.std(axis=0).mean())   # per-pixel std across frames
within = float(recon.std(axis=(1, 2)).mean())  # spatial std within a frame
mse_vs_meanfield = float(np.mean((recon - mean_field) ** 2))
print(f"[2] recon across-frame per-pixel std (0 == input-independent): "
      f"{across:.3e}")
print(f"    recon within-frame spatial std: {within:.3e}")
print(f"    recon range [{recon.min():.4f}, {recon.max():.4f}]  "
      f"mean {recon.mean():.6f}")
print(f"    mean |recon - per-pixel-mean-field| MSE: {mse_vs_meanfield:.6f}",
      flush=True)

# ---- 3. params-dependence of the reported metric -------------------------
params, batch_stats, opt_state, _ = flag.train_epochs(
    params, batch_stats, opt_state, dtr, dtr_act, seed=0, epochs=1,
    start_epoch=EPOCHS,
)
tm2, _, _ = flag.test_metrics_chunked(
    params, batch_stats, dte, dte_act, jax.random.key(9)
)
print(f"[3] test MSE epoch {EPOCHS}: {tm1:.9f}")
print(f"    test MSE epoch {EPOCHS+1}: {tm2:.9f}   "
      f"(identical to 9 dp would mean an eval bug; tiny but nonzero drift "
      f"means a near-constant predictor)", flush=True)

# ---- 4/5. saturation + latent signal ------------------------------------
resnet, gen = flag.resnet, flag.gen


@jax.jit
def probe(params, batch_stats, ac, au, vi, act, key):
    b = preprocess_batch(ac, au, vi, act, act)
    feat = resnet.apply(
        {"params": params["resnet"], "batch_stats": batch_stats},
        b.video, train=False,
    )
    out = gen.apply(
        {"params": params["generator"]}, tile_mfccmap(b.mfcc), feat,
        rngs={"latent": key},
    )
    # invert the final sigmoid to recover logits
    y = jnp.clip(out.output.astype(jnp.float32), 1e-7, 1 - 1e-7)
    logit = jnp.log(y) - jnp.log1p(-y)
    return (
        jnp.min(logit), jnp.mean(logit), jnp.max(logit),
        jnp.mean(jnp.abs(logit) > 4.0),
        jnp.sqrt(jnp.mean(jnp.square(out.mean))),
        jnp.sqrt(jnp.mean(jnp.square(out.std))) if out.std is not None
        else jnp.float32(-1.0),
        jnp.sqrt(jnp.mean(jnp.square(out.mean - jnp.mean(out.mean, 0)))),
    )

sl = slice(0, min(lib.CHUNK, dte[0].shape[0]))
lo, mid, hi, frac_sat, m_rms, s_rms, m_spread = (
    float(x) for x in jax.device_get(probe(
        params, batch_stats, dte[0][sl], dte[1][sl], dte[2][sl],
        dte_act[sl], jax.random.key(9),
    ))
)
print(f"[4] output logits: min {lo:.2f}  mean {mid:.2f}  max {hi:.2f}  "
      f"frac |logit|>4 (saturated): {frac_sat:.3f}")
print(f"[5] VAE head: rms(mean) {m_rms:.4f}  rms(std) {s_rms:.4f}  "
      f"rms per-frame spread of mean {m_spread:.4f}")
print(f"    (spread << std == sampled z carries position at SNR<1)")
print(f"done {time.time()-t0:.0f}s", flush=True)
