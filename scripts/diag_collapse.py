"""Watch the dead-sigmoid collapse happen, epoch by epoch (real TPU).

diag_plateau.py established that the "render-from-latent plateau"
(docs/RESULTS.md) is the all-zeros predictor: test MSE 0.016379 ==
E[target^2] exactly, recon bit-zero, pre-sigmoid logits below the bf16
sigmoid underflow (~-88) so the gradient through the final sigmoid is
EXACTLY zero and training is irreversibly dead. This script traces WHEN
and HOW the output dies and whether the reference's own compute dtype
(TF1 trains float32) avoids it:

for each (dtype, seed): train epoch-by-epoch, after each epoch probe a
fixed test chunk for min/mean/max pre-sigmoid logit (captured from the
`final` conv, not inverted through the clip), fraction of exactly-zero
outputs, and test MSE.

Usage: python scripts/diag_collapse.py [epochs] [runs]
  runs: comma list like bf16:0,bf16:1,f32:0 (default bf16:0,f32:0)
"""
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

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 60
RUNS = (sys.argv[2] if len(sys.argv) > 2 else "bf16:0,f32:0").split(",")
t0 = time.time()

lists = lib.build_dataset()
dtr, dtr_act = lib.device_split(lib.load_split(lists["training"], "training"))
dte, dte_act = lib.device_split(lib.load_split(lists["testing"], "testing"))

for spec in RUNS:
    parts = spec.split(":")
    dt_name, seed_s = parts[0], parts[1]
    recon = parts[2] if len(parts) > 2 else "mse"
    seed = int(seed_s)
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dt_name]
    flag = lib.Flagship(dtype=dtype, recon=recon)
    resnet, gen = flag.resnet, flag.gen

    @jax.jit
    def probe(params, batch_stats, ac, au, vi, act, key):
        b = preprocess_batch(ac, au, vi, act, act)
        feat = resnet.apply(
            {"params": params["resnet"], "batch_stats": batch_stats},
            b.video, train=False,
        )
        out, inter = gen.apply(
            {"params": params["generator"]}, tile_mfccmap(b.mfcc), feat,
            rngs={"latent": key},
            capture_intermediates=lambda mdl, _m: mdl.name == "final",
        )
        logits = inter["intermediates"]["final"]["__call__"][0]
        logits = logits.astype(jnp.float32)
        y = out.output.astype(jnp.float32)
        mse = jnp.mean(jnp.square(b.acoustic - y))
        # weight-scale proxies for where the explosion grows (activation
        # capture chokes the remote compiler)
        g = params["generator"]
        mags = {
            name: jnp.max(jnp.abs(leaf))
            for name, leaf in (
                ("dense_k", g["dense"]["kernel"]),
                ("final_k", g["final"]["kernel"]),
                ("final_b", g["final"]["bias"]),
            )
        }
        return (jnp.min(logits), jnp.mean(logits), jnp.max(logits),
                jnp.mean((y == 0.0).astype(jnp.float32)), mse, mags)

    params, batch_stats, opt_state = flag.init(seed)
    sl = slice(0, min(lib.CHUNK, dte[0].shape[0]))
    print(f"== {dt_name} seed {seed} recon={recon} ==", flush=True)
    dead_at = None
    for epoch in range(EPOCHS):
        params, batch_stats, opt_state, _ = flag.train_epochs(
            params, batch_stats, opt_state, dtr, dtr_act, seed=seed,
            epochs=1, start_epoch=epoch,
        )
        lo, mid, hi, frac0, mse, mags = jax.device_get(probe(
            params, batch_stats, dte[0][sl], dte[1][sl], dte[2][sl],
            dte_act[sl], jax.random.key(9)))
        lo, mid, hi, frac0, mse = (float(x) for x in (lo, mid, hi, frac0, mse))
        if epoch < 10 or epoch % 5 == 4 or (frac0 > 0.99 and dead_at is None):
            mg = " ".join(f"{k}:{float(v):.1f}" for k, v in mags.items())
            print(f"  ep {epoch:3d}: logit [{lo:9.2f} {mid:9.2f} {hi:9.2f}] "
                  f"frac0 {frac0:.3f}  mse {mse:.6f}  {mg}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if frac0 > 0.999 and dead_at is None:
            dead_at = epoch
    print(f"== {dt_name} seed {seed} recon={recon}: dead_at={dead_at} "
          f"final mse {mse:.6f}", flush=True)
print(f"done {time.time()-t0:.0f}s", flush=True)
