"""Reproducible converged-regime protocol for the flagship (real TPU).

The micro-scale synthetic benchmark has a documented optimization cliff
(docs/RESULTS.md "render-from-latent plateau"): most seeds plateau at
test MSE ~0.0164 where generated images carry no class information; a
minority escape to the converged regime (~0.008, AUC >= 0.9,
classify-generated ~1.0). The escape is seed-stochastic, so the
reference's own reporting protocol — N independent seeds, best
validation gate (``/root/reference/scripts/test.bash:5``,
``trainer/trainer.py:301-313``) — is the reproducible recipe:

- **screen**: train ``AIG_PROTO_SEEDS`` seeds for ``AIG_PROTO_EPOCHS``
  epochs each, tracking held-out MSE; results append to a JSONL so a
  killed run resumes where it stopped (the tunneled chip can wedge).
- **finish**: deterministically retrain the best seed (same seed ->
  same trajectory) for ``AIG_PROTO_FINISH_EPOCHS``, then run the full
  capability chain: reconstruction MSE, IoU/AUC localization,
  DualCamNet real/generated accuracy and the train-on-generated
  protocol (``saveimagesresnet.py:68-120``,
  ``trainer_reconstructed_class.py:41-61``).

Usage:  python scripts/study_protocol.py [screen|finish|all]
Artifacts: /tmp/aig_protocol/screen.jsonl, final.json (AIG_PROTO_DIR).
"""
import os

import _bootstrap  # noqa: F401
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

assert jax.devices()[0].platform != "cpu"

import _study_lib as lib

OUT = os.environ.get("AIG_PROTO_DIR", "/tmp/aig_protocol")
N_SEEDS = int(os.environ.get("AIG_PROTO_SEEDS", "12"))
EPOCHS = int(os.environ.get("AIG_PROTO_EPOCHS", "300"))
FINISH_EPOCHS = int(os.environ.get("AIG_PROTO_FINISH_EPOCHS", "600"))
EVAL_EVERY = int(os.environ.get("AIG_PROTO_EVAL_EVERY", "25"))
# test MSE below this = escaped the plateau (plateau sits at 0.0164,
# converged at ~0.008: the gap is wide and bimodal)
ESCAPE_MSE = float(os.environ.get("AIG_PROTO_ESCAPE_MSE", "0.013"))
VIDEOS = int(os.environ.get("AIG_STUDY_VIDEOS", "8"))
# CLEARLY-FLAGGED DEVIATIONS (off by default) — see _study_lib.Flagship:
# AIG_PROTO_BLOB_WEIGHT: energy-weighted recon loss.
# AIG_PROTO_RECON=bce: sigmoid cross-entropy recon term in logit space,
#   the repair for the dead-sigmoid collapse diag_collapse.py traces
#   (reference MSE+Huber gradients vanish exactly once Adam saturates
#   the background logits; BCE self-corrects). Screen results land in
#   deviation-suffixed jsonl files and final.json records the deviation.
BLOB_WEIGHT = float(os.environ.get("AIG_PROTO_BLOB_WEIGHT", "0"))
RECON = os.environ.get("AIG_PROTO_RECON", "mse")
_SCREEN = "screen"
if BLOB_WEIGHT:
    _SCREEN += f"_w{BLOB_WEIGHT:g}"
if RECON != "mse":
    _SCREEN += f"_{RECON}"
_SCREEN += ".jsonl"

os.makedirs(OUT, exist_ok=True)
t0 = time.time()

lists = lib.build_dataset(VIDEOS)
dtr, dtr_act = lib.device_split(lib.load_split(lists["training"], "training"))
dte, dte_act = lib.device_split(lib.load_split(lists["testing"], "testing"))
print(f"data on device: {dtr[0].shape[0]} train / {dte[0].shape[0]} test "
      f"frames ({time.time()-t0:.0f}s)", flush=True)

flag = lib.Flagship(blob_weight=BLOB_WEIGHT, recon=RECON)


def screen():
    path = os.path.join(OUT, _SCREEN)
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                done[r["seed"]] = r
    for seed in range(N_SEEDS):
        if seed in done:
            continue
        params, batch_stats, opt_state = flag.init(seed)
        trace = []

        def on_eval(epoch, train_mse, test_mse, trace=trace):
            trace.append((epoch, round(train_mse, 6), round(test_mse, 6)))
            print(f"  seed {seed} epoch {epoch}: train {train_mse:.5f} "
                  f"test {test_mse:.5f} ({time.time()-t0:.0f}s)", flush=True)
            return test_mse < ESCAPE_MSE  # early exit: escaped

        params, batch_stats, opt_state, _ = flag.train_epochs(
            params, batch_stats, opt_state, dtr, dtr_act, seed=seed,
            epochs=EPOCHS, eval_every=EVAL_EVERY, dte=dte, dte_act=dte_act,
            on_eval=on_eval,
        )
        tm, ious, _ = flag.test_metrics_chunked(
            params, batch_stats, dte, dte_act, jax.random.key(9)
        )
        _, auc = lib.localization_summary(ious)
        rec = {
            "seed": seed, "test_mse": round(float(tm), 6),
            "auc": round(auc, 4), "escaped": bool(tm < ESCAPE_MSE),
            "epochs": trace[-1][0] + 1 if trace else EPOCHS,
            "trace": trace, "wall_s": round(time.time() - t0, 1),
        }
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"seed {seed}: test MSE {rec['test_mse']} "
              f"escaped={rec['escaped']}", flush=True)
    with open(path) as f:
        return [json.loads(line) for line in f]


def finish(results):
    """Retrain the best-validation seed to convergence and run the full
    capability chain (study_synthetic's evaluation suite).

    AIG_PROTO_FINISH_LR (optional): run the finish phase at a lower Adam
    LR than the 1e-3 screen — Adam's scale-free step size makes the
    late-phase trajectory wander at 1e-3 on this micro-benchmark
    (diag_collapse.py), and the reference's own recipes pick LR per
    phase via flags (main.py learning_rate)."""
    best = min(results, key=lambda r: r["test_mse"])
    seed = best["seed"]
    finish_lr = os.environ.get("AIG_PROTO_FINISH_LR")
    fin = flag
    if finish_lr:
        fin = lib.Flagship(lr=float(finish_lr), blob_weight=BLOB_WEIGHT,
                           recon=RECON)
    print(f"best seed {seed} (screen test MSE {best['test_mse']}); "
          f"retraining {FINISH_EPOCHS} epochs"
          + (f" at lr {finish_lr}" if finish_lr else ""), flush=True)
    params, batch_stats, opt_state = fin.init(seed)

    # Best-validation gate, exactly the reference's reporting protocol
    # (``/root/reference/trainer/trainer.py:301-313`` checkpoints at the
    # best validation metric and ``test.bash`` evaluates THAT model, not
    # the last epoch): snapshot params at the best held-out MSE seen,
    # run the capability chain on the snapshot. At the 96-train-clip
    # micro-scale the last epoch overfits hard (train 3e-4 / test 1.3e-2
    # observed), so the gate is load-bearing, not cosmetic.
    best_snap = {"mse": float("inf"), "params": None, "stats": None,
                 "epoch": -1}
    stop_at = [None]

    def on_eval(epoch, train_mse, test_mse):
        print(f"  finish epoch {epoch}: train {train_mse:.5f} "
              f"test {test_mse:.5f} ({time.time()-t0:.0f}s)", flush=True)
        if test_mse < best_snap["mse"]:
            best_snap.update(
                mse=test_mse, epoch=epoch,
                params=jax.tree.map(lambda x: x.copy(), _cur[0]),
                stats=jax.tree.map(lambda x: x.copy(), _cur[1]),
            )
        if test_mse < 0.009:
            stop_at[0] = epoch
        return stop_at[0] is not None and epoch >= stop_at[0] + 50

    # train_epochs calls on_eval before returning updated params, so
    # track the live (params, batch_stats) via a mutable closure the
    # epoch loop refreshes
    _cur = [params, batch_stats]

    ep_per_round = int(os.environ.get("AIG_PROTO_FINISH_EVAL_EVERY",
                                      str(min(EVAL_EVERY, 10))))
    done_epochs = 0
    stop = False
    shuffle_rng = np.random.default_rng(seed)  # continuous across chunks
    while done_epochs < FINISH_EPOCHS and not stop:
        n = min(ep_per_round, FINISH_EPOCHS - done_epochs)
        params, batch_stats, opt_state, mse = fin.train_epochs(
            params, batch_stats, opt_state, dtr, dtr_act, seed=seed,
            epochs=n, start_epoch=done_epochs, rng=shuffle_rng,
        )
        done_epochs += n
        _cur[0], _cur[1] = params, batch_stats
        tm_e, _, _ = fin.test_metrics_chunked(
            params, batch_stats, dte, dte_act, jax.random.key(9)
        )
        stop = on_eval(done_epochs - 1, float(jax.device_get(mse)), tm_e)

    if best_snap["params"] is not None:
        params, batch_stats = best_snap["params"], best_snap["stats"]
        print(f"best-val snapshot: epoch {best_snap['epoch']} "
              f"test MSE {best_snap['mse']:.6f}", flush=True)

    tm, ious, recon_test = fin.test_metrics_chunked(
        params, batch_stats, dte, dte_act, jax.random.key(9)
    )
    fr, auc = lib.localization_summary(ious)

    # ---- capability chain: DualCamNet protocols --------------------------
    import optax
    from functools import partial

    from acoustic_image_generation_tpu.data.preprocess import preprocess_batch
    from acoustic_image_generation_tpu.losses import softmax_cross_entropy
    from acoustic_image_generation_tpu.models import DualCamNet
    from acoustic_image_generation_tpu.models.dualcamnet import clip_logits

    dcn = DualCamNet(num_classes=2, num_frames=12, dtype=jnp.bfloat16)
    dtx = optax.adam(1e-3)
    n_tr = dtr[0].shape[0]
    steps_per_epoch = n_tr // lib.BATCH
    rng = np.random.default_rng(seed)

    @partial(jax.jit, donate_argnums=(0, 1))
    def dcn_step(p, opt, images, dact, idx):
        labels = jax.nn.one_hot(dact[idx][::12], 2)

        def loss_fn(p):
            fl = dcn.apply({"params": p}, images[idx])
            logits = clip_logits(fl.astype(jnp.float32), 12)
            return softmax_cross_entropy(labels, logits)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, opt = dtx.update(grads, opt)
        return optax.apply_updates(p, upd), opt, loss

    @jax.jit
    def dcn_acc(p, images, act):
        fl = dcn.apply({"params": p}, images)
        logits = clip_logits(fl.astype(jnp.float32), 12)
        return jnp.mean((jnp.argmax(logits, 1) == act[::12]).astype(jnp.float32))

    def train_dcn(images, init_seed):
        p = jax.jit(lambda: dcn.init({"params": jax.random.key(init_seed)},
                                     jnp.zeros((12, 36, 48, 12))))()["params"]
        opt = jax.jit(dtx.init)(p)
        for _ in range(30):
            perm = lib.clip_perm(rng, n_tr)
            for s in range(steps_per_epoch):
                idx = jnp.asarray(perm[s * lib.BATCH:(s + 1) * lib.BATCH])
                p, opt, _ = dcn_step(p, opt, images, dtr_act, idx)
        return p

    b_tr = jax.jit(preprocess_batch)(*dtr, dtr_act, dtr_act)
    real_train = b_tr.acoustic
    dcn_real = train_dcn(real_train, 3)
    b_te = jax.jit(preprocess_batch)(*dte, dte_act, dte_act)
    acc_real = float(dcn_acc(dcn_real, b_te.acoustic, dte_act))
    acc_gen = float(dcn_acc(dcn_real, jax.device_put(recon_test), dte_act))

    recon_train = fin.generate_chunked(
        params, batch_stats, dtr, dtr_act, jax.random.key(11)
    )
    dcn_gen = train_dcn(jax.device_put(recon_train), 5)
    acc_gen_trained = float(dcn_acc(dcn_gen, jax.device_put(recon_test), dte_act))

    final = {
        "protocol": {
            "blob_weight_deviation": BLOB_WEIGHT,
            "recon_deviation": RECON,
            "seeds_screened": len(results),
            "escaped_seeds": [r["seed"] for r in results if r["escaped"]],
            "best_seed": seed,
            "screen_epochs": EPOCHS,
            "finish_epochs": FINISH_EPOCHS,
            "best_val_epoch": best_snap["epoch"],
        },
        "test_mse": round(float(tm), 6),
        "auc": round(auc, 4),
        "iou_fractions": {str(k): round(v, 3) for k, v in fr.items()},
        "dualcamnet_acc_real": round(acc_real, 4),
        "dualcamnet_acc_generated": round(acc_gen, 4),
        "dualcamnet_trained_on_generated_acc": round(acc_gen_trained, 4),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(OUT, "final.json"), "w") as f:
        json.dump(final, f, indent=1)
    print(json.dumps(final, indent=1), flush=True)
    return final


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase in ("screen", "all"):
        results = screen()
    else:
        with open(os.path.join(OUT, _SCREEN)) as f:
            results = [json.loads(line) for line in f]
    if phase in ("finish", "all"):
        finish(results)
