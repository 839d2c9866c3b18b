"""Localization evaluation runner: one pass over the test set -> IoU vector
-> all-threshold fractions + AUC + artifact files.

Replaces the reference's 11-run protocol (``scripts/test.bash:46-66``
invoking ``iouenergythreshold.py`` per threshold, then
``areaundercurve.py``) with a single jitted sweep (see
``evaluation.iou``)."""

from __future__ import annotations

import jax
import numpy as np

from acoustic_image_generation_tpu.evaluation import iou as iou_mod


def run_iou_sweep(task, state, loader, run_dir: str | None = None, *, seed: int = 0):
    """Evaluate real-vs-generated localization IoU over a loader.

    ``task`` must expose ``_forward(params, batch_stats, batch, rngs,
    train=False)`` returning a VaeOutput (GenerationTask does). Returns
    {"iou": per-image vector, "fractions": {t: frac}, "auc": float}.
    """
    import jax.numpy as jnp

    from acoustic_image_generation_tpu.data import preprocess

    @jax.jit
    def step(params, batch_stats, raw, key):
        f = raw["acoustic"].shape[1]
        flat = lambda x: x.reshape(-1, *x.shape[2:])
        batch = preprocess.preprocess_batch(
            flat(raw["acoustic"]), flat(raw["audio"]), flat(raw["video"]),
            jnp.repeat(raw["action"], f), jnp.repeat(raw["location"], f),
        )
        out, _ = task._forward(params, batch_stats, batch, {"latent": key}, train=False)
        return iou_mod.iou_real_vs_generated(batch.acoustic, out.output)

    ious = []
    for i, raw_batch in enumerate(loader.batches(0)):
        raw = {
            "acoustic": raw_batch.acoustic,
            "audio": raw_batch.audio,
            "video": raw_batch.video,
            "action": raw_batch.action,
            "location": raw_batch.location,
        }
        key = jax.random.fold_in(jax.random.key(seed), i)
        vec = np.asarray(jax.device_get(step(state.params, state.batch_stats, raw, key)))
        f = raw_batch.acoustic.shape[1]
        ious.append(vec[: raw_batch.valid * f])
    ious = np.concatenate(ious) if ious else np.zeros((0,))
    fractions = iou_mod.threshold_fractions(ious)
    auc = iou_mod.localization_auc(fractions)
    if run_dir is not None:
        iou_mod.write_threshold_files(run_dir, fractions)
    return {"iou": ious, "fractions": fractions, "auc": auc}
