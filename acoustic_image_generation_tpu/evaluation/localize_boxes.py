"""Flickr-SoundNet box-localization evaluation
(``/root/reference/showimages_bb.py:140-328``): run the generator over a
box-annotated loader, render the weighted box maps, compute the weighted
IoU per image, sweep thresholds and write the same artifact files as the
energy-IoU path."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.data import preprocess
from acoustic_image_generation_tpu.evaluation import iou as iou_mod
from acoustic_image_generation_tpu.evaluation.iou import box_weighted_iou, render_box_map


def run_box_iou_sweep(
    task, state, loader, run_dir: str | None = None, *, seed: int = 0,
    invert: bool = False,
):
    """``task`` is a GenerationTask-like object; ``loader`` must yield
    RawBatches with box extras (``include_boxes=True``). ``invert``
    selects the synthetic-benchmark energy convention (blob stored as
    channel amplitude -> source region is find_logen's BELOW-mean set;
    see ``evaluation.iou.energy_mask``); real dualcam/Flickr data keeps
    the reference's above-mean default."""

    @jax.jit
    def step(params, batch_stats, raw, boxes, key):
        f = raw["acoustic"].shape[1]
        flat = lambda x: x.reshape(-1, *x.shape[2:])
        batch = preprocess.preprocess_batch(
            flat(raw["acoustic"]), flat(raw["audio"]), flat(raw["video"]),
            jnp.repeat(raw["action"], f), jnp.repeat(raw["location"], f),
        )
        out, _ = task._forward(params, batch_stats, batch, {"latent": key}, train=False)
        box_map = render_box_map(
            flat(boxes["xmin"]), flat(boxes["xmax"]),
            flat(boxes["ymin"]), flat(boxes["ymax"]),
        )
        return box_weighted_iou(out.output, box_map, invert=invert)

    ious = []
    for i, raw_batch in enumerate(loader.batches(0)):
        assert raw_batch.extras is not None, "loader must set include_boxes=True"
        raw = {
            "acoustic": raw_batch.acoustic,
            "audio": raw_batch.audio,
            "video": raw_batch.video,
            "action": raw_batch.action,
            "location": raw_batch.location,
        }
        boxes = {k: raw_batch.extras[k] for k in ("xmin", "xmax", "ymin", "ymax")}
        key = jax.random.fold_in(jax.random.key(seed), i)
        vec = np.asarray(
            jax.device_get(step(state.params, state.batch_stats, raw, boxes, key))
        )
        f = raw_batch.acoustic.shape[1]
        ious.append(vec[: raw_batch.valid * f])
    ious = np.concatenate(ious) if ious else np.zeros((0,))
    fractions = iou_mod.threshold_fractions(ious)
    auc = iou_mod.localization_auc(fractions)
    if run_dir is not None:
        iou_mod.write_threshold_files(run_dir, fractions)
    return {"iou": ious, "fractions": fractions, "auc": auc}
