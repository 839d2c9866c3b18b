"""Sound-source localization metrics: energy-mask IoU, threshold sweep, AUC.

The reference evaluates localization by running
``iouenergythreshold.py`` ELEVEN times (once per threshold 0.0..1.0,
``scripts/test.bash:46-66``), each pass re-running the generator and doing
per-image host NumPy (``:213-236``). Here the generator runs once, the
IoU per image is one batched device op, and all thresholds are read off the
same IoU vector — an ~22x reduction in generator work for the same
numbers. The AUC step (``areaundercurve.py:26-38``, sklearn trapezoid) is
``localization_auc``.

Flickr-SoundNet weighted-box IoU ports ``showimages_bb.py:286-321``:
up to 3 boxes rendered at weight 0.5 each (clipped at 1), energy mask
upscaled to 224x298 (bilinear, > 0.5), intersection weighted by the box
map, union corrected by the sub-1 box weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.dsp.energy import find_logen

DEFAULT_THRESHOLDS = np.round(np.arange(0.0, 1.01, 0.1), 1)


def energy_mask(acoustic: jnp.ndarray, *, invert: bool = False) -> jnp.ndarray:
    """(N,36,48,12) acoustic/MFCC image -> boolean (N,36,48) mask of
    above-mean energy (``iouenergythreshold.py:186-190``).

    ``invert=True`` selects the BELOW-mean region instead: real dualcam
    acoustic images hold MFCC coefficients, for which ``find_logen``'s
    ``1/sum(exp(..))`` inversion peaks AT the source (the reference
    convention, default); the synthetic benchmark stores blob energy
    directly as channel amplitude, which that inversion anti-correlates
    (measured: argmin of find_logen == the blob pixel), so
    source-region masks on synthetic data are the below-mean set.
    Real-vs-generated IoU is invariant to the choice (both sides invert
    identically — complements agree iff the blobs agree); only
    video-space consumers (the Flickr box sweep) need the flag."""
    emap = find_logen(acoustic)
    mean = jnp.mean(emap, axis=(-2, -1), keepdims=True)
    return emap < mean if invert else emap > mean


def iou_real_vs_generated(real: jnp.ndarray, generated: jnp.ndarray) -> jnp.ndarray:
    """Per-image IoU of the above-mean energy masks, (N,)."""
    m1 = energy_mask(real)
    m2 = energy_mask(generated)
    inter = jnp.sum(m1 & m2, axis=(-2, -1)).astype(jnp.float32)
    union = jnp.sum(m1 | m2, axis=(-2, -1)).astype(jnp.float32)
    return inter / union


def threshold_fractions(ious: np.ndarray, thresholds=DEFAULT_THRESHOLDS) -> dict[float, float]:
    """fraction of images with IoU strictly above each threshold
    (``iou_score > threshold``, :229-230) — the 11 per-threshold numbers the
    reference writes to ``intersection_{t}_accuracy.txt``."""
    ious = np.asarray(ious)
    return {float(t): float(np.mean(ious > t)) for t in thresholds}


def localization_auc(fractions: dict[float, float]) -> float:
    """Trapezoidal area under the (threshold, fraction) curve —
    ``areaundercurve.py:26-38`` (sklearn.metrics.auc is the trapezoid
    rule)."""
    ts = sorted(fractions)
    xs = np.asarray(ts, dtype=np.float64)
    ys = np.asarray([fractions[t] for t in ts], dtype=np.float64)
    return float(np.trapezoid(ys, xs))


def render_box_map(
    xmin: jnp.ndarray, xmax: jnp.ndarray, ymin: jnp.ndarray, ymax: jnp.ndarray,
    height: int = 224, width: int = 298,
) -> jnp.ndarray:
    """(N,3) box coords -> (N,224,298) weighted map: each valid box filled
    at 0.5, summed, clipped at 1 (``showimages_bb.py:288-296``). Boxes with
    ``xmax == 0`` are absent. cv2.rectangle with thickness -1 fills the
    closed interval [min, max]."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)

    def one(xmn, xmx, ymn, ymx):
        inside = (
            (xs >= xmn[:, None, None]) & (xs <= xmx[:, None, None])
            & (ys >= ymn[:, None, None]) & (ys <= ymx[:, None, None])
        )
        valid = (xmx != 0)[:, None, None]
        return jnp.sum(jnp.where(inside & valid, 0.5, 0.0), axis=0)

    maps = jax.vmap(one)(xmin, xmax, ymin, ymax)
    return jnp.minimum(maps, 1.0)


def box_weighted_iou(
    generated: jnp.ndarray, box_map: jnp.ndarray, *, invert: bool = False
) -> jnp.ndarray:
    """Per-image weighted IoU of the generated energy mask vs annotated
    boxes (``showimages_bb.py:297-320``). ``box_map``: (N,224,298) in
    {0, .5, 1}. ``invert`` selects the synthetic-benchmark energy
    convention (see :func:`energy_mask`)."""
    mask = energy_mask(generated, invert=invert).astype(jnp.float32)  # (N,36,48)
    n = mask.shape[0]
    big = jax.image.resize(mask, (n, 224, 298), method="bilinear")
    m2 = (big > 0.5).astype(jnp.float32)
    inter = ((box_map > 0) & (m2 > 0)).astype(jnp.float32) * box_map
    union = ((box_map > 0) | (m2 > 0)).astype(jnp.float32)
    box_present = (box_map > 0).astype(jnp.float32)
    union_weighted = union + (box_map - box_present)
    return jnp.sum(inter, axis=(-2, -1)) / jnp.sum(union_weighted, axis=(-2, -1))


def write_threshold_files(run_dir: str, fractions: dict[float, float]) -> None:
    """Emit the reference's per-threshold artifact files
    (``intersection_{t}_accuracy.txt``) so downstream bash/aggregation
    tooling keeps working."""
    import os

    os.makedirs(run_dir, exist_ok=True)
    for t, frac in fractions.items():
        with open(os.path.join(run_dir, f"intersection_{t}_accuracy.txt"), "w") as f:
            f.write(f"iou {frac:6f}")
    with open(os.path.join(run_dir, "area.txt"), "w") as f:
        f.write(f"{localization_auc(fractions):6f}")
