"""Qualitative energy-overlay renders (``/root/reference/showimages.py``,
``showvideo.py:201-233``): the binarized above-mean energy map of the real
and generated acoustic images, upscaled and alpha-blended over the grayscale
video frame. Host-side matplotlib; the energy math runs on device via
``evaluation.iou``."""

from __future__ import annotations

import os

import numpy as np


def _upscale_nearest(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = (np.arange(h) * mask.shape[0] // h).clip(max=mask.shape[0] - 1)
    xs = (np.arange(w) * mask.shape[1] // w).clip(max=mask.shape[1] - 1)
    return mask[np.ix_(ys, xs)]


def save_overlay_grid(
    out_path: str,
    video_frame: np.ndarray,  # (224, 298, 3) in [0,1]
    real_mask: np.ndarray,  # (36, 48) bool
    generated_mask: np.ndarray,  # (36, 48) bool
) -> str:
    """2x2 panel like iouenergythreshold.py:154-205: real / generated /
    union / intersection over the grayscale frame."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    gray = video_frame.mean(axis=-1)
    h, w = gray.shape
    panels = {
        "real": _upscale_nearest(real_mask.astype(float), h, w),
        "generated": _upscale_nearest(generated_mask.astype(float), h, w),
        "union": _upscale_nearest(np.logical_or(real_mask, generated_mask).astype(float), h, w),
        "intersect": _upscale_nearest(
            np.logical_and(real_mask, generated_mask).astype(float), h, w
        ),
    }
    fig, axs = plt.subplots(2, 2, figsize=(6, 2.9))
    plt.tight_layout(pad=1.0)
    for ax, (title, overlay) in zip(axs.flat, panels.items()):
        ax.imshow(gray, cmap="gray")
        ax.imshow(overlay, cmap="viridis", alpha=0.7)
        ax.axis("off")
        ax.set_title(title)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def save_overlay_video_frames(
    out_dir: str,
    video_frames: np.ndarray,  # (N, 224, 298, 3) in [0,1]
    masks: np.ndarray,  # (N, 36, 48) bool — generated energy masks
    *,
    prefix: str = "frame",
) -> list[str]:
    """Per-frame overlay renders for a whole clip/video
    (``/root/reference/showvideo.py:201-233``: VGGSound/AVE videos rendered
    frame by frame with the energy mask alpha-blended). Stitch with any
    encoder, e.g. ``ffmpeg -i frame_%05d.png out.mp4``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    h, w = video_frames.shape[1:3]
    for i, (frame, mask) in enumerate(zip(video_frames, masks)):
        fig, ax = plt.subplots(figsize=(w / 100, h / 100), dpi=100)
        ax.imshow(frame.mean(axis=-1), cmap="gray")
        ax.imshow(_upscale_nearest(mask.astype(float), h, w), cmap="jet", alpha=0.5)
        ax.axis("off")
        fig.subplots_adjust(0, 0, 1, 1)
        path = os.path.join(out_dir, f"{prefix}_{i:05d}.png")
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)
    return paths
