"""Qualitative channel-grid plots (``/root/reference/decodeimages*.py``):
render the 12 MFCC channels of a real and reconstructed acoustic image side
by side, plus the inverse energy maps — the per-variant diagnostic plots of
the reference's decodeimages / decodeimagesacresnet / decodeimagesshow
family collapsed into one function."""

from __future__ import annotations

import os

import numpy as np

from acoustic_image_generation_tpu.dsp.energy import find_logen


def save_channel_grid(
    out_path: str,
    real: np.ndarray,  # (36, 48, 12)
    reconstructed: np.ndarray,  # (36, 48, 12)
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(4, 7, figsize=(14, 7))
    for c in range(12):
        row, col = divmod(c, 3)
        ax = axs[row][col]
        ax.imshow(real[..., c], cmap="viridis")
        ax.axis("off")
        ax.set_title(f"real ch{c}", fontsize=7)
        ax2 = axs[row][col + 3]
        ax2.imshow(reconstructed[..., c], cmap="viridis")
        ax2.axis("off")
        ax2.set_title(f"gen ch{c}", fontsize=7)
    # last column: inverse energy maps
    for r, (name, img) in enumerate(
        [("real energy", real), ("gen energy", reconstructed)]
    ):
        ax = axs[r][6]
        ax.imshow(np.asarray(find_logen(img[None]))[0], cmap="jet")
        ax.axis("off")
        ax.set_title(name, fontsize=7)
    for r in (2, 3):
        axs[r][6].axis("off")
    plt.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
