"""Spectrogram normalization statistics.

The reference z-normalizes STFT spectrograms with global mean/std ``.npy``
files from a ``stats2s/`` directory sibling to the list file
(``/root/reference/dataloader/outdoor_data_mfcc.py:119-159``, applied when
``normalize=True``). Here stats are computed on device in one streaming
pass over a loader and applied as a jit-friendly transform.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.dsp.spectrogram import stft_magnitude

SAMPLES_PER_SECOND = 12 * 1024


def compute_spectrogram_stats(loader, max_batches: int | None = None):
    """Global per-bin mean/std of per-second magnitude spectrograms."""
    total = None
    total_sq = None
    count = 0
    for i, raw in enumerate(loader.batches(0)):
        if max_batches is not None and i >= max_batches:
            break
        wav = raw.audio[: raw.valid].reshape(-1, SAMPLES_PER_SECOND).astype(np.float32)
        spec = np.asarray(stft_magnitude(jnp.asarray(wav)))
        s = spec.sum(axis=0)
        sq = (spec**2).sum(axis=0)
        total = s if total is None else total + s
        total_sq = sq if total_sq is None else total_sq + sq
        count += spec.shape[0]
    mean = total / count
    var = total_sq / count - mean**2
    return mean.astype(np.float32), np.sqrt(np.maximum(var, 1e-12)).astype(np.float32)


def save_stats(stats_dir: str, mean: np.ndarray, std: np.ndarray) -> None:
    """stats2s-compatible artifact names (global_*_prod_2s.npy)."""
    os.makedirs(stats_dir, exist_ok=True)
    np.save(os.path.join(stats_dir, "global_mean_prod_2s.npy"), mean)
    np.save(os.path.join(stats_dir, "global_std_dev_prod_2s.npy"), std)


def load_stats(stats_dir: str):
    mean = np.load(os.path.join(stats_dir, "global_mean_prod_2s.npy"))
    std = np.load(os.path.join(stats_dir, "global_std_dev_prod_2s.npy"))
    return mean, std


def normalize_spectrogram(spec: jnp.ndarray, mean, std) -> jnp.ndarray:
    """z-norm with the loaded global stats (outdoor_data_mfcc.py:634-647)."""
    return (spec - jnp.asarray(mean, spec.dtype)) / jnp.asarray(std, spec.dtype)
