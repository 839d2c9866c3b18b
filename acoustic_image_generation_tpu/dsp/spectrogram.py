"""STFT magnitude spectrogram frontend (audio-VAE input).

Port of the ``tf.contrib.signal.stft`` call of the AVIA/music loader
(``/root/reference/dataloader/outdoor_data.py:844-852``): frame_length 246,
frame_step 122, fft_length 512, periodic Hann window, |.| magnitude. One
second of 12288 Hz audio -> (99, 257). Runs on device as framing + one
batched rFFT (VPU/MXU-friendly; no host py_func round trip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FRAME_LENGTH = 246
FRAME_STEP = 122
FFT_LENGTH = 512


def hann_periodic(n: int = FRAME_LENGTH) -> np.ndarray:
    """Periodic Hann window (tf.signal default)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


@functools.cache
def _dft_bases():
    """Windowed real-DFT bases (GEMM-native; XLA:TPU's FFT is approximate
    while a HIGHEST-precision matmul matches NumPy — and rides the MXU)."""
    window = hann_periodic()
    k = (
        np.arange(FRAME_LENGTH)[:, None]
        * np.arange(FFT_LENGTH // 2 + 1)[None, :]
        * (2.0 * np.pi / FFT_LENGTH)
    )
    cos_b = np.cos(k) * window[:, None]
    sin_b = -np.sin(k) * window[:, None]
    # numpy, not jnp: see dsp/mfcc._dft_bases on tracer-leaking caches
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


def stft_magnitude(wav: jnp.ndarray) -> jnp.ndarray:
    """|STFT| of (..., num_samples) float audio -> (..., frames, 257).

    For num_samples = 12288 (one second) the output is (..., 99, 257),
    matching the reference's per-second spectrogram shape
    (``/root/reference/trainer/trainer_three.py:452``).
    """
    n = wav.shape[-1]
    num_frames = 1 + (n - FRAME_LENGTH) // FRAME_STEP
    idx = (
        np.arange(FRAME_LENGTH)[None, :]
        + FRAME_STEP * np.arange(num_frames)[:, None]
    )  # (frames, frame_length) static gather indices
    frames = wav[..., idx].astype(jnp.float32)  # (..., frames, frame_length)
    cos_np, sin_np = _dft_bases()
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(cos_np), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(sin_np), precision=hi)
    return jnp.sqrt(re * re + im * im).astype(jnp.float32)


def stft_magnitude_numpy_oracle(wav: np.ndarray) -> np.ndarray:
    """Host oracle mirroring tf.signal.stft step by step."""
    n = wav.shape[-1]
    num_frames = 1 + (n - FRAME_LENGTH) // FRAME_STEP
    window = hann_periodic()
    out = np.empty((*wav.shape[:-1], num_frames, FFT_LENGTH // 2 + 1), np.float32)
    for f in range(num_frames):
        seg = wav[..., f * FRAME_STEP : f * FRAME_STEP + FRAME_LENGTH] * window
        out[..., f, :] = np.abs(np.fft.rfft(seg, FFT_LENGTH, axis=-1))
    return out
