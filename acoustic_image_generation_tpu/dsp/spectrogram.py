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
def _dft_bases(frame_length: int = FRAME_LENGTH, fft_length: int = FFT_LENGTH):
    """Windowed real-DFT bases (GEMM-native; XLA:TPU's FFT is approximate
    while a HIGHEST-precision matmul matches NumPy — and rides the MXU)."""
    window = hann_periodic(frame_length)
    k = (
        np.arange(frame_length)[:, None]
        * np.arange(fft_length // 2 + 1)[None, :]
        * (2.0 * np.pi / fft_length)
    )
    cos_b = np.cos(k) * window[:, None]
    sin_b = -np.sin(k) * window[:, None]
    # numpy, not jnp: see dsp/mfcc._dft_bases on tracer-leaking caches
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


def stft_magnitude(
    wav: jnp.ndarray,
    *,
    frame_length: int = FRAME_LENGTH,
    frame_step: int = FRAME_STEP,
    fft_length: int = FFT_LENGTH,
) -> jnp.ndarray:
    """|STFT| of (..., num_samples) float audio -> (..., frames, fft/2+1).

    Defaults are the AVIA/music geometry: num_samples = 12288 (one
    second) -> (..., 99, 257), matching the reference's per-second
    spectrogram shape (``/root/reference/trainer/trainer_three.py:452``).
    The TUT loader passes its own geometry
    (``data.tut.spectrogram_params``: 440/219/512,
    ``tut_data.py:19-22``).
    """
    n = wav.shape[-1]
    num_frames = 1 + (n - frame_length) // frame_step
    idx = (
        np.arange(frame_length)[None, :]
        + frame_step * np.arange(num_frames)[:, None]
    )  # (frames, frame_length) static gather indices
    frames = wav[..., idx].astype(jnp.float32)  # (..., frames, frame_length)
    cos_np, sin_np = _dft_bases(frame_length, fft_length)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, jnp.asarray(cos_np), precision=hi)
    im = jnp.matmul(frames, jnp.asarray(sin_np), precision=hi)
    return jnp.sqrt(re * re + im * im).astype(jnp.float32)


def stft_magnitude_numpy_oracle(
    wav: np.ndarray,
    *,
    frame_length: int = FRAME_LENGTH,
    frame_step: int = FRAME_STEP,
    fft_length: int = FFT_LENGTH,
) -> np.ndarray:
    """Host oracle mirroring tf.signal.stft step by step."""
    n = wav.shape[-1]
    num_frames = 1 + (n - frame_length) // frame_step
    window = hann_periodic(frame_length)
    out = np.empty((*wav.shape[:-1], num_frames, fft_length // 2 + 1), np.float32)
    for f in range(num_frames):
        seg = wav[..., f * frame_step : f * frame_step + frame_length] * window
        out[..., f, :] = np.abs(np.fft.rfft(seg, fft_length, axis=-1))
    return out
