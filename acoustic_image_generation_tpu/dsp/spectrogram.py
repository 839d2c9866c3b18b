"""STFT magnitude spectrogram frontend (audio-VAE input).

Port of the ``tf.contrib.signal.stft`` call of the AVIA/music loader
(``/root/reference/dataloader/outdoor_data.py:844-852``): frame_length 246,
frame_step 122, fft_length 512, periodic Hann window, |.| magnitude. One
second of 12288 Hz audio -> (99, 257). Runs on device as framing + one
batched rFFT (VPU/MXU-friendly; no host py_func round trip).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FRAME_LENGTH = 246
FRAME_STEP = 122
FFT_LENGTH = 512


def hann_periodic(n: int = FRAME_LENGTH) -> np.ndarray:
    """Periodic Hann window (tf.signal default)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


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
    frames = wav[..., idx]  # (..., frames, frame_length)
    window = jnp.asarray(hann_periodic(), wav.dtype)
    spec = jnp.fft.rfft(frames * window, n=FFT_LENGTH, axis=-1)
    return jnp.abs(spec).astype(jnp.float32)


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
