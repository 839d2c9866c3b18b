"""Batched 12-coefficient MFCC frontend as pure JAX.

Functional equivalent of ``_build_spectrograms_function``
(``/root/reference/dataloader/outdoor_data_mfcc.py:796-876``), which the
reference runs on the host through ``tf.py_func``. Here the whole chain runs
on device in one fused XLA program (the Pallas variant lives in
``ops/pallas_mfcc.py``):

    frame (.., 1024) -> Tukey(0.75) window -> |rfft(1024)|^2 drop Nyquist
    -> (512,) power -> mel filterbank (512,24) -> floor 1e-3 -> log
    -> DCT-II (24,12) * sqrt(2/24) -> sinusoidal lifter(22) -> (12,)

All matmuls are MXU work; the chain vectorizes over arbitrary leading axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.dsp import mel as mel_mod


@functools.cache
def _dft_bases():
    """Real-DFT as two matmul bases with the Tukey window folded in.

    On TPU, ``jnp.fft.rfft(1024)`` deviates from NumPy by O(1) in the final
    MFCCs (the XLA:TPU FFT is approximate), while a full-precision GEMM DFT
    matches the oracle to ~1e-3 — and the MXU prefers the matmul anyway, so
    the GEMM formulation is the default everywhere.
    """
    c = mel_mod.constants()
    n = mel_mod.N_SAMPLES
    k = np.arange(n)[:, None] * np.arange(mel_mod.FFT_LEN)[None, :] * (2.0 * np.pi / n)
    cos_b = np.cos(k) * c.window[:, None]
    sin_b = -np.sin(k) * c.window[:, None]
    # cache NUMPY, not jnp: a jnp array materialized inside a jit trace is a
    # tracer, and caching it leaks the trace (UnexpectedTracerError on the
    # next jit). Converted at the use site (constant-folded by jit).
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


def mfcc_from_frames(frames: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    """Compute 12 MFCCs for each 1024-sample frame.

    Args:
      frames: (..., 1024) float or int audio samples.

    Returns:
      (..., 12) float32 MFCC coefficients, matching the reference's NumPy
      pipeline to float32 tolerance on every backend (GEMM-native DFT, see
      ``_dft_bases``).
    """
    cos_np, sin_np = _dft_bases()
    x = frames.astype(dtype)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(x, jnp.asarray(cos_np), precision=hi)
    im = jnp.matmul(x, jnp.asarray(sin_np), precision=hi)
    power = (re * re + im * im).astype(dtype)
    return mfcc_from_power(power, dtype=dtype)


def mfcc_from_power(power: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    """Mel/log/DCT/lifter tail of the frontend on a (..., 512) power spectrum."""
    c = mel_mod.constants()
    hi = jax.lax.Precision.HIGHEST  # default bf16 MXU passes cost ~1% here
    melspec = jnp.matmul(power, jnp.asarray(c.filter_mat, dtype), precision=hi)
    melspec = jnp.maximum(melspec, mel_mod.MELSPEC_FLOOR)
    logmel = jnp.log(melspec)
    coeffs = jnp.matmul(logmel, jnp.asarray(c.dct_lifter, dtype), precision=hi)
    # Reference zeroes NaN/Inf (outdoor_data_mfcc.py:871-872).
    coeffs = jnp.where(jnp.isfinite(coeffs), coeffs, 0.0)
    return coeffs


def mfcc_numpy_oracle(frames: np.ndarray) -> np.ndarray:
    """Host NumPy reference of the same chain, mirroring the reference's
    ``_build_spectrograms_function`` step by step (used by golden tests and
    as a no-JAX fallback in the data pipeline)."""
    c = mel_mod.constants()
    n = frames.shape[0]
    raw = frames.astype(np.float64) * c.window[None, :]
    fftdata = np.abs(np.fft.rfft(raw, mel_mod.N_SAMPLES, axis=1))[:, :-1]
    power = fftdata**2
    melspec = power @ c.filter_mat
    melspec[melspec < mel_mod.MELSPEC_FLOOR] = mel_mod.MELSPEC_FLOOR
    melspec = np.log(melspec)
    coeffs = melspec @ c.dct_base
    coeffs *= c.mfnorm
    coeffs *= c.lifter
    coeffs[np.isnan(coeffs)] = 0
    coeffs[np.isinf(coeffs)] = 0
    return np.float32(coeffs.reshape(n, mel_mod.MFCC_NUM))
