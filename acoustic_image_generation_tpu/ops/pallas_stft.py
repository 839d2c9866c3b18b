"""Fused Pallas TPU kernel for the STFT magnitude frontend.

Companion of ``ops/pallas_mfcc.py`` for the embed/project/joint recipes'
per-second spectrograms (``dsp/spectrogram.py`` semantics: hann-periodic
246-sample window, hop 122, rFFT 512, |.|): per second of audio, the 99
frames are gathered in-kernel and the rFFT is two MXU matmuls against
windowed cos/sin bases — a small fixed-size DFT wants to be a GEMM on TPU,
not a radix FFT.

Layout: one grid step processes TILE seconds; the (12288,) second is
framed into (99, 246) with a static gather, padded to (99, 256) lanes is
unnecessary — the matmul contracts over 246 directly.

VMEM per tile (TILE=16 seconds, f32): audio 0.8 MB, frames 1.5 MB, bases
2x 0.25 MB, outputs 2x1.6 MB — comfortably under budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.dsp import spectrogram as spec_mod

TILE = 8
SECONDS_SAMPLES = 12 * 1024
NFRAMES = 1 + (SECONDS_SAMPLES - spec_mod.FRAME_LENGTH) // spec_mod.FRAME_STEP  # 99
NBINS = spec_mod.FFT_LENGTH // 2 + 1  # 257


@functools.cache
def _constants():
    window = spec_mod.hann_periodic()
    n = spec_mod.FRAME_LENGTH
    k = np.arange(n)[:, None] * np.arange(NBINS)[None, :] * (
        2.0 * np.pi / spec_mod.FFT_LENGTH
    )
    cos_b = np.cos(k) * window[:, None]  # (246, 257), window folded in
    sin_b = -np.sin(k) * window[:, None]
    # numpy, not jnp: see dsp/mfcc._dft_bases on tracer-leaking caches
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


def _kernel(wav_ref, cos_ref, sin_ref, out_ref, frames_ref):
    # frame with static overlapping slices (Mosaic has no generic gather)
    for i in range(NFRAMES):
        start = i * spec_mod.FRAME_STEP
        frames_ref[:, i, :] = wav_ref[:, start : start + spec_mod.FRAME_LENGTH]
    flat = frames_ref[:].reshape(-1, spec_mod.FRAME_LENGTH)
    # full-f32 MXU passes: the DFT cancels catastrophically in the
    # default bf16 multiply passes (errors ~1% of peak magnitude)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(flat, cos_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(flat, sin_ref[:], preferred_element_type=jnp.float32, precision=hi)
    mag = jnp.sqrt(re * re + im * im)
    out_ref[:] = mag.reshape(-1, NFRAMES, NBINS)


def stft_pallas(wav: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """(..., 12288) float audio -> (..., 99, 257) magnitude spectrogram."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    lead = wav.shape[:-1]
    x = wav.reshape(-1, SECONDS_SAMPLES).astype(jnp.float32)
    n = x.shape[0]
    n_pad = -n % TILE
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    cos_b, sin_b = (jnp.asarray(a) for a in _constants())
    grid = (x.shape[0] // TILE,)

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], NFRAMES, NBINS), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, SECONDS_SAMPLES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(cos_b),
            full(sin_b),
        ],
        out_specs=pl.BlockSpec(
            (TILE, NFRAMES, NBINS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE, NFRAMES, spec_mod.FRAME_LENGTH), jnp.float32)
        ],
        interpret=interpret,
    )(x, cos_b, sin_b)
    if n_pad:
        out = out[:n]
    return out.reshape(*lead, NFRAMES, NBINS)
