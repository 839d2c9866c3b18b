"""Fused Pallas TPU kernel for the 12-coefficient MFCC frontend.

Computes, for tiles of 1024-sample audio frames, entirely in VMEM:

    x * tukey -> DFT (two MXU matmuls vs cos/sin bases, Nyquist dropped)
    -> power -> mel filterbank matmul -> floor/log -> DCT+lifter matmul

Functionally identical to ``dsp.mfcc.mfcc_from_frames`` (the pure-jnp
reference; both implement ``/root/reference/dataloader/
outdoor_data_mfcc.py:796-876``). The Pallas version exists because the
frontend is the per-step input transform of every recipe: one kernel
invocation does window+FFT+mel+log+DCT with no HBM round-trips between
stages, and the 1024-point rFFT is expressed as matmuls — which is how a
small fixed-size FFT wants to run on the MXU (a radix FFT would be
VPU-bound scalar shuffling).

VMEM budget per tile (TILE=256 frames, f32): x 1 MB, cos/sin bases 2 MB
each, products 2x0.5 MB, mel 48 KB, out small — ~6.3 MB, well under 16 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.dsp import mel as mel_mod

TILE = 256
N = mel_mod.N_SAMPLES  # 1024
NBINS = mel_mod.FFT_LEN  # 512 bins kept (Nyquist dropped, ref :803)
NMEL = mel_mod.FILTER_NUM  # 24
NMFCC = mel_mod.MFCC_NUM  # 12


@functools.cache
def _constants():
    c = mel_mod.constants()
    k = np.arange(N)[:, None] * np.arange(NBINS)[None, :] * (2.0 * np.pi / N)
    cos_b = np.cos(k) * c.window[:, None]  # fold the Tukey window into the DFT
    sin_b = -np.sin(k) * c.window[:, None]
    # numpy, not jnp: see dsp/mfcc._dft_bases on tracer-leaking caches
    return (
        cos_b.astype(np.float32),
        sin_b.astype(np.float32),
        np.asarray(c.filter_mat, np.float32),  # (512, 24)
        np.asarray(c.dct_lifter, np.float32),  # (24, 12)
    )


def _kernel(x_ref, cos_ref, sin_ref, mel_ref, dct_ref, out_ref):
    x = x_ref[:]  # (TILE, 1024) — window is folded into the bases
    # full-f32 MXU passes: bf16 multiply passes lose ~8 mantissa bits
    # in the cancelling DFT sums
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(x, cos_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(x, sin_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im  # (TILE, 512)
    melspec = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32, precision=hi)
    logmel = jnp.log(jnp.maximum(melspec, mel_mod.MELSPEC_FLOOR))
    coeffs = jnp.dot(logmel, dct_ref[:], preferred_element_type=jnp.float32, precision=hi)
    out_ref[:] = jnp.where(jnp.isfinite(coeffs), coeffs, 0.0)


def mfcc_pallas(frames: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """(..., 1024) audio frames -> (..., 12) MFCCs via the fused kernel.

    Pads the flattened frame count up to a TILE multiple; use
    ``interpret=True`` off-TPU (tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = frames.shape[:-1]
    x = frames.reshape(-1, N).astype(jnp.float32)
    n = x.shape[0]
    n_pad = -n % TILE
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    grid = (x.shape[0] // TILE,)
    cos_b, sin_b, mel_b, dct_b = (jnp.asarray(a) for a in _constants())

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], NMFCC), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(cos_b),
            full(sin_b),
            full(mel_b),
            full(dct_b),
        ],
        out_specs=pl.BlockSpec((TILE, NMFCC), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, cos_b, sin_b, mel_b, dct_b)
    if n_pad:
        out = out[:n]
    return out.reshape(*lead, NMFCC)
