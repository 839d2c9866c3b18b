"""Butterworth low-pass design + zero-phase filtering (filtfilt).

The reference builds the "silence" MFCC branch by low-pass filtering each
waveform with ``scipy.signal.butter(10, 125/(fs/2), 'low')`` +
``scipy.signal.filtfilt`` (``/root/reference/dataloader/outdoor_data_mfcc.py:
565-575``) inside a ``tf.py_func``. We reimplement both from first
principles (no SciPy at runtime):

- ``butter_lowpass``: analog Butterworth prototype -> lp2lp -> bilinear
  transform, returned as (b, a) transfer-function coefficients matching
  ``scipy.signal.butter`` bit-for-bit.
- ``filtfilt``: SciPy-default semantics (padtype='odd',
  padlen=3*max(len(a),len(b)), initial conditions from ``lfilter_zi``),
  as host NumPy and as a JAX ``lax.scan`` for on-device use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_CUTOFF_HZ = 125.0
DEFAULT_ORDER = 10


def butter_lowpass(order: int, wn: float) -> tuple[np.ndarray, np.ndarray]:
    """Digital Butterworth low-pass (b, a); ``wn`` normalized to Nyquist=1."""
    # Analog prototype: poles on the unit circle's left half.
    k = np.arange(-order + 1, order, 2)
    poles = -np.exp(1j * np.pi * k / (2 * order))
    gain = 1.0

    # Pre-warp and scale (lp2lp), then bilinear transform at fs=2.
    fs = 2.0
    warped = 2 * fs * np.tan(np.pi * wn / fs)
    poles = warped * poles
    gain *= warped**order

    fs2 = 2.0 * fs
    poles_d = (fs2 + poles) / (fs2 - poles)
    zeros_d = -np.ones(order)
    gain_d = np.real(gain / np.prod(fs2 - poles))

    b = gain_d * np.real(np.poly(zeros_d))
    a = np.real(np.poly(poles_d))
    return b, a


@functools.lru_cache(maxsize=8)
def _default_ba(sample_rate: int, cutoff: float, order: int):
    nyq = 0.5 * sample_rate
    return butter_lowpass(order, cutoff / nyq)


def butter_lowpass_sos(order: int, wn: float) -> np.ndarray:
    """Digital Butterworth low-pass as cascaded biquads, (order//2, 6).

    The (b, a) transfer-function form of a high-order filter at a low
    normalized cutoff (the reference's order 10 at 125/6144 ~= 0.02) is
    numerically unusable in float32; conjugate-pole biquad sections are
    well-conditioned, which is what the on-device (f32) path uses.
    """
    assert order % 2 == 0, "even order only (reference uses 10)"
    k = np.arange(-order + 1, order, 2)
    poles = -np.exp(1j * np.pi * k / (2 * order))
    fs = 2.0
    warped = 2 * fs * np.tan(np.pi * wn / fs)
    poles = warped * poles
    gain = warped**order
    fs2 = 2.0 * fs
    poles_d = (fs2 + poles) / (fs2 - poles)
    gain_d = np.real(gain / np.prod(fs2 - poles))

    # pair conjugate poles (sorted by imag magnitude -> stable pairing)
    upper = poles_d[np.imag(poles_d) > 0]
    upper = upper[np.argsort(np.abs(np.imag(upper)))]
    n_sec = order // 2
    sos = np.zeros((n_sec, 6))
    for i, p in enumerate(upper):
        sos[i, 0:3] = [1.0, 2.0, 1.0]  # zeros at z=-1
        sos[i, 3:6] = [1.0, -2 * np.real(p), np.abs(p) ** 2]
    sos[0, 0:3] *= gain_d
    return sos


@functools.lru_cache(maxsize=8)
def _default_sos(sample_rate: int, cutoff: float, order: int) -> tuple:
    nyq = 0.5 * sample_rate
    sos = butter_lowpass_sos(order, cutoff / nyq)
    # per-section initial conditions (scipy sosfilt_zi): lfilter_zi of the
    # section scaled by the cumulative DC gain of preceding sections
    n_sec = sos.shape[0]
    zi = np.zeros((n_sec, 2))
    scale = 1.0
    for k in range(n_sec):
        b, a = sos[k, :3], sos[k, 3:]
        zi[k] = scale * lfilter_zi(b, a)
        scale *= b.sum() / a.sum()
    return sos, zi


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for a step input (scipy.signal.lfilter_zi)."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    a = a / a[0]
    b = b / a[0] if a[0] != 1.0 else b
    n = len(a)
    # companion(a).T
    comp = np.zeros((n - 1, n - 1))
    comp[0, :] = -a[1:] / a[0]
    comp[1:, :-1] = np.eye(n - 2)
    iminus_a = np.eye(n - 1) - comp.T
    rhs = b[1:] - a[1:] * b[0]
    return np.linalg.solve(iminus_a, rhs)


def _lfilter_np(b, a, x, zi):
    """Direct-form II transposed, single 1-D signal."""
    n_ord = len(a) - 1
    z = zi.copy()
    y = np.empty_like(x)
    for i in range(len(x)):
        xi = x[i]
        yi = b[0] * xi + z[0]
        for j in range(n_ord - 1):
            z[j] = b[j + 1] * xi + z[j + 1] - a[j + 1] * yi
        z[n_ord - 1] = b[n_ord] * xi - a[n_ord] * yi
        y[i] = yi
    return y


def _odd_ext(x: np.ndarray, n: int) -> np.ndarray:
    left = 2 * x[..., :1] - x[..., n:0:-1]
    right = 2 * x[..., -1:] - x[..., -2 : -n - 2 : -1]
    return np.concatenate((left, x, right), axis=-1)


def filtfilt_numpy(x: np.ndarray, sample_rate: int = 12288,
                   cutoff: float = DEFAULT_CUTOFF_HZ,
                   order: int = DEFAULT_ORDER) -> np.ndarray:
    """Zero-phase Butterworth low-pass over the last axis (host path).

    Matches ``butter_lowpass_filter`` (outdoor_data_mfcc.py:571-575):
    scipy filtfilt defaults, output cast to float32.
    """
    b, a = _default_ba(sample_rate, cutoff, order)
    zi = lfilter_zi(b, a)
    padlen = 3 * max(len(a), len(b))
    x = np.asarray(x, dtype=np.float64)
    flat = x.reshape(-1, x.shape[-1])
    out = np.empty_like(flat)
    for i, sig in enumerate(flat):
        ext = _odd_ext(sig, padlen)
        y = _lfilter_np(b, a, ext, zi * ext[0])
        y = _lfilter_np(b, a, y[::-1], zi * y[-1])
        out[i] = y[::-1][padlen:-padlen]
    return np.float32(out.reshape(x.shape))


def _sosfilt_scan(sos, x, zi):
    """JAX biquad cascade (direct-form II transposed) via lax.scan.

    x: (B, T) batch of signals; zi: (B, n_sections, 2). The scan is serial
    over T but each step is fully vectorized over the batch (VPU work), so
    wall-clock ~= T * n_sections fused multiply-adds.
    """
    n_sec = sos.shape[0]
    sos = jnp.asarray(sos, x.dtype)

    def step(z, xt):
        # z: (B, n_sec, 2), xt: (B,)
        zs = []
        cur = xt
        for k in range(n_sec):
            b0, b1, b2, _, a1, a2 = [sos[k, j] for j in range(6)]
            y = b0 * cur + z[:, k, 0]
            z0 = b1 * cur + z[:, k, 1] - a1 * y
            z1 = b2 * cur - a2 * y
            zs.append(jnp.stack([z0, z1], axis=-1))
            cur = y
        return jnp.stack(zs, axis=1), cur

    _, y = jax.lax.scan(step, zi, x.T)
    return y.T


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def filtfilt_jax(x: jnp.ndarray, sample_rate: int = 12288,
                 cutoff: float = DEFAULT_CUTOFF_HZ,
                 order: int = DEFAULT_ORDER) -> jnp.ndarray:
    """Zero-phase Butterworth low-pass over the last axis, on device.

    Same filter as :func:`filtfilt_numpy` but evaluated as a biquad cascade
    (stable in f32; the (b,a) form is not at this cutoff). Odd-extension
    padding and steady-state initial conditions follow SciPy's filtfilt
    defaults, so outputs agree with the host path to f32 tolerance.
    """
    sos, zi_np = _default_sos(sample_rate, cutoff, order)
    padlen = 3 * (2 * sos.shape[0] + 1)
    orig_dtype = x.dtype
    x = x.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    shape = x.shape
    flat = x.reshape(-1, shape[-1])

    left = 2 * flat[:, :1] - flat[:, padlen:0:-1]
    right = 2 * flat[:, -1:] - flat[:, -2 : -padlen - 2 : -1]
    ext = jnp.concatenate([left, flat, right], axis=-1)

    zi = jnp.asarray(zi_np, ext.dtype)
    y = _sosfilt_scan(sos, ext, zi[None] * ext[:, 0][:, None, None])
    y = y[:, ::-1]
    y = _sosfilt_scan(sos, y, zi[None] * y[:, 0][:, None, None])
    out = y[:, ::-1][:, padlen:-padlen]
    return out.reshape(shape).astype(jnp.promote_types(orig_dtype, jnp.float32))
