"""Inverse MFCC -> spatial log-energy map (``find_logen``).

Batched jnp port of ``/root/reference/iouenergythreshold.py:294-323``: the
12 MFCC channels of a (36,48,12) acoustic image are un-liftered, inverse-DCT'd
back to 24 mel log-energies, exponentiated, summed, and inverted to a single
(36,48) energy map. The reference runs this per image on the host inside the
evaluation loop (the [host hot loop] of its IoU sweep); here it is one fused
device op over the whole batch, so the 11-threshold IoU sweep runs in a
single pass.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.dsp import mel as mel_mod


def find_logen(mfcc: jnp.ndarray) -> jnp.ndarray:
    """Energy map from MFCC channels.

    Args:
      mfcc: (..., 12) MFCC coefficients; typically (B, 36, 48, 12).

    Returns:
      (...) energy map, e.g. (B, 36, 48).
    """
    c = mel_mod.constants()
    # upcast: exp() of un-liftered log-mel overflows in bfloat16, which
    # silently zeroes the energy map when fed bf16 model outputs
    mfcc = mfcc.astype(jnp.float32)
    x = mfcc / jnp.asarray(c.lifter, mfcc.dtype)
    x = x * c.mfnorm
    melspec = x @ jnp.asarray(c.dct_base.T, mfcc.dtype)  # (..., 24)
    sumexp = jnp.sum(jnp.exp(melspec), axis=-1)
    return 1.0 / sumexp


def find_logen_numpy_oracle(mfcc: np.ndarray) -> np.ndarray:
    """Host oracle mirroring the reference line by line ((-1,12) -> (36,48))."""
    c = mel_mod.constants()
    m = np.reshape(mfcc, (-1, 12)).astype(np.float64).copy()
    m /= np.expand_dims(c.lifter, 0)
    m *= c.mfnorm
    melspec = np.dot(m, np.transpose(c.dct_base))
    melspec = np.exp(melspec)
    sumexp = np.sum(melspec, -1)
    sumexp = 1 / sumexp
    return np.reshape(sumexp, (36, 48))
