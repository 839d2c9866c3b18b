"""Fused Pallas MFCC kernel vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.dsp.mfcc import mfcc_from_frames
from acoustic_image_generation_tpu.ops.pallas_mfcc import mfcc_pallas


def test_matches_jnp_reference():
    rng = np.random.default_rng(3)
    frames = rng.integers(-(2**15), 2**15, (40, 1024)).astype(np.float32)
    expected = np.asarray(mfcc_from_frames(jnp.asarray(frames)))
    got = np.asarray(mfcc_pallas(jnp.asarray(frames), interpret=True))
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_leading_axes_and_padding():
    rng = np.random.default_rng(4)
    frames = rng.normal(0, 1000, (3, 7, 1024)).astype(np.float32)  # 21 % 256 != 0
    got = mfcc_pallas(jnp.asarray(frames), interpret=True)
    assert got.shape == (3, 7, 12)
    expected = np.asarray(mfcc_from_frames(jnp.asarray(frames)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-3)


def test_stft_pallas_matches_reference():
    from acoustic_image_generation_tpu.dsp.spectrogram import stft_magnitude
    from acoustic_image_generation_tpu.ops.pallas_stft import stft_pallas

    rng = np.random.default_rng(5)
    wav = rng.normal(0, 1000, (3, 12288)).astype(np.float32)
    expected = np.asarray(stft_magnitude(jnp.asarray(wav)))
    got = np.asarray(stft_pallas(jnp.asarray(wav), interpret=True))
    assert got.shape == (3, 99, 257)
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=1e-1)
