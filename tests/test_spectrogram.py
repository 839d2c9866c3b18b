"""STFT frontend golden test vs the NumPy oracle (tf.signal.stft
semantics: hann periodic 246, hop 122, fft 512)."""

import jax.numpy as jnp
import numpy as np

from acoustic_image_generation_tpu.dsp.spectrogram import (
    stft_magnitude,
    stft_magnitude_numpy_oracle,
)


def test_shapes_one_second():
    wav = np.zeros((3, 12288), np.float32)
    out = stft_magnitude(jnp.asarray(wav))
    assert out.shape == (3, 99, 257)


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    wav = rng.normal(0, 1000, (2, 12288)).astype(np.float32)
    got = np.asarray(stft_magnitude(jnp.asarray(wav)))
    expected = stft_magnitude_numpy_oracle(wav)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-2)


def test_pure_tone_peak_bin():
    # 1 kHz tone at 12288 Hz, fft 512 -> bin ~ 1000/12288*512 = 41.7
    t = np.arange(12288)
    wav = np.sin(2 * np.pi * 1000.0 * t / 12288.0).astype(np.float32)[None]
    mag = np.asarray(stft_magnitude(jnp.asarray(wav)))[0]
    peak = np.argmax(mag.mean(axis=0))
    assert peak in (41, 42)
