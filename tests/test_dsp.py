"""Golden tests for the DSP frontend against SciPy / the reference's NumPy
pipeline (lifted from /root/reference/dataloader/outdoor_data_mfcc.py:796-876
and /root/reference/iouenergythreshold.py:294-323)."""

import numpy as np
import scipy.signal as sps

import jax.numpy as jnp

from acoustic_image_generation_tpu.dsp import energy, iir, mel, mfcc, windows


def _reference_mfcc(audio_data: np.ndarray) -> np.ndarray:
    """Verbatim re-statement of the reference _build_spectrograms_function."""
    n = np.shape(audio_data)[0]
    window = sps.windows.tukey(1024, alpha=0.75)
    window = np.tile(window, (n, 1)).reshape(n, 1024)
    raw_audio = audio_data * window
    fftdata = np.abs(np.fft.rfft(raw_audio, 1024, axis=1))[:, :-1]
    fftdata = fftdata**2

    lifter_num, lo_freq, hi_freq, filter_num, mfcc_num, fft_len = 22, 0, 6400, 24, 12, 512
    dct_base = np.zeros((filter_num, mfcc_num))
    for m in range(mfcc_num):
        dct_base[:, m] = np.cos((m + 1) * np.pi / filter_num * (np.arange(filter_num) + 0.5))
    lifter = 1 + (lifter_num / 2) * np.sin(np.pi * (1 + np.arange(mfcc_num)) / lifter_num)
    mfnorm = np.sqrt(2.0 / filter_num)

    filter_mat = np.zeros((fft_len, filter_num))
    mel2freq = lambda m: 700.0 * (np.exp(m / 1127.0) - 1)
    freq2mel = lambda f: 1127 * (np.log(1 + (f / 700.0)))
    mel_c = np.linspace(freq2mel(lo_freq), freq2mel(hi_freq), filter_num + 2)
    freq_c = mel2freq(mel_c)
    point_c = np.floor(freq_c / float(2 * hi_freq) * (fft_len - 1) * 2).astype("int")
    for f in range(filter_num):
        d1 = point_c[f + 1] - point_c[f]
        d2 = point_c[f + 2] - point_c[f + 1]
        filter_mat[point_c[f] : point_c[f + 1] + 1, f] = np.linspace(0, 1, d1 + 1)
        filter_mat[point_c[f + 1] : point_c[f + 2] + 1, f] = np.linspace(1, 0, d2 + 1)

    melspec = np.dot(fftdata.reshape(n, fft_len), filter_mat)
    melspec[melspec < 0.001] = 0.001
    melspec = np.log(melspec)
    out = np.dot(melspec, dct_base) * mfnorm * lifter
    out[np.isnan(out)] = 0
    out[np.isinf(out)] = 0
    return np.float32(out.reshape(n, mfcc_num))


class TestTukey:
    def test_matches_scipy(self):
        for m, alpha in [(1024, 0.75), (512, 0.5), (17, 0.3), (1, 0.75)]:
            np.testing.assert_allclose(
                windows.tukey(m, alpha), sps.windows.tukey(m, alpha), atol=1e-15
            )


class TestMelConstants:
    def test_filterbank_matches_reference(self):
        ours = mel.create_filters()
        assert ours.shape == (512, 24)
        # every filter sums to a positive value and peaks at 1
        assert np.allclose(ours.max(axis=0), 1.0)

    def test_dct_and_lifter_shapes(self):
        assert mel.dct_basis().shape == (24, 12)
        assert mel.lifter_weights().shape == (12,)


class TestMfcc:
    def test_matches_reference_pipeline(self, rng_np):
        frames = rng_np.integers(-(2**15), 2**15, size=(24, 1024)).astype(np.float64)
        want = _reference_mfcc(frames)
        got = np.asarray(mfcc.mfcc_from_frames(jnp.asarray(frames, jnp.float32)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_numpy_oracle_matches_reference(self, rng_np):
        frames = rng_np.normal(size=(12, 1024)) * 1000
        np.testing.assert_allclose(
            mfcc.mfcc_numpy_oracle(frames), _reference_mfcc(frames), rtol=1e-6, atol=1e-6
        )

    def test_silence_is_finite(self):
        frames = np.zeros((12, 1024))
        got = np.asarray(mfcc.mfcc_from_frames(jnp.asarray(frames)))
        assert np.isfinite(got).all()

    def test_batched_leading_axes(self, rng_np):
        frames = rng_np.normal(size=(2, 3, 1024)).astype(np.float32)
        got = np.asarray(mfcc.mfcc_from_frames(jnp.asarray(frames)))
        assert got.shape == (2, 3, 12)
        flat = np.asarray(mfcc.mfcc_from_frames(jnp.asarray(frames.reshape(6, 1024))))
        np.testing.assert_allclose(got.reshape(6, 12), flat, atol=1e-6)


class TestButterFiltfilt:
    def test_butter_matches_scipy(self):
        b, a = iir.butter_lowpass(10, 125 / (0.5 * 12288))
        b_s, a_s = sps.butter(10, 125 / (0.5 * 12288), btype="low", analog=False)
        np.testing.assert_allclose(b, b_s, rtol=1e-10)
        np.testing.assert_allclose(a, a_s, rtol=1e-10)

    def test_lfilter_zi_matches_scipy(self):
        b, a = iir.butter_lowpass(10, 125 / (0.5 * 12288))
        np.testing.assert_allclose(iir.lfilter_zi(b, a), sps.lfilter_zi(b, a), rtol=1e-6)

    def test_filtfilt_matches_scipy(self, rng_np):
        x = rng_np.normal(size=(3, 1024)) * 100
        b, a = sps.butter(10, 125 / (0.5 * 12288), btype="low")
        want = np.float32(sps.filtfilt(b, a, x))
        got = iir.filtfilt_numpy(x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_sos_matches_scipy(self):
        wn = 125 / (0.5 * 12288)
        np.testing.assert_allclose(
            iir.butter_lowpass_sos(10, wn),
            sps.butter(10, wn, btype="low", output="sos"),
            rtol=1e-9,
            atol=1e-12,
        )

    def test_filtfilt_jax_matches_sosfiltfilt(self, rng_np):
        """The device path evaluates the filter as a biquad cascade — the
        numerically correct form. (The reference's (b,a) filtfilt diverges
        from the true filter response by up to ~10% even in float64 at this
        order/cutoff; the host path reproduces that bit-for-bit, the device
        path computes the intended filter.)"""
        x = rng_np.normal(size=(2, 1024)).astype(np.float32) * 10
        got = np.asarray(iir.filtfilt_jax(jnp.asarray(x)))
        sos = sps.butter(10, 125 / (0.5 * 12288), btype="low", output="sos")
        want = sps.sosfiltfilt(sos, x.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


class TestFindLogen:
    def test_matches_reference(self, rng_np):
        mfcc_img = rng_np.normal(size=(36, 48, 12)).astype(np.float32)
        want = energy.find_logen_numpy_oracle(mfcc_img.copy())
        got = np.asarray(energy.find_logen(jnp.asarray(mfcc_img)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_batched(self, rng_np):
        batch = rng_np.normal(size=(4, 36, 48, 12)).astype(np.float32)
        got = np.asarray(energy.find_logen(jnp.asarray(batch)))
        assert got.shape == (4, 36, 48)
        for i in range(4):
            np.testing.assert_allclose(
                got[i], energy.find_logen_numpy_oracle(batch[i].copy()), rtol=1e-4, atol=1e-6
            )

    def test_roundtrip_consistency(self, rng_np):
        """MFCCs of a frame -> find_logen is finite and positive."""
        frames = rng_np.normal(size=(8, 1024)) * 500
        coeffs = np.asarray(mfcc.mfcc_from_frames(jnp.asarray(frames, jnp.float32)))
        en = np.asarray(energy.find_logen(jnp.asarray(coeffs)))
        assert np.isfinite(en).all()
        assert (en > 0).all()


def test_constant_caches_are_jit_safe():
    """Regression: cached DSP constants must not capture tracers when the
    FIRST call happens inside a jit trace (UnexpectedTracerError otherwise)."""
    import jax
    import jax.numpy as jnp

    from acoustic_image_generation_tpu.dsp import mfcc as mfcc_mod
    from acoustic_image_generation_tpu.dsp import spectrogram as spec_mod

    mfcc_mod._dft_bases.cache_clear()
    spec_mod._dft_bases.cache_clear()

    x = jnp.zeros((4, 1024))
    w = jnp.zeros((2, 12288))
    # first touch inside jit, then reuse in a SECOND independent jit
    jax.jit(mfcc_mod.mfcc_from_frames)(x).block_until_ready()
    jax.jit(lambda v: mfcc_mod.mfcc_from_frames(v) + 1)(x).block_until_ready()
    jax.jit(spec_mod.stft_magnitude)(w).block_until_ready()
    jax.jit(lambda v: spec_mod.stft_magnitude(v) + 1)(w).block_until_ready()
