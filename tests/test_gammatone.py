"""Gammatone filterbank properties + frontend integration."""

import numpy as np

from conette_tpu.ops.gammatone import erb, erb_space, gammatone_filterbank


def test_erb_known_values():
    # ERB(1 kHz) = 1000/9.26449 + 24.7 ≈ 132.6 Hz
    np.testing.assert_allclose(erb(np.array([1000.0])), [132.639], atol=0.01)


def test_erb_space_monotone_and_bounded():
    cfs = erb_space(50.0, 14_000.0, 64)
    assert len(cfs) == 64
    assert (np.diff(cfs) > 0).all()
    assert cfs[0] >= 49.0 and cfs[-1] <= 14_001.0


def test_filterbank_peaks_at_center_frequencies():
    sr, n_fft, n = 32_000, 1024, 32
    fb = gammatone_filterbank(sr, n_fft, n)
    assert fb.shape == (513, 32)
    freqs = np.linspace(0, sr / 2, 513)
    cfs = erb_space(50.0, sr / 2, n)
    peak_freqs = freqs[fb.argmax(axis=0)]
    # peak bins within one ERB of the analytic centers
    assert np.all(np.abs(peak_freqs - cfs) <= erb(cfs) + sr / n_fft)


def test_frontend_entry():
    from conette_tpu.ops.frontend_factories import get_frontend

    fn, feat = get_frontend("resample_mean_gammatonegram")
    assert feat == 64
    wav = np.random.default_rng(0).standard_normal((1, 32_000)).astype(np.float32)
    out = fn(wav, 32_000)
    assert out.shape[1] == 64
    assert np.isfinite(out).all()
