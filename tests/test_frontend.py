"""Golden tests for the audio frontend (STFT / mel / resample).

Oracles: torch.stft (CPU torch is the same core the reference's
torchlibrosa conv-STFT reproduces), analytic mel filterbank properties, and
signal-level invariants for the polyphase resampler.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conette_tpu.ops.frontend import DEFAULT_LOGMEL, logmel_spectrogram
from conette_tpu.ops.mel import hz_to_mel, mel_filterbank, mel_to_hz, power_to_db
from conette_tpu.ops.resample import resample, resample_kernel, resampled_length
from conette_tpu.ops.stft import (
    frame_signal,
    hann_window,
    num_frames,
    power_spectrogram,
)


def _rand_wave(n=32_000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


class TestSTFT:
    def test_hann_window_matches_torch(self):
        w = hann_window(1024)
        wt = torch.hann_window(1024, periodic=True).numpy()
        np.testing.assert_allclose(w, wt, atol=1e-6)

    def test_power_spectrogram_matches_torch_stft(self):
        x = _rand_wave(16_000)
        ours = np.asarray(power_spectrogram(jnp.asarray(x[None, :])))[0]
        xt = torch.from_numpy(x)
        st = torch.stft(
            xt,
            n_fft=1024,
            hop_length=320,
            win_length=1024,
            window=torch.hann_window(1024, periodic=True),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        ref = (st.abs() ** 2).numpy().T  # (frames, freqs)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)

    @pytest.mark.parametrize(
        "n,n_fft,hop",
        [
            (32_000, 1024, 320),  # production geometry (rem=64)
            (32_001, 1024, 320),  # T not a hop multiple
            (31_999, 1024, 320),
            (16_000, 512, 256),  # n_fft % hop == 0 (no partial block)
            (16_000, 1024, 1024),  # hop == n_fft
            (4_096, 400, 160),  # PANN-style geometry
        ],
    )
    def test_frame_slices_equals_gather(self, n, n_fft, hop):
        x = jnp.asarray(_rand_wave(n)[None, :])
        a = np.asarray(frame_signal(x, n_fft, hop, impl="slices"))
        b = np.asarray(frame_signal(x, n_fft, hop, impl="gather"))
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)

    def test_num_frames(self):
        assert num_frames(320_000, 1024, 320) == 1001  # 10 s @ 32 kHz
        x = _rand_wave(320_00)
        spec = power_spectrogram(jnp.asarray(x[None, :]))
        assert spec.shape == (1, num_frames(len(x), 1024, 320), 513)

    def test_pure_tone_peak_bin(self):
        sr, f0 = 32_000, 1000.0
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        spec = np.asarray(power_spectrogram(jnp.asarray(x[None, :])))[0]
        peak_bin = spec.mean(axis=0).argmax()
        assert abs(peak_bin * sr / 1024 - f0) < sr / 1024


class TestMel:
    def test_mel_hz_roundtrip(self):
        f = np.array([0.0, 50.0, 440.0, 1000.0, 4000.0, 14000.0])
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)

    def test_slaney_linear_below_1k(self):
        np.testing.assert_allclose(hz_to_mel(np.array([200.0])), [3.0])
        np.testing.assert_allclose(hz_to_mel(np.array([1000.0])), [15.0])

    def test_filterbank_shape_and_support(self):
        fb = mel_filterbank(32_000, 1024, 224, 50.0, 14_000.0)
        assert fb.shape == (513, 224)
        freqs = np.linspace(0, 16_000, 513)
        # No filter extends outside [fmin, fmax]
        active = fb.sum(axis=1) > 0
        assert freqs[active].min() >= 50.0 - 32.0
        assert freqs[active].max() <= 14_000.0 + 32.0
        # Every mel channel is non-empty
        assert (fb.sum(axis=0) > 0).all()

    def test_slaney_normalization(self):
        """Slaney norm: filter area (in Hz) = constant 1 → sum*df ≈ 2/(width)·area."""
        fb = mel_filterbank(32_000, 2048, 64, 0.0, 16_000.0)
        df = 32_000 / 2 / (2048 // 2)
        areas = fb.sum(axis=0) * df
        # Triangles have base b and height 2/b → area 1 (approximately, on the grid)
        np.testing.assert_allclose(areas, 1.0, atol=0.12)

    def test_power_to_db(self):
        x = np.array([1e-12, 1.0, 100.0])
        np.testing.assert_allclose(power_to_db(x), [-100.0, 0.0, 20.0])


class TestLogMel:
    def test_shapes_10s(self):
        x = jnp.asarray(_rand_wave(320_000)[None, :])
        lm = logmel_spectrogram(x)
        assert lm.shape == (1, 1001, 224)

    def test_values_finite_and_floor(self):
        x = jnp.zeros((1, 32_000), dtype=jnp.float32)
        lm = np.asarray(logmel_spectrogram(x))
        assert np.all(lm == -100.0)  # 10*log10(amin=1e-10)

    def test_matches_composed_reference_path(self):
        x = _rand_wave(32_000)
        lm = np.asarray(logmel_spectrogram(jnp.asarray(x[None, :])))[0]
        spec = np.asarray(power_spectrogram(jnp.asarray(x[None, :])))[0]
        fb = mel_filterbank(32_000, 1024, 224, 50.0, 14_000.0)
        ref = power_to_db(spec @ fb)
        np.testing.assert_allclose(lm, ref, atol=1e-3)


class TestResample:
    def test_identity_same_rate(self):
        x = jnp.asarray(_rand_wave(1000)[None, :])
        y = resample(x, 32_000, 32_000)
        assert y is x

    def test_output_length(self):
        for orig, new, n in [(44_100, 32_000, 44_100), (48_000, 32_000, 12_345),
                             (16_000, 32_000, 16_000)]:
            x = jnp.asarray(_rand_wave(n)[None, :])
            y = resample(x, orig, new)
            assert y.shape == (1, resampled_length(n, orig, new))

    @pytest.mark.parametrize("orig", [44_100, 48_000])
    def test_tone_preserved(self, orig):
        """A 1 kHz tone must survive resampling to 32 kHz with high SNR."""
        new = 32_000
        t = np.arange(orig) / orig
        x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x[None, :]), orig, new))[0]
        tn = np.arange(len(y)) / new
        ref = np.sin(2 * np.pi * 1000.0 * tn).astype(np.float32)
        # skip filter-width edges
        m = slice(200, -200)
        err = y[m] - ref[m]
        snr = 10 * np.log10((ref[m] ** 2).mean() / (err**2).mean())
        assert snr > 45.0, f"SNR={snr:.1f} dB"

    def test_above_nyquist_removed(self):
        """Content above the target Nyquist (16 kHz) must be attenuated."""
        orig, new = 48_000, 32_000
        t = np.arange(orig) / orig
        x = np.sin(2 * np.pi * 20_000.0 * t).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x[None, :]), orig, new))[0]
        assert np.sqrt((y[500:-500] ** 2).mean()) < 0.05

    def test_kernel_shape(self):
        k, width = resample_kernel(44_100, 32_000)
        # gcd(44100, 32000)=100 → orig=441, new=320
        assert k.shape[0] == 320
        assert k.shape[1] == 2 * width + 441

    def test_dc_preserved(self):
        x = jnp.ones((1, 48_000), dtype=jnp.float32)
        y = np.asarray(resample(x, 48_000, 32_000))[0]
        np.testing.assert_allclose(y[100:-100], 1.0, atol=1e-3)
