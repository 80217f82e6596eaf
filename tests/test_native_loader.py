"""Native (C++) audio loader parity vs the pure-Python path."""

import numpy as np
import pytest

from conette_tpu.native import loader
from conette_tpu.ops.resample import resample_numpy, resampled_length
from conette_tpu.utils.audio_io import load_wav, save_wav

pytestmark = pytest.mark.skipif(
    not loader.is_available(), reason="native library not built"
)


@pytest.fixture()
def stereo_wav(tmp_path):
    rng = np.random.default_rng(0)
    sig = rng.uniform(-0.8, 0.8, size=(2, 44_100)).astype(np.float32)
    fpath = str(tmp_path / "s.wav")
    save_wav(fpath, sig, 44_100)
    return fpath


def test_wav_info(stereo_wav):
    sr, ch, frames = loader.wav_info(stereo_wav)
    assert (sr, ch, frames) == (44_100, 2, 44_100)


def test_decode_matches_python(stereo_wav):
    native = loader.load_resample_mono(stereo_wav, target_sr=0)
    py, sr = load_wav(stereo_wav)
    np.testing.assert_allclose(native, py.mean(axis=0), atol=1e-6)


def test_resample_matches_python_kernel(stereo_wav):
    native = loader.load_resample_mono(stereo_wav, target_sr=32_000)
    py, sr = load_wav(stereo_wav)
    ref = resample_numpy(py.mean(axis=0), 44_100, 32_000)
    assert len(native) == resampled_length(44_100, 44_100, 32_000)
    np.testing.assert_allclose(native, ref, atol=2e-5)


def test_standalone_resample():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(48_000).astype(np.float32) * 0.2
    native = loader.resample(x, 48_000, 32_000)
    ref = resample_numpy(x, 48_000, 32_000)
    np.testing.assert_allclose(native, ref, atol=2e-5)


def test_load_batch_parallel(stereo_wav):
    out = loader.load_batch([stereo_wav] * 4, target_sr=32_000, workers=4)
    assert len(out) == 4
    np.testing.assert_array_equal(out[0], out[3])
