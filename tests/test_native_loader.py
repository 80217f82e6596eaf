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


@pytest.mark.skipif(not loader.is_available(), reason="native lib not built")
def test_malformed_wavs_rejected(tmp_path):
    """Hardening (ADVICE r1): undersized fmt chunks, chunk sizes beyond the
    file, zero bits/channels/sample-rate, and garbage must all return clean
    error codes — no over-read, no bad_alloc abort."""
    import struct

    def wav(fmt_chunk, data=b"\x00" * 8):
        body = b"WAVE" + fmt_chunk + b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    fmt16 = lambda ch, sr, bits: struct.pack("<HHIIHH", 1, ch, sr, 0, 2, bits)
    cases = {
        "tiny_fmt": wav(b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"),
        "huge_data": b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt16(1, 32000, 16)
        + b"data" + struct.pack("<I", 0xFFFFFF00) + b"\x00" * 8,
        "zero_bits": wav(b"fmt " + struct.pack("<I", 16) + fmt16(1, 32000, 0)),
        "zero_channels": wav(b"fmt " + struct.pack("<I", 16) + fmt16(0, 32000, 16)),
        "zero_sr": wav(b"fmt " + struct.pack("<I", 16) + fmt16(1, 0, 16)),
        "empty": b"",
        "garbage": bytes(range(64)),
    }
    for name, blob in cases.items():
        p = tmp_path / f"{name}.wav"
        p.write_bytes(blob)
        with pytest.raises(OSError):
            loader.load_resample_mono(str(p), 32000)
