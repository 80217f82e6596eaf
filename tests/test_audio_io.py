"""WAV I/O tests: roundtrip fidelity + parity with python wave module."""

import numpy as np

from conette_tpu.utils.audio_io import generate_sample_wav, load_wav, save_wav


def test_wav_roundtrip_16bit(tmp_path):
    rng = np.random.default_rng(0)
    sig = (rng.uniform(-0.9, 0.9, size=(2, 4000))).astype(np.float32)
    fpath = str(tmp_path / "x.wav")
    save_wav(fpath, sig, 16_000)
    loaded, sr = load_wav(fpath)
    assert sr == 16_000
    assert loaded.shape == (2, 4000)
    # 16-bit quantization error bound (scale 32767/32768 + rounding)
    assert np.max(np.abs(loaded - sig)) < 2.0 / 32768


def test_wav_mono_1d_input(tmp_path):
    sig = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.5
    fpath = str(tmp_path / "m.wav")
    save_wav(fpath, sig, 32_000)
    loaded, sr = load_wav(fpath)
    assert sr == 32_000
    assert loaded.shape == (1, 8000)


def test_generate_sample_wav_deterministic(tmp_path):
    f1 = generate_sample_wav(str(tmp_path / "a.wav"))
    f2 = generate_sample_wav(str(tmp_path / "b.wav"))
    x1, sr1 = load_wav(f1)
    x2, sr2 = load_wav(f2)
    assert sr1 == sr2 == 44_100
    assert np.array_equal(x1, x2)
    assert x1.shape[1] == 441_000


def test_load_reference_format_float32(tmp_path):
    """Hand-built IEEE-float WAV decodes correctly."""
    import struct

    sig = np.linspace(-1, 1, 100).astype("<f4")
    data = sig.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 48_000, 48_000 * 4, 4, 32)
    riff = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    fpath = tmp_path / "f32.wav"
    fpath.write_bytes(riff)
    loaded, sr = load_wav(str(fpath))
    assert sr == 48_000
    np.testing.assert_allclose(loaded[0], sig, atol=1e-7)
