"""FLAC codec + container dispatch tests (VERDICT r3 missing #3).

Reference behavior: the preprocessor loads anything torchaudio/sox reads
(``/root/reference/src/conette/huggingface/preprocessor.py:79-80``); WavCaps
ships FLAC. These tests pin the pure-Python codec (``conette_tpu/utils/
flac.py``) and the ``load_audio`` magic-byte dispatch:

* checked-in FLAC fixtures decode bit-equal to their WAV twins
  (``tests/data/flac/``, regenerable via ``scripts/gen_flac_fixtures.py``);
* encode→decode round-trips are lossless over bit depths, stereo
  decorrelation modes, block sizes, and odd lengths;
* CRC-8 / CRC-16 / MD5 corruption is detected, not silently decoded;
* the preprocessor accepts ``.flac`` inputs end-to-end (native loader
  fallback path included);
* when a real ``flac`` binary exists (connected host), every fixture passes
  the official ``flac -t`` verifier (gated).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from conette_tpu.utils.audio_io import load_audio, load_wav, save_wav
from conette_tpu.utils.flac import (
    decode_flac_bytes,
    encode_flac_bytes,
    load_flac,
    save_flac,
)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "data", "flac")
FIXTURE_NAMES = sorted(
    f[:-5] for f in os.listdir(FIXTURE_DIR) if f.endswith(".flac")
)


@pytest.mark.parametrize("name", FIXTURE_NAMES)
def test_fixture_decodes_bit_equal_to_wav_twin(name):
    flac_wave, flac_sr = load_audio(os.path.join(FIXTURE_DIR, f"{name}.flac"))
    wav_wave, wav_sr = load_audio(os.path.join(FIXTURE_DIR, f"{name}.wav"))
    assert flac_sr == wav_sr
    assert flac_wave.shape == wav_wave.shape
    assert flac_wave.dtype == np.float32 and wav_wave.dtype == np.float32
    assert (flac_wave == wav_wave).all()


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("mode", ["indep", "ls", "rs", "ms"])
def test_roundtrip_lossless(bits, mode):
    rng = np.random.default_rng(bits)
    lim = 1 << (bits - 1)
    t = np.arange(5_111)
    left = (np.sin(2 * np.pi * t / 100.0) * (lim // 2)).astype(np.int64)
    right = rng.integers(-lim // 4, lim // 4, len(t)) + left // 2
    x = np.stack([left, right])
    data = encode_flac_bytes(x, 22050, bits, stereo_mode=mode, blocksize=512)
    dec, sr, b = decode_flac_bytes(data)
    assert sr == 22050 and b == bits
    assert (dec == x).all()


def test_roundtrip_mono_odd_length_and_blocksizes():
    rng = np.random.default_rng(7)
    x = rng.integers(-2000, 2000, 3_333)[None]
    for bs in (192, 256, 577, 4096):
        dec, sr, _ = decode_flac_bytes(encode_flac_bytes(x, 32000, 16, blocksize=bs))
        assert (dec == x).all() and sr == 32000


def test_float_scaling_matches_torchaudio_convention():
    x = np.array([[-32768, -1, 0, 1, 16384, 32767]], np.int64)
    data = encode_flac_bytes(x, 16000, 16)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.flac")
        with open(p, "wb") as f:
            f.write(data)
        wave, sr = load_flac(p)
    assert sr == 16000
    np.testing.assert_array_equal(
        wave[0], np.array(x[0], np.float32) / 32768.0
    )


def test_save_flac_roundtrip_within_half_lsb(tmp_path):
    rng = np.random.default_rng(3)
    # keep |x| < 1: +1.0 itself is unrepresentable in symmetric int16 (clips
    # to 32767 with a full-LSB error), which is quantizer behavior, not codec
    wav = (rng.standard_normal((2, 10_000)) * 0.3).clip(-0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "x.flac")
    save_flac(p, wav, 44100, stereo_mode="ms")
    dec, sr = load_flac(p)
    assert sr == 44100
    assert np.abs(dec - wav).max() <= 0.5 / 32768 + 1e-7


def test_crc_corruption_detected(tmp_path):
    x = np.arange(4096, dtype=np.int64)[None] % 100
    data = bytearray(encode_flac_bytes(x, 16000, 16))
    # corrupt a byte deep in the frame body (past the 4+4+34 byte header)
    data[len(data) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac_bytes(bytes(data))


def test_md5_corruption_detected():
    x = np.arange(1000, dtype=np.int64)[None] % 100
    data = bytearray(encode_flac_bytes(x, 16000, 16))
    # STREAMINFO MD5 = bytes [4+4+18, 4+4+34) — flip one bit there; frame
    # CRCs still pass, only the decoded-audio MD5 check may catch it
    data[4 + 4 + 20] ^= 0x01
    with pytest.raises(ValueError, match="MD5"):
        decode_flac_bytes(bytes(data))
    # with verification off it decodes fine
    dec, _, _ = decode_flac_bytes(bytes(data), verify_md5=False)
    assert (dec == x).all()


def test_load_audio_dispatches_on_magic_not_extension(tmp_path):
    x = np.arange(500, dtype=np.int64)[None] % 50
    p = str(tmp_path / "actually_flac.wav")  # wrong extension on purpose
    with open(p, "wb") as f:
        f.write(encode_flac_bytes(x, 8000, 16))
    wave, sr = load_audio(p)
    assert sr == 8000 and wave.shape == (1, 500)

    bad = str(tmp_path / "bad.xyz")
    with open(bad, "wb") as f:
        f.write(b"ABCD" + b"\x00" * 64)
    with pytest.raises(ValueError, match="Unsupported audio container"):
        load_audio(bad)

    # OggS containers now dispatch to the lossy backend; junk payload is a
    # codec error, not an unsupported-container error
    ogg_junk = str(tmp_path / "bad.ogg")
    with open(ogg_junk, "wb") as f:
        f.write(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not Vorbis"):
        load_audio(ogg_junk)


def test_preprocessor_accepts_flac(tmp_path):
    """`.flac` input produces the same features as its `.wav` twin —
    the user-facing gap from VERDICT r3 missing #3."""
    from conette_tpu.huggingface.preprocessor import CoNeTTEPreprocessor

    rng = np.random.default_rng(11)
    wav = (rng.standard_normal(16_000) * 0.2).clip(-1, 1).astype(np.float32)
    wav_q = np.clip(np.rint(wav * 32768.0), -32768, 32767).astype(np.int64)
    wp = str(tmp_path / "a.wav")
    fp = str(tmp_path / "a.flac")
    save_wav(wp, (wav_q / 32768.0).astype(np.float32), 16_000)
    with open(fp, "wb") as f:
        f.write(encode_flac_bytes(wav_q[None], 16_000, 16))
    # both containers hold identical ints → identical decode
    a, sra = load_audio(wp)
    b, srb = load_audio(fp)
    assert sra == srb and (a == b).all()

    pre = CoNeTTEPreprocessor(use_buckets=False)
    xw, lw = pre.load_resample(wp)
    xf, lf = pre.load_resample(fp)
    assert (lw == lf).all()
    np.testing.assert_array_equal(xw, xf)


def test_native_loader_flac_fallback(tmp_path):
    from conette_tpu.native import loader as native_loader

    if not native_loader.is_available():
        pytest.skip("native loader not built")
    rng = np.random.default_rng(13)
    wav = (rng.standard_normal((2, 12_000)) * 0.2).clip(-1, 1).astype(np.float32)
    wav_q = np.clip(np.rint(wav * 32768.0), -32768, 32767).astype(np.int64)
    wp = str(tmp_path / "b.wav")
    fp = str(tmp_path / "b.flac")
    _write_wav_int16(wp, wav_q, 48_000)
    with open(fp, "wb") as f:
        f.write(encode_flac_bytes(wav_q, 48_000, 16, stereo_mode="ms"))
    mw = native_loader.load_resample_mono(wp, 32_000)
    mf = native_loader.load_resample_mono(fp, 32_000)
    np.testing.assert_allclose(mw, mf, atol=1e-6)


def _write_wav_int16(path, pcm, sr):
    import wave

    with wave.open(path, "wb") as w:
        w.setnchannels(pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.ascontiguousarray(pcm.T.astype("<i2")).tobytes())


@pytest.mark.skipif(shutil.which("flac") is None, reason="no official flac binary")
def test_official_flac_accepts_our_streams(tmp_path):
    for name in FIXTURE_NAMES:
        subprocess.run(
            ["flac", "-t", os.path.join(FIXTURE_DIR, f"{name}.flac")],
            check=True,
            capture_output=True,
        )


def test_frame_sr_code_cross_checked_against_streaminfo():
    # the frame header carries its own sample-rate code (16000 -> code 5);
    # corrupting STREAMINFO's 20-bit sr field (streaminfo bytes 10-12) must
    # now be caught by the frame/STREAMINFO cross-check, not silently decoded
    # at the wrong rate
    x = np.arange(1000, dtype=np.int64)[None] % 100
    data = bytearray(encode_flac_bytes(x, 16000, 16))
    data[4 + 4 + 11] ^= 0x10  # inside the sr field; frame CRCs unaffected
    with pytest.raises(ValueError, match="sample rate"):
        decode_flac_bytes(bytes(data))


def test_empty_input_roundtrip():
    x = np.zeros((1, 0), np.int64)
    dec, sr, bits = decode_flac_bytes(encode_flac_bytes(x, 16000, 16))
    assert dec.shape == (1, 0) and sr == 16000 and bits == 16


def test_partition_order_exceeding_block_rejected():
    # RFC 9639: (blocksize >> partition_order) must exceed the predictor
    # order; a malformed stream violating it must raise, not misalign the
    # residual buffer (negative first-partition count)
    from conette_tpu.utils.flac import _BitReader, _decode_residual

    # method=0 (2 bits), partition order=2 (4 bits) -> 4 partitions;
    # blocksize 16 -> part_len 4 <= order 4
    raw = bytearray(64)
    raw[0] = 0b00_0010_00  # method 0, part_order 2, then rice params/zeros
    with pytest.raises(ValueError, match="first partition"):
        _decode_residual(_BitReader(bytes(raw)), blocksize=16, order=4)
