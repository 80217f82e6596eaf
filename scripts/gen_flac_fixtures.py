"""Generate the checked-in FLAC/WAV twin fixtures under tests/data/flac/.

Each fixture pair holds IDENTICAL quantized integer samples written through
both containers, so tests can assert `load_audio(x.flac) == load_audio(x.wav)`
bit-for-bit. Deterministic (seeded); re-running must reproduce the same bytes.

If a real `flac` binary is available (connected host), also verify every
generated stream with `flac -t` — the encoder writes correct CRC-8/CRC-16/MD5
so the official decoder must accept them.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from conette_tpu.utils.audio_io import save_wav  # noqa: E402
from conette_tpu.utils.flac import encode_flac_bytes  # noqa: E402

# optional argv override lets the smoke test write into a tmp dir instead of
# touching the checked-in fixtures
OUT_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(os.path.dirname(__file__), "..", "tests", "data", "flac")
)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(1234)
    sr = 16_000
    t = np.arange(sr) / sr  # 1 s

    chirp = np.sin(2 * np.pi * (300 + 800 * t) * t) * 0.5
    noise = rng.standard_normal(sr).astype(np.float64) * 0.1
    tone_l = np.sin(2 * np.pi * 440 * t) * 0.4
    tone_r = np.sin(2 * np.pi * 554 * t) * 0.4

    lim16 = 1 << 15
    cases = {
        # name -> (int samples (C, T), bits, stereo_mode, blocksize)
        "chirp_mono_16": ((chirp * (lim16 - 1))[None].astype(np.int64), 16, "indep", 1024),
        "noise_mono_16": ((noise * (lim16 - 1))[None].astype(np.int64), 16, "indep", 777),
        "stereo_indep_16": (
            np.stack([tone_l, tone_r]) * (lim16 - 1), 16, "indep", 1024),
        "stereo_ls_16": (np.stack([tone_l, tone_r * 0.9 + tone_l * 0.1]) * (lim16 - 1),
                         16, "ls", 1024),
        "stereo_rs_16": (np.stack([tone_l, tone_l * 0.95]) * (lim16 - 1), 16, "rs", 1024),
        "stereo_ms_16": (np.stack([tone_l + noise * 0.2, tone_l - noise * 0.2])
                         * (lim16 - 1) * 0.7, 16, "ms", 1024),
        "chirp_mono_24": ((chirp * ((1 << 23) - 1))[None].astype(np.int64), 24, "indep", 4096),
        "const_mono_16": (np.full((1, 3000), 123, np.int64), 16, "indep", 1024),
    }
    for name, (x, bits, mode, bs) in cases.items():
        x = np.asarray(x).astype(np.int64)
        flac_path = os.path.join(OUT_DIR, f"{name}.flac")
        with open(flac_path, "wb") as f:
            f.write(encode_flac_bytes(x, sr, bits, stereo_mode=mode, blocksize=bs))
        # WAV twin: same ints. save_wav writes 16-bit; for 24-bit write floats
        # through the float scaling so both decode to the same float32.
        wav_path = os.path.join(OUT_DIR, f"{name}.wav")
        if bits == 16:
            _save_wav_int16(wav_path, x.astype("<i2"), sr)
        else:
            _save_wav_int24(wav_path, x, sr)
        print(f"{name}: flac {os.path.getsize(flac_path)} B, wav {os.path.getsize(wav_path)} B")

    flac_bin = shutil.which("flac")
    if flac_bin:
        for name in cases:
            subprocess.run([flac_bin, "-t", os.path.join(OUT_DIR, f"{name}.flac")], check=True)
        print("official `flac -t` verification: all OK")
    else:
        print("no `flac` binary on this host — official verification skipped")


def _save_wav_int16(path: str, pcm: np.ndarray, sr: int) -> None:
    import wave

    with wave.open(path, "wb") as w:
        w.setnchannels(pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.ascontiguousarray(pcm.T).tobytes())


def _save_wav_int24(path: str, x: np.ndarray, sr: int) -> None:
    import wave

    inter = np.ascontiguousarray(x.T.astype("<i4")).view(np.uint8).reshape(-1, 4)
    with wave.open(path, "wb") as w:
        w.setnchannels(x.shape[0])
        w.setsampwidth(3)
        w.setframerate(sr)
        w.writeframes(np.ascontiguousarray(inter[:, :3]).tobytes())


if __name__ == "__main__":
    main()
