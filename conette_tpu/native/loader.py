"""ctypes bindings for the native audio loader (native/audio_loader.cpp).

Native twin of the reference's torchaudio C++ decode+resample path. The
shared library is built by ``make -C native`` (or
``scripts/build_native.sh``); when absent, callers fall back to the pure
Python/numpy implementations (``utils/audio_io.py`` + ``ops/resample.py``)
with identical numerics. The ctypes calls release the GIL, so a thread
pool parallelizes corpus decode (the reference's DataLoader-worker
equivalent).
"""

from __future__ import annotations

import ctypes
import logging
import math
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import numpy as np

pylog = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libconette_audio.so")
_lib: ctypes.CDLL | None = None


def _load_lib() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as err:
        pylog.warning(f"native loader unavailable: {err}")
        return None
    lib.conette_wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.conette_wav_info.restype = ctypes.c_int
    lib.conette_load_resample_mono.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.conette_load_resample_mono.restype = ctypes.c_int
    lib.conette_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.conette_resample.restype = ctypes.c_int
    _lib = lib
    return lib


def is_available() -> bool:
    return _load_lib() is not None


_ERROR_MESSAGES = {
    -1: "cannot open file",
    -2: "not a RIFF/WAVE file",
    -3: "unsupported WAV encoding",
    -4: "invalid argument/buffer",
    -5: "internal decoder error",
}


def _raise(fn: str, path: str, rc: int) -> None:
    reason = _ERROR_MESSAGES.get(rc, f"error code {rc}")
    raise OSError(f"{fn}({path!r}): {reason}")


def wav_info(path: str) -> tuple[int, int, int]:
    """(sample_rate, channels, num_frames)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native loader not built (run make -C native)")
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    n = ctypes.c_int64()
    rc = lib.conette_wav_info(path.encode(), sr, ch, n)
    if rc != 0:
        _raise("conette_wav_info", path, rc)
    return sr.value, ch.value, n.value


def load_resample_mono(path: str, target_sr: int = 0) -> np.ndarray:
    """Decode → channel mean → resample in native code; (time,) float32.

    Non-RIFF containers (FLAC) decode through the pure-Python codec and
    still resample through the native kernel, so the numerics match the
    WAV fast path exactly.
    """
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native loader not built (run make -C native)")
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic != b"RIFF":
        from conette_tpu.utils.audio_io import load_audio

        try:
            wav, sr = load_audio(path)
        except ValueError as err:  # keep the native OSError contract
            raise OSError(str(err)) from err
        mono = wav.mean(axis=0).astype(np.float32)
        if target_sr <= 0 or sr == target_sr:
            return mono
        return resample(mono, sr, target_sr)
    sr, _, frames = wav_info(path)
    tsr = target_sr if target_sr > 0 else sr
    capacity = int(math.ceil(frames * tsr / sr)) + 16
    out = np.empty((capacity,), np.float32)
    out_len = ctypes.c_int64()
    rc = lib.conette_load_resample_mono(
        path.encode(),
        ctypes.c_int32(target_sr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(capacity),
        out_len,
    )
    if rc != 0:
        _raise("conette_load_resample_mono", path, rc)
    return out[: out_len.value].copy()


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native loader not built (run make -C native)")
    x = np.ascontiguousarray(x, np.float32)
    capacity = int(math.ceil(len(x) * target_sr / orig_sr)) + 16
    out = np.empty((capacity,), np.float32)
    out_len = ctypes.c_int64()
    rc = lib.conette_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(x)),
        ctypes.c_int32(orig_sr),
        ctypes.c_int32(target_sr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(capacity),
        out_len,
    )
    if rc != 0:
        raise OSError(f"conette_resample failed ({rc})")
    return out[: out_len.value].copy()


def load_batch(paths: Sequence[str], target_sr: int, workers: int = 8) -> list[np.ndarray]:
    """Parallel corpus decode (GIL released inside the native call)."""
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(lambda p: load_resample_mono(p, target_sr), paths))
