"""Polyphase windowed-sinc resampling on device.

TPU-native replacement for the reference's ``torchaudio.functional.resample``
(native C++/CUDA; invoked at ``huggingface/preprocessor.py:134-141`` and
``transforms/get.py:58-60``) with identical math: a bank of ``new_freq``
phase filters of Hann-windowed sincs (lowpass_filter_width=6, rolloff=0.99),
applied as ONE strided convolution — which XLA tiles onto the MXU — followed
by a phase-interleave reshape.

The filter bank is built once per (orig_freq, new_freq) pair on the host and
cached; shapes stay static so every (src_sr → 32 kHz) pair compiles to a
single fused XLA program.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["resample", "resample_kernel", "resampled_length"]


@lru_cache(maxsize=32)
def resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    dtype: str = "float32",
) -> tuple[np.ndarray, int]:
    """Build the polyphase filter bank.

    Returns (kernels (new_freq/gcd, kernel_width), width) where
    ``kernels[p]`` is the filter producing output phase ``p``.
    """
    gcd = math.gcd(orig_freq, new_freq)
    orig_freq //= gcd
    new_freq //= gcd

    base_freq = min(orig_freq, new_freq) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig_freq / base_freq))

    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t *= np.pi
    scale = base_freq / orig_freq
    kernels = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernels *= window * scale
    return kernels.astype(dtype), width


def resampled_length(n_samples: int, orig_freq: int, new_freq: int) -> int:
    gcd = math.gcd(orig_freq, new_freq)
    return int(math.ceil((new_freq // gcd) * n_samples / (orig_freq // gcd)))


def resample_numpy(
    waveform: np.ndarray, orig_freq: int, new_freq: int
) -> np.ndarray:
    """Host-side twin of :func:`resample` (identical filter bank, BLAS
    matmul). Used on the data-loading path where per-clip lengths vary and
    device compilation churn would dominate."""
    if orig_freq == new_freq:
        return waveform
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    kernels, width = resample_kernel(orig_freq, new_freq)
    shape = waveform.shape
    length = shape[-1]
    x = waveform.reshape(-1, length).astype(np.float32)
    x = np.pad(x, ((0, 0), (width, width + orig)))
    k_len = kernels.shape[1]
    windows = np.lib.stride_tricks.sliding_window_view(x, k_len, axis=-1)[
        :, ::orig, :
    ]  # (B, frames, K)
    y = windows @ kernels.T  # (B, frames, new)
    y = y.reshape(x.shape[0], -1)
    target = resampled_length(length, orig_freq, new_freq)
    return y[:, :target].reshape(*shape[:-1], target)


def resample(
    waveform: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample (..., time) waveform from ``orig_freq`` to ``new_freq``.

    Numerically equivalent to ``torchaudio.functional.resample`` with the
    default ``sinc_interp_hann`` method.
    """
    if orig_freq == new_freq:
        return waveform

    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd

    kernels, width = resample_kernel(orig_freq, new_freq, lowpass_filter_width, rolloff)

    shape = waveform.shape
    length = shape[-1]
    x = waveform.reshape(-1, 1, length)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))

    filters = jnp.asarray(kernels, dtype=waveform.dtype)[:, None, :]  # (new, 1, K)
    y = lax.conv_general_dilated(
        x,
        filters,
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    # (B, new, frames) → interleave phases → (B, frames*new)
    y = jnp.swapaxes(y, 1, 2).reshape(x.shape[0], -1)
    target = resampled_length(length, orig_freq, new_freq)
    y = y[:, :target]
    return y.reshape(*shape[:-1], target)
