"""STFT / power spectrogram as MXU matmuls.

Replaces the reference's ``torchlibrosa.stft.Spectrogram`` (conv1d-based
STFT; wired at ``src/conette/nn/encoders/convnext.py:160-168`` with
n_fft=1024, hop=320, hann window, center=True, reflect padding, power=2).

TPU-first design: instead of FFT or conv, frames are extracted with a single
reshape-free gather and the windowed DFT is applied as ONE dense matmul
``frames (B·T, n_fft) @ basis (n_fft, 2·n_freqs)`` — ideal MXU shapes
(1024×1026), fused by XLA with the subsequent square-add and the mel matmul.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["hann_window", "dft_basis", "frame_signal", "power_spectrogram", "num_frames"]

# Compute the framed DFT via one radix-2 decimation-in-time step: two
# half-size matmuls over the even/odd samples (window baked per-sample into
# each half basis) plus an elementwise twiddle combine. Halves the dominant
# matmul FLOPs (the r2/r3 traces put the DFT matmul at the measured MXU
# ceiling); the combine sits between two matmuls and fuses. Toggleable for
# within-trace A/Bs.
_SPLIT_RADIX = True


def hann_window(win_length: int, dtype: np.dtype = np.float32) -> np.ndarray:
    """Periodic ("fftbins") Hann window, as used by librosa/torchlibrosa."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


@lru_cache(maxsize=8)
def dft_basis(n_fft: int, dtype: str = "float32") -> np.ndarray:
    """Windowed real-DFT basis, shape (n_fft, 2*(n_fft//2+1)).

    Column k       holds  win[n] * cos(2π k n / N)   (real part)
    Column k+nf    holds  win[n] * -sin(2π k n / N)  (imag part)
    matching numpy/torch rfft conventions.
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * k * n / n_fft
    win = hann_window(n_fft, np.float64)[:, None]
    basis = np.concatenate([win * np.cos(angle), win * -np.sin(angle)], axis=1)
    return basis.astype(dtype)


@lru_cache(maxsize=8)
def _split_radix_tables(
    n_fft: int, dtype: str = "float32"
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Radix-2 DIT tables: (half_basis_even, half_basis_odd, cos, sin).

    ``X_k = E_k + e^{-2πik/N} O_k`` where E/O are the N/2-point DFTs of the
    even/odd windowed samples. The half bases are (N/2, 2*(N/4+1)) windowed
    real-DFT matrices (window w[0::2] / w[1::2] baked per-row); cos/sin are
    the (N/2+1,) twiddle factors cos(2πk/N), sin(2πk/N) for k = 0..N/2.
    """
    half = n_fft // 2
    hf = half // 2 + 1  # rfft bins of the half-size DFT
    n = np.arange(half, dtype=np.float64)[:, None]
    k = np.arange(hf, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * k * n / half
    win = hann_window(n_fft, np.float64)
    be = np.concatenate(
        [win[0::2, None] * np.cos(angle), win[0::2, None] * -np.sin(angle)], axis=1
    )
    bo = np.concatenate(
        [win[1::2, None] * np.cos(angle), win[1::2, None] * -np.sin(angle)], axis=1
    )
    kk = np.arange(n_fft // 2 + 1, dtype=np.float64)
    theta = 2.0 * np.pi * kk / n_fft
    return (
        be.astype(dtype),
        bo.astype(dtype),
        np.cos(theta).astype(np.float32),
        np.sin(theta).astype(np.float32),
    )


def _mirror_full(re: jnp.ndarray, im: jnp.ndarray, n_bins: int) -> tuple:
    """Extend the (…, N/4+1) rfft halves of an N/2-point DFT of a REAL
    signal to all ``n_bins = N/2+1`` output bins via conjugate symmetry
    ``E_{N/2-k} = conj(E_k)`` (bin N/2 wraps to bin 0)."""
    hf = re.shape[-1]  # N/4 + 1
    body_re = jnp.flip(re[..., 1 : hf - 1], axis=-1)
    body_im = -jnp.flip(im[..., 1 : hf - 1], axis=-1)
    re_full = jnp.concatenate([re, body_re, re[..., :1]], axis=-1)
    im_full = jnp.concatenate([im, body_im, im[..., :1]], axis=-1)
    assert re_full.shape[-1] == n_bins
    return re_full, im_full


def _split_radix_power(
    frames: jnp.ndarray, n_fft: int, compute_dtype: jnp.dtype
) -> jnp.ndarray:
    """(…, n_fft) windowed-DFT power via one radix-2 DIT step — exactly
    ``|frames @ dft_basis|²`` in f32, at half the matmul FLOPs."""
    be, bo, cos_t, sin_t = _split_radix_tables(n_fft)
    hf = n_fft // 4 + 1
    n_bins = n_fft // 2 + 1
    # even/odd sample split: bit-reshape then stride-1 slices
    fr = frames.reshape(*frames.shape[:-1], n_fft // 2, 2)
    fe, fo = fr[..., 0], fr[..., 1]
    e = jnp.einsum(
        "btn,nf->btf", fe, jnp.asarray(be, compute_dtype),
        preferred_element_type=jnp.float32,
    )
    o = jnp.einsum(
        "btn,nf->btf", fo, jnp.asarray(bo, compute_dtype),
        preferred_element_type=jnp.float32,
    )
    e_re, e_im = _mirror_full(e[..., :hf], e[..., hf:], n_bins)
    o_re, o_im = _mirror_full(o[..., :hf], o[..., hf:], n_bins)
    cos_t = jnp.asarray(cos_t)
    sin_t = jnp.asarray(sin_t)
    # X = E + (cosθ - i sinθ)(ReO + i ImO)
    re = e_re + cos_t * o_re + sin_t * o_im
    im = e_im + cos_t * o_im - sin_t * o_re
    return re * re + im * im


def num_frames(n_samples: int, n_fft: int, hop_length: int) -> int:
    """Frame count with center padding: 1 + n_samples // hop."""
    return 1 + n_samples // hop_length


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """(B, T) waveform → (B, n_frames, n_fft) frames with center reflect pad.

    Framing is expressed as a strided gather over the padded signal; XLA
    lowers it to an efficient dynamic-slice pattern and keeps everything on
    device.
    """
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_out = num_frames(x.shape[1] - 2 * pad, n_fft, hop_length)
    starts = np.arange(n_out) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return x[:, idx]


def power_spectrogram(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 320,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """(B, T) waveform → (B, n_frames, n_freqs) power spectrogram.

    Matches ``torchlibrosa.stft.Spectrogram(power=2)`` with a periodic Hann
    window, center=True and reflect padding.
    """
    n_freqs = n_fft // 2 + 1
    frames = frame_signal(x, n_fft, hop_length).astype(compute_dtype)
    if _SPLIT_RADIX and n_fft % 4 == 0:
        return _split_radix_power(frames, n_fft, compute_dtype)
    basis = jnp.asarray(dft_basis(n_fft), dtype=compute_dtype)
    spec = jnp.einsum(
        "btn,nf->btf", frames, basis, preferred_element_type=jnp.float32
    )
    real, imag = spec[..., :n_freqs], spec[..., n_freqs:]
    return real * real + imag * imag
