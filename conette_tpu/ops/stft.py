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

# A radix-2 decimation-in-time split (two half-size matmuls over even/odd
# samples + a twiddle combine) was tried in r4 to halve the DFT matmul
# FLOPs. Within-session A/B on the chip (batch 384, f32 frontend): split
# 82.6 ms vs plain 57.6 ms median; in the production bf16 path the same
# session's profile measured the split at 56.7 ms ≈ the plain path. The
# mirror/flip/twiddle elementwise stage breaks the frame→DFT→square→mel
# fusion chain, so the halved MXU FLOPs buy at best nothing (the frontend
# is HBM-bound) and cost 43% in f32. Retired; keep the single dense matmul.


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


def num_frames(n_samples: int, n_fft: int, hop_length: int) -> int:
    """Frame count with center padding: 1 + n_samples // hop."""
    return 1 + n_samples // hop_length


def frame_signal(
    x: jnp.ndarray, n_fft: int, hop_length: int, impl: str = "slices"
) -> jnp.ndarray:
    """(B, T) waveform → (B, n_frames, n_fft) frames with center reflect pad.

    ``impl="slices"`` (default) reshapes the padded signal into hop-sized
    blocks and builds each frame as a concatenation of ``ceil(n_fft/hop)``
    shifted block slices — every op is a contiguous copy, no gather
    lowering. ``impl="gather"`` keeps the strided-gather formulation for
    A/B comparison (scripts/ab_frontend.py). Both produce identical values.
    """
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    tp = x.shape[1]
    n_out = num_frames(tp - 2 * pad, n_fft, hop_length)
    if impl == "gather":
        starts = np.arange(n_out) * hop_length
        idx = starts[:, None] + np.arange(n_fft)[None, :]
        return x[:, idx]
    # frame i = padded[i·hop : i·hop + n_fft]: with the signal viewed as
    # (nb, hop) blocks, that is blocks i..i+m-1 plus the first ``rem``
    # samples of block i+m (frame starts are always hop multiples)
    m, rem = divmod(n_fft, hop_length)
    required = (n_out - 1) * hop_length + n_fft
    nb = -(-required // hop_length)
    if nb * hop_length > tp:
        x = jnp.pad(x, ((0, 0), (0, nb * hop_length - tp)))
    else:
        x = x[:, : nb * hop_length]
    blocks = x.reshape(x.shape[0], nb, hop_length)
    parts = [blocks[:, j : j + n_out] for j in range(m)]
    if rem:
        parts.append(blocks[:, m : m + n_out, :rem])
    return jnp.concatenate(parts, axis=-1)


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
    basis = jnp.asarray(dft_basis(n_fft), dtype=compute_dtype)
    spec = jnp.einsum(
        "btn,nf->btf", frames, basis, preferred_element_type=jnp.float32
    )
    real, imag = spec[..., :n_freqs], spec[..., n_freqs:]
    return real * real + imag * imag
