"""Fused log-mel frontend kernel (Pallas/TPU).

The BASELINE.json north star: the ``resample_mean_convnext`` frontend's
STFT + log-mel (reference: torchlibrosa conv-STFT + LogmelFilterBank,
``nn/encoders/convnext.py:160-180``) as ONE TPU kernel.

Why fuse: XLA materializes the (T, 1026) spectrum between the DFT matmul
and the mel matmul (matmul→matmul never fuses), costing ~8 MB of HBM
round-trip per 10 s clip. This kernel keeps the spectrum in VMEM:

    frames (128, 1024) ─MXU→ spec (128, 1280 padded)
      ─VPU→ power = re²+im² (128, 640)
      ─MXU→ mel (128, 256 padded)
      ─VPU→ 10·log10(max(amin, ·)) [optionally × bn_scale + bn_shift]

The per-mel-bin inference BatchNorm (``convnext.py:290-292``) folds into
the same kernel as an affine epilogue, removing another round-trip.

Frequency dims are zero-padded to lane multiples (513→640, 224→256); the
wrapper slices the result. Grid: (B, T/128) with frame blocks DMA'd per
step. ``fused_logmel`` falls back to the jnp reference path on non-TPU
backends (the two are golden-tested against each other).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from conette_tpu.ops.frontend import DEFAULT_LOGMEL, LogMelConfig, _mel_matrix
from conette_tpu.ops.stft import dft_basis, frame_signal

TILE_T = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=4)
def _padded_operands(cfg: LogMelConfig) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(basis (n_fft, 2*Fp), mel (Fp, Mp), Fp, Mp) with lane-padded freq dims."""
    n_freqs = cfg.n_fft // 2 + 1
    fp = _round_up(n_freqs, LANE)
    mp = _round_up(cfg.n_mels, LANE)
    basis = dft_basis(cfg.n_fft)  # (n_fft, 2*n_freqs)
    basis_p = np.zeros((cfg.n_fft, 2 * fp), np.float32)
    basis_p[:, :n_freqs] = basis[:, :n_freqs]
    basis_p[:, fp : fp + n_freqs] = basis[:, n_freqs:]
    mel = _mel_matrix(cfg)  # (n_freqs, n_mels)
    mel_p = np.zeros((fp, mp), np.float32)
    mel_p[:n_freqs, : cfg.n_mels] = mel
    return basis_p, mel_p, fp, mp


def _logmel_kernel(frames_ref, basis_ref, mel_ref, affine_ref, out_ref, *, fp, amin, log_ref, compute_dtype):
    frames = frames_ref[0]  # (TILE_T, n_fft); leading dim is the size-1 batch block
    spec = jnp.dot(
        frames.astype(compute_dtype),
        basis_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    re = spec[:, :fp]
    im = spec[:, fp:]
    power = re * re + im * im
    mel = jnp.dot(
        power.astype(compute_dtype),
        mel_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    log_mel = 10.0 * jnp.log(jnp.maximum(amin, mel)) / np.log(10.0) - log_ref
    scale = affine_ref[0, :]
    shift = affine_ref[1, :]
    out_ref[0] = log_mel * scale[None, :] + shift[None, :]


def fused_logmel_frames(
    frames: jnp.ndarray,
    cfg: LogMelConfig = DEFAULT_LOGMEL,
    bn_scale: jnp.ndarray | None = None,
    bn_shift: jnp.ndarray | None = None,
    interpret: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """(B, T, n_fft) frames → (B, T, n_mels) log-mel via the fused kernel.
    T must be a multiple of TILE_T (the public wrapper pads)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, n_fft = frames.shape
    assert t % TILE_T == 0, f"{t=} not a multiple of {TILE_T}"
    basis_p, mel_p, fp, mp = _padded_operands(cfg)

    affine = np.ones((2, mp), np.float32)
    affine[1] = 0.0
    if bn_scale is not None:
        affine = jnp.asarray(affine)
        affine = affine.at[0, : cfg.n_mels].set(bn_scale.astype(jnp.float32))
        affine = affine.at[1, : cfg.n_mels].set(bn_shift.astype(jnp.float32))
    affine = jnp.asarray(affine)

    log_ref = float(10.0 * np.log10(max(cfg.amin, cfg.ref)))
    kernel = functools.partial(
        _logmel_kernel, fp=fp, amin=cfg.amin, log_ref=log_ref,
        compute_dtype=compute_dtype,
    )
    grid = (b, t // TILE_T)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, TILE_T, n_fft), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((n_fft, 2 * fp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, mp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, mp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_T, mp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, mp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * n_fft * 2 * fp + 2 * b * t * fp * mp,
            bytes_accessed=b * t * (n_fft + mp) * 4,
            transcendentals=b * t * mp,
        ),
    )(
        frames.reshape(b, t, n_fft),
        jnp.asarray(basis_p),
        jnp.asarray(mel_p),
        affine,
    )
    return out[:, :, : cfg.n_mels]


def _kernel_blockspec_squeeze_note() -> None:
    """Block shapes with a leading 1 are squeezed by Mosaic only when the
    kernel indexes accordingly; ``_logmel_kernel`` reads full blocks, so the
    leading batch dim stays in the refs as size-1 and broadcasting handles
    it. (Documented for kernel maintainers.)"""


def fused_logmel(
    x: jnp.ndarray,
    cfg: LogMelConfig = DEFAULT_LOGMEL,
    bn_scale: jnp.ndarray | None = None,
    bn_shift: jnp.ndarray | None = None,
    interpret: bool | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """(B, T_samples) waveform → (B, n_frames, n_mels) log-mel using the
    fused Pallas kernel on TPU, falling back to the jnp path elsewhere.
    Function contract identical to ``ops.frontend.logmel_spectrogram`` (+
    optional folded BN affine)."""
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length)
    b, t, n_fft = frames.shape
    t_pad = _round_up(t, TILE_T)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    frames = jnp.pad(frames, ((0, 0), (0, t_pad - t), (0, 0)))
    out = fused_logmel_frames(
        frames, cfg, bn_scale, bn_shift, interpret=interpret,
        compute_dtype=compute_dtype,
    )
    return out[:, :t]
