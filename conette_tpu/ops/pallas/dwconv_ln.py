"""Fused depthwise-conv7x7 + LayerNorm Pallas TPU kernel.

The ConvNeXt block opens with ``dwconv7x7 -> LayerNorm`` (reference
``nn/encoders/convnext.py:61-74``); both ops are HBM-bandwidth bound on TPU
(the depthwise conv is VPU stencil work, the LN is reduction passes + a
normalize pass). Run separately, XLA moves the activation tensor through
HBM ~5 times (dwconv read+write, LN read x2 + write). This kernel tiles the
time axis, DMAs each tile + 3-row halo from a pre-padded copy into VMEM,
and does the whole chain in one pass:

    HBM --async DMA (tile+halo)--> VMEM -> [49 shifted multiply-adds
    (f32 acc) -> bias -> LN over channels -> affine] -> HBM

Channel counts (96..768) ride the lane dimension; the 7x7 taps are static
slices of the halo tile, so the stencil vectorizes on the VPU. Grid is
(B, T/T_tile); per-program VMEM stays ~3 MB for every ConvNeXt stage.

Numerics match the unfused path to bf16 rounding (LN statistics in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 3  # 7x7 kernel halo


def _pick_t_tile(t: int) -> int:
    """Largest divisor of ``t`` keeping the halo tile under ~1 MB rows."""
    for tile in (64, 63, 56, 42, 36, 32, 31, 28, 21, 16, 14, 9, 8, 7):
        if t % tile == 0:
            return tile
    return t


def _dwconv_ln_kernel(
    x_hbm_ref,  # (B, T+6, F+6, C) pre-padded input, stays in HBM/ANY
    w_ref,  # (7, 7, C)
    b_ref,  # (1, C)
    g_ref,  # (1, C)
    beta_ref,  # (1, C)
    out_ref,  # (1, T_tile, F, C) VMEM output block
    halo_ref,  # scratch (T_tile+6, F+6, C)
    dma_sem,
    *,
    t_tile: int,
    c_real: int,
    eps: float,
):
    b = pl.program_id(0)
    tb = pl.program_id(1)
    f = out_ref.shape[2]

    copy = pltpu.make_async_copy(
        x_hbm_ref.at[b, pl.ds(tb * t_tile, t_tile + 2 * PAD)],
        halo_ref,
        dma_sem,
    )
    copy.start()
    copy.wait()

    c_full = out_ref.shape[3]
    acc = jnp.zeros((t_tile, f, c_full), jnp.float32)
    for dt in range(7):
        for df in range(7):
            tap = halo_ref[dt : dt + t_tile, df : df + f, :].astype(jnp.float32)
            acc = acc + tap * w_ref[dt, df, :].astype(jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)

    # LayerNorm over the REAL channels, f32 statistics; lanes beyond
    # ``c_real`` are zero padding (weights/bias padded with zeros) and are
    # excluded from the statistics with a lane mask
    if c_full == c_real:
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        centered = acc - mean
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 2)
        valid = lane < c_real
        mean = jnp.sum(jnp.where(valid, acc, 0.0), axis=-1, keepdims=True) / c_real
        centered = acc - mean
        var = (
            jnp.sum(jnp.where(valid, centered * centered, 0.0), axis=-1, keepdims=True)
            / c_real
        )
    y = centered * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_dwconv7x7_ln(
    x: jax.Array,
    dw_weight: jax.Array,
    dw_bias: jax.Array,
    ln_weight: jax.Array,
    ln_bias: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """``LayerNorm(dwconv7x7(x) + bias)`` in one fused pass.

    :param x: (B, T, F, C) NHWC activations.
    :param dw_weight: (7, 7, 1, C) HWIO depthwise kernel (as stored in the
        ConvNeXt param pytree) or (7, 7, C).
    :returns: (B, T, F, C), dtype of ``x``.
    """
    b, t, f, c = x.shape
    if dw_weight.ndim == 4:
        dw_weight = dw_weight[:, :, 0, :]
    t_tile = _pick_t_tile(t)

    # DMA slices need an 8-aligned sublane (second-minor) extent and a
    # 128-aligned lane (minor) extent: pad F so F + 2*PAD rounds to a
    # multiple of 8 and C to a multiple of 128 (zero lanes never feed a
    # tap and are masked out of the LN statistics)
    f_halo = f + 2 * PAD
    f_pad_extra = (-f_halo) % 8
    c_pad = (-c) % 128
    c_full = c + c_pad
    x_padded = jnp.pad(
        x, ((0, 0), (PAD, PAD), (PAD, PAD + f_pad_extra), (0, c_pad))
    )
    dw_weight = jnp.pad(dw_weight, ((0, 0), (0, 0), (0, c_pad)))
    dw_bias = jnp.pad(dw_bias, (0, c_pad))
    ln_weight = jnp.pad(ln_weight, (0, c_pad))
    ln_bias = jnp.pad(ln_bias, (0, c_pad))

    kernel = functools.partial(
        _dwconv_ln_kernel, t_tile=t_tile, c_real=c, eps=eps
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, t // t_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            pl.BlockSpec((7, 7, c_full), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_full), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_full), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_full), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, f, c_full), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, f, c_full), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_tile + 2 * PAD, f_halo + f_pad_extra, c_full), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * f * c * 49 + 8 * b * t * f * c,
            bytes_accessed=2 * b * t * f * c * x.dtype.itemsize,
            transcendentals=b * t * f,
        ),
        interpret=interpret,
    )(
        x_padded,
        dw_weight.astype(x.dtype),
        dw_bias.reshape(1, c_full),
        ln_weight.reshape(1, c_full),
        ln_bias.reshape(1, c_full),
    )
    return out[..., :c] if c_pad else out
