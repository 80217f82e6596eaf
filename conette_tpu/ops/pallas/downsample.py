"""Fused ConvNeXt downsample-seam Pallas TPU kernel (LN + 2x2/s2 conv).

Between stages the reference applies ``LayerNorm(C)`` then
``Conv2d(C, 2C, kernel=2, stride=2)`` (``nn/encoders/convnext.py:203-236``).
Lowered separately on TPU that seam costs ~4 HBM passes over the previous
stage's full activation (LN read+write, conv read, out write) plus — on the
fused-block fast path — a slice-out-of-padded-layout copy before and a
re-pad copy after (``models/convnext.py::convnext_features``). At batch 128
the r3 trace put stem+downsamples+heads at ~14 ms of the ~164 ms device
budget (PROFILE.md).

This kernel consumes the stage-padded layout the fused blocks chain in
(F→8k, C→128k, zero padding) directly and emits the next stage's padded
input, all in ONE pass per (batch, out-time-tile) program:

    HBM --(double-buffered DMA of 2*t_tile input rows)--> VMEM
      -> LayerNorm over real channels (padded lanes are exactly zero, so
         full-lane sums / c_real give the real stats; zero-padded gamma
         re-zeroes padded lanes)
      -> 4 patch matmuls (i,j in {0,1}^2) @ W_ij on the MXU, f32
         accumulation, + bias, x row mask
      -> HBM (one write)

So HBM traffic per seam drops from ~4 passes + 2 layout copies to
1 read + 1 write, and the pad/unpad copies disappear entirely.

Mosaic imposes two access-pattern rules that shape the design (the first
revision of this kernel violated them and failed to compile on hardware):
HBM DMA slices must keep the second-minor (sublane) extent 8-aligned, and
vector slices must be stride-1. So:

- The input keeps its NATIVE (B, T, Fp, Cp) layout — Fp is stage-padded and
  therefore always 8-aligned, so slicing only (batch, time) majors for the
  DMA is legal. (The first revision bit-reshaped freq pairs into lanes,
  which put F/2 — 28 for the stage1→2 seam — in sublanes and could not be
  DMA-sliced at all.)
- The TIME parity of the 2x2 patch is a free major-dim split of the loaded
  value: (2*t_tile, Fp, Cp) → (t_tile, 2, Fp, Cp), then an index on dim 1.
- The FREQ parity is a one-hot SELECTION MATMUL on the MXU: S_j (F2p, Fp)
  with S_j[g, 2g+j] = 1 for g < f2_real, applied as a t-batched
  dot_general. Rows g ≥ f2_real are all-zero, so the padded output freq
  rows come out zero for free; the conv bias is masked to real rows. The
  selection FLOPs are ≤ a third of the seam's own conv matmul FLOPs, and
  the seam is HBM-bound, not MXU-bound.

Odd input T is handled like the conv (floor): the last input row feeds
nothing (the DMA simply never reads it). Inference-only, like the block
kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conette_tpu.ops.pallas.convnext_block import pad_channels


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _round128(n: int) -> int:
    return -(-n // 128) * 128


# Hardware-validated plans: these (t2, f_pad, cp, c2p, itemsize) → tile
# choices compiled under Mosaic and ran on the real chip (2026-08-19 seam
# A/B session, on-chip goldens 3/3 + the bench's default-on seam path), so
# they are ground truth regardless of what the analytic estimate below
# says. The bench/production 10 s-clip geometry lands exactly here.
_VALIDATED_PLANS: dict[tuple[int, int, int, int, int], int] = {
    (125, 56, 128, 256, 2): 25,  # seam 1→2, bf16
    (62, 32, 256, 384, 2): 62,  # seam 2→3, bf16
    (31, 16, 384, 768, 2): 31,  # seam 3→4, bf16
}


def plan_downsample(
    t2: int, f_pad: int, cp: int, c2p: int, itemsize: int
) -> int | None:
    """Pick the output-time tile (a divisor of ``t2``) whose buffers fit
    the VMEM budget; None when even the smallest divisor does not fit.

    Hardware-validated geometries come from ``_VALIDATED_PLANS``; everything
    else goes through a conservative analytic estimate. The estimate counts
    the normalized-value cast buffer and the per-parity picked copies that
    the first revision omitted, and keeps ~4 MiB of the 16 MiB VMEM as
    headroom for Mosaic's own temporaries — an under-estimate here fails
    Mosaic compile at RUNTIME on the production path (which, unlike
    bench.py, has no XLA-seam fallback wrapper), so unproven geometries err
    toward the unfused path instead.
    """
    key = (t2, f_pad, cp, c2p, itemsize)
    if key in _VALIDATED_PLANS:
        return _VALIDATED_PLANS[key]
    f2p = _round8(f_pad // 2) if f_pad >= 2 else 0
    if f2p == 0:
        return None
    for tile in [t2] + [d for d in range(min(t2 - 1, 128), 7, -1) if t2 % d == 0]:
        if tile > 128:
            continue
        resident = (
            itemsize * 2 * (2 * tile * f_pad * cp)  # double-buffered DMA slots
            + 4 * 2 * (tile * f_pad * cp)  # f32 LN values (x, x·x reuse)
            + itemsize * (2 * tile * f_pad * cp)  # normalized yn cast buffer
            + itemsize * 2 * (tile * f2p * f_pad)  # broadcast selection mats
            + itemsize * 2 * (tile * f2p * cp)  # per-parity picked copies
            + itemsize * (tile * f2p * cp)  # selected rows
            + itemsize * 4 * cp * c2p  # conv weights
            + 4 * tile * f2p * c2p  # f32 matmul accumulator
            + itemsize * tile * f2p * c2p  # out block
        )
        if resident < 12 * 1024 * 1024:
            return tile
    return None


def _fused_downsample_kernel(
    x_hbm_ref,  # (B, T, Fp, Cp) HBM — native stage-padded layout
    g_ref,  # (1, Cp) f32 LN gamma (zero-padded)
    beta_ref,  # (1, Cp) f32 LN beta (zero-padded)
    sel_ref,  # (2, F2p, Fp) compute-dtype one-hot freq-parity selectors
    w_ref,  # (4, Cp, C2p) compute-dtype conv weights, patch-major (i*2+j)
    b_ref,  # (1, C2p) f32 conv bias (zero-padded, masked to real rows)
    mask_ref,  # (F2p, 1) f32 1/0 real-output-row mask
    out_ref,  # (1, t_tile, F2p, C2p) VMEM out block
    have_ref,  # scratch (2, 2*t_tile, Fp, Cp) double-buffered DMA landing
    dma_sems,  # (2,) DMA semaphores
    *,
    t_tile: int,
    n_t: int,
    c_real: int,
    eps: float,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_b = pl.num_programs(0)
    step = b * n_t + j
    slot = step % 2

    def dma(bb, jj, s):
        return pltpu.make_async_copy(
            x_hbm_ref.at[bb, pl.ds(2 * jj * t_tile, 2 * t_tile)],
            have_ref.at[s],
            dma_sems.at[s],
        )

    @pl.when(step == 0)
    def _():
        dma(b, j, slot).start()

    @pl.when(step + 1 < n_b * n_t)
    def _():
        nb = b + (j + 1) // n_t
        nj = (j + 1) % n_t
        dma(nb, nj, (step + 1) % 2).start()

    dma(b, j, slot).wait()

    cdt = w_ref.dtype
    inv_c = 1.0 / c_real

    # LayerNorm over channels (lanes). Padded C lanes are exactly zero so
    # full-lane sums / c_real equal the real-lane stats; the zero-padded
    # gamma re-zeroes those lanes after the affine. Padded F rows (zeros)
    # come out as `beta` rows, but the selection matrices never pick them:
    # real output rows g < f2_real only read input rows 2g+j < f_real.
    x = have_ref[slot].astype(jnp.float32)  # (2*t_tile, Fp, Cp)
    mean = jnp.sum(x, axis=-1, keepdims=True) * inv_c
    sumsq = jnp.sum(x * x, axis=-1, keepdims=True) * inv_c
    var = sumsq - mean * mean
    yn = ((x - mean) * jax.lax.rsqrt(var + eps) * g_ref[0] + beta_ref[0]).astype(cdt)

    # time parity: a free major-dim split + index
    fp, cp = yn.shape[1], yn.shape[2]
    yn = yn.reshape(t_tile, 2, fp, cp)

    f2p = sel_ref.shape[1]
    acc = None
    for jj in range(2):
        # freq parity: t-batched one-hot selection matmul (F2p, Fp)@(Fp, Cp)
        sel = jnp.broadcast_to(sel_ref[jj][None], (t_tile, f2p, fp))
        for i in range(2):
            picked = jax.lax.dot_general(
                sel,
                yn[:, i],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(cdt)  # (t_tile, F2p, Cp)
            term = jax.lax.dot_general(
                picked,
                w_ref[i * 2 + jj],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
    # masked bias: padded output rows stay exactly zero (selection rows are
    # zero, so acc is already zero there — the mask only strips the bias)
    z = ((acc + b_ref[0]) * mask_ref[:, :1][None]).astype(out_ref.dtype)
    out_ref[0] = z


@functools.partial(
    jax.jit,
    static_argnames=("f_real", "c_real", "eps", "interpret", "_tile"),
)
def fused_downsample_padded(
    x: jax.Array,
    f_real: int,
    c_real: int,
    ln_weight: jax.Array,
    ln_bias: jax.Array,
    conv_weight: jax.Array,
    conv_bias: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
    _tile: int | None = None,
) -> jax.Array:
    """LN + Conv2d(k=2, s=2) over a stage-padded (B, T, Fp, Cp) input.

    :param conv_weight: (2, 2, C, C2) HWIO.
    :returns: (B, T//2, round8(f_real//2), round128(C2)) in the stage-padded
        layout (zero padding beyond ``f_real//2`` / ``C2``), dtype of ``x``.
    """
    b, t, f_pad, cp = x.shape
    if f_pad % 8 or cp % 128:
        raise ValueError(f"stage-padded input required, got F={f_pad} C={cp}")
    if f_real % 2:
        raise ValueError(f"odd real freq extent {f_real} unsupported")
    c2 = conv_weight.shape[-1]
    c2p = _round128(c2)
    t2 = t // 2
    f2_real = f_real // 2
    f2p = _round8(f2_real)
    cdt = x.dtype
    tile = _tile or plan_downsample(t2, f_pad, cp, c2p, jnp.dtype(cdt).itemsize)
    if tile is None:
        raise ValueError(
            f"fused downsample does not fit VMEM for T={t} F={f_pad} C={cp} "
            f"C2={c2p} dtype={cdt} (use the XLA path)"
        )
    n_t = t2 // tile

    # one-hot freq-parity selectors: S[j, g, 2g+j] = 1 for g < f2_real —
    # 0/1 values are exact in any compute dtype
    sel = np.zeros((2, f2p, f_pad), np.float32)
    g = np.arange(f2_real)
    sel[0, g, 2 * g] = 1.0
    sel[1, g, 2 * g + 1] = 1.0

    mask = np.zeros((f2p, 1), np.float32)
    mask[:f2_real] = 1.0

    # patch-major (i*2+j, Cp, C2p), channel-padded with zeros
    w = conv_weight.reshape(4, conv_weight.shape[2], c2)
    w = pad_channels(pad_channels(w.astype(cdt), cp, axis=1), c2p, axis=2)

    kernel = functools.partial(
        _fused_downsample_kernel,
        t_tile=tile,
        n_t=n_t,
        c_real=c_real,
        eps=eps,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # manual DMA
            full((1, cp)),
            full((1, cp)),
            full((2, f2p, f_pad)),
            full((4, cp, c2p)),
            full((1, c2p)),
            full((f2p, 1)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, f2p, c2p), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t2, f2p, c2p), cdt),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * tile, f_pad, cp), cdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t2 * f2_real * 4 * c_real * c2 + 8 * b * t * f_real * c_real,
            bytes_accessed=(b * t * f_pad * cp + b * t2 * f2p * c2p)
            * jnp.dtype(cdt).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        x,
        pad_channels(ln_weight.reshape(1, -1).astype(jnp.float32), cp),
        pad_channels(ln_bias.reshape(1, -1).astype(jnp.float32), cp),
        jnp.asarray(sel, cdt),
        w,
        pad_channels(conv_bias.reshape(1, -1).astype(jnp.float32), c2p),
        jnp.asarray(mask),
    )
