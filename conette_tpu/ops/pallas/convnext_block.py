"""Fully-fused ConvNeXt block Pallas TPU kernel.

One ConvNeXt block is ``dwconv7x7 -> LayerNorm -> Linear(C,4C) -> GELU ->
Linear(4C,C) -> layer-scale -> residual`` (reference
``nn/encoders/convnext.py:61-74``). Lowered separately, XLA moves the
activation tensor through HBM ~16 times per block (dwconv r/w, LN 2-3
passes, the 4C MLP intermediate w+r, residual r/w); the round-1 trace
showed LN chains (~73 ms) + dwconv chains (~61 ms) dominating the encoder
at batch 128 while the MXU matmuls ran near spec (~25 ms, PROFILE.md).

This kernel runs the WHOLE block in VMEM per (batch, time-tile) program:

    HBM --(double-buffered async DMA of a time tile + 3-row halo)--> VMEM
      -> 49-tap depthwise stencil, f32 acc (static slices; freq halo via
         an 8-aligned sublane offset into a pre-zeroed work buffer)
      -> LayerNorm over channels (f32 stats, padded lanes masked)
      -> MXU: (t, F, C) @ (C, 4C) -> +b -> tanh-form GELU (see ``_gelu``)
      -> MXU: @ (4C, C) -> +b -> layer-scale -> + residual (the tile
         center, still in VMEM -- no second HBM read)
      -> HBM (one write)

HBM traffic per block drops to ~1 read + 1 write of the activation (plus
halo overlap); the 4C intermediate never leaves VMEM. The DMA for tile
j+1 is issued before computing tile j (two landing slots), so the read
streams behind the MXU/VPU work.

Mosaic DMA slices must be (8, 128)-aligned on the two minor dims, so the
kernel operates on a stage-padded layout: F padded to a multiple of 8 and
C to a multiple of 128, padding zero. A stage pads once, chains its blocks
in the padded layout (the kernel re-zeroes padded F columns on write and
zero C lanes provably stay zero), and slices back at the end --
``models/convnext.py::convnext_features`` does exactly this.

Time-edge tiles reuse a fixed-size clamped DMA window and place rows into
the work buffer with a shift (zero rows at the boundary); single-tile
stages place the whole T directly. Numerics match the unfused JAX block to
bf16 rounding (stencil + LN + matmul accumulation in f32, same cast points
as ``models/layers.py::linear``/``layer_norm``).

Inference-only (the ConvNeXt preprocessor is frozen in this stack; training
consumes pre-encoded embeddings -- SURVEY.md L2/L5), so no VJP is defined.

History: a dwconv7x7+LN-only predecessor kernel (``ops/pallas/dwconv_ln.py``,
removed in r4) validated to bf16 rounding but LOST end-to-end (+80 ms at
batch 128): fusing only the block prefix still leaves the 4C MLP
intermediate making two HBM round trips, and its per-call alignment
pre-pad/unpad plus unpipelined per-tile DMA cost more than the saved LN
passes. The lessons that survived into this kernel: (1) fuse the WHOLE
block so the 4C intermediate never leaves VMEM; (2) keep the stage-padded
(F->8k, C->128k) layout across chained blocks instead of padding per call;
(3) double-buffer the halo DMA behind compute. See PROFILE.md r2/r3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 3  # 7x7 stencil halo
F_OFF = 8  # 8-aligned sublane offset of the real freq columns in `work`
STENCIL_ROWS = 4  # stencil/LN row chunk (keeps the f32 acc in vregs)
# Experiment switches are REAL static jit parameters of
# ``fused_convnext_block_padded`` (ln_mode=, fshift_f32=), not module
# globals: a global read at trace time is invisible to the jit cache, so
# toggling it after a first call silently reuses the stale executable —
# the r4 A/B-script breakage class. Shootout history (PROFILE.md r3):
# ln_mode="mxu" (LN lane stats via a skinny MXU matmul) and
# fshift_f32=True (f32 tap buffers) were both perf-neutral on v5e.
# ln_mode="skip" omits the LN stats entirely — an INVALID-RESULTS timing
# bound used by scripts/ab_s1ln.py to quantify the LN share per stage.
PACK_GAP = 8  # zero columns between packed segments (>= PAD, 8-aligned)

# In-trace measured plans per ConvNeXt-Tiny stage geometry at bf16
# (v5e, batch 128): {(f_pad, cp, h_dim): (tile, mlp_chunk, fshift, pack)}.
# s1 14.0 ms, s2 3.7 ms, s3 4.5 ms, s4 3.7 ms per block at batch 128.
_MEASURED_PLANS = {
    (56, 128, 384): (42, 8, True, 1),
    (32, 256, 768): (42, 8, True, 1),
    (16, 384, 1536): (21, 8, True, 2),
    (8, 768, 3072): (31, 8, False, 1),
}


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _gelu(x: jax.Array) -> jax.Array:
    """GELU in the input dtype via the tanh formulation, with tanh spelled
    through exp (Mosaic lowers exp but neither erf/erfc nor bf16
    comparisons, which rules out the sign/abs-based A&S erf polynomial).
    |gelu_tanh - gelu_erf| <= ~3e-4 absolute -- below the bf16 ulp of the
    surrounding computation, so numerically invisible against the unfused
    exact-erf path at bf16 (golden-tested). Odd-symmetric: exp overflow /
    underflow at large |x| saturates tanh to +-1 exactly."""
    c = lambda v: jnp.asarray(v, x.dtype)
    one = jnp.ones((), x.dtype)
    inner = x * (c(0.7978845608028654) + c(0.035677408136300125) * (x * x))
    e = jnp.exp(inner + inner)
    tanh = one - (c(2.0) / (e + one))
    return c(0.5) * x * (one + tanh)


def pick_t_tile(t: int) -> int | None:
    """Time-tile size: ``t`` itself when t <= 72 (single-tile path — may be
    < 8; ``plan_block``'s sizing check still applies), else the largest
    divisor of ``t`` in [8, 72]; None if ``t`` has no usable divisor
    (caller falls back to the XLA path)."""
    if t <= 72:
        return t
    for tile in range(72, 7, -1):
        if t % tile == 0:
            return tile
    return None


def plan_block(
    t: int, f_pad: int, cp: int, h_dim: int, itemsize: int, b: int | None = None
) -> tuple[int, int | None, bool, int] | None:
    """VMEM sizing plan: (t_tile, mlp_chunk_rows, use_fshift, pack), or
    None when no tiling fits the ~16 MB budget (e.g. the C=768/H=3072
    stage at f32, whose weights alone are 18.9 MB -- callers fall back to
    the XLA path).

    ``pack`` processes that many batch rows per program, laid side by side
    along freq with zero gaps: narrow-F stages (F=16) run ~2.8x below the
    wide stages' per-element rate because sublane relayouts/loads amortize
    over too few columns -- packing restores a wide effective F.
    Preference order per measured shootouts (PROFILE.md r2): fshift for
    effective F >= 24, tiles <= 32 rows otherwise."""

    weights_b = 2 * cp * h_dim * itemsize
    best = pick_t_tile(t)
    if best is None:
        return None
    tile_candidates = [best] + [
        tile for tile in range(best - 1, 15, -1) if t % tile == 0
    ]

    def sizing_any(tile: int, chunk: int | None, pack: int) -> tuple[int, int]:
        """(resident bytes, extra fshift bytes) for a candidate plan —
        shared by the measured-plan fast path and the generic estimator."""
        fp_all = (pack - 1) * (f_pad + PACK_GAP) + f_pad
        width = _round8(F_OFF + fp_all + PAD)
        win = t if tile == t else tile + 2 * PAD
        fshift_b = 7 * (tile + 2 * PAD) * fp_all * cp * itemsize
        mlp_rows_ = tile if chunk is None else chunk
        # f32 h + compute-dtype h over the unchunked tile or one chunk
        mlp_temp = mlp_rows_ * fp_all * h_dim * (4 + itemsize)
        resident = weights_b + mlp_temp + itemsize * cp * (
            2 * pack * win * f_pad  # DMA landing slots
            + (tile + 2 * PAD) * width  # work
            + tile * fp_all  # y
            + 2 * pack * tile * f_pad  # double-buffered out blocks
        )
        return resident, fshift_b

    # measured-best configurations for the ConvNeXt-Tiny stage geometries
    # at bf16 (in-trace shootouts on v5e, batch 128 -- PROFILE.md r2);
    # the estimator below is the generic fallback. Keyed by
    # (f_pad, cp, h_dim): (preferred_tile, chunk, fshift, pack).
    if itemsize == 2:
        preferred = _MEASURED_PLANS.get((f_pad, cp, h_dim))
        if preferred is not None:
            pref_tile, chunk, fshift, pack = preferred
            if pack > 1 and (b is None or b % pack):
                pack = 1
            tile = min(tile_candidates, key=lambda x: abs(x - pref_tile))
            # the snap to the nearest divisor can land on an unmeasured
            # tile (e.g. a prime T): re-validate against the same VMEM
            # budgets the generic estimator enforces, else fall through
            resident, fshift_b = sizing_any(tile, chunk, pack)
            fits = (
                resident + fshift_b < 12 * 1024 * 1024
                if fshift
                else resident < 14.5 * 1024 * 1024
            )
            if tile >= 16 and fits:
                return tile, chunk, fshift, pack

    pack_candidates = [1]
    if b is not None and f_pad <= 16:
        for cand in (2,) if f_pad == 16 else (4, 2):
            if b % cand == 0:
                pack_candidates.insert(0, cand)

    def plan_for(pack: int):
        fp_all = (pack - 1) * (f_pad + PACK_GAP) + f_pad

        def sizing(tile: int, chunk: int | None):
            return sizing_any(tile, chunk, pack)

        def chunks_for(tile: int, sub8: bool = False):
            # unchunked when small; otherwise a ~2 MB-temp chunk, then the
            # minimal 8-row chunk as a tighter fallback. ``sub8`` is a
            # LAST-RESORT second pass (tried only after every >=8-row
            # candidate failed, so existing plans are untouched): the
            # kernel's MLP loop takes any static chunk size, and 4/2-row
            # chunks admit weight-heavy shapes whose 8-row f32 MLP temps
            # bust VMEM (e.g. the TRANSPOSED C=768/H=3072 stage, 9.4 MB
            # of resident weights) — more loop trips beat no plan at all
            if sub8:
                return [4, 2]
            if weights_b + tile * fp_all * 4 * h_dim <= 10 * 1024 * 1024:
                return [None, 8]
            return [max(8, (2 * 1024 * 1024) // (fp_all * h_dim * 4)), 8]

        # fshift pays for wide freq extents only (measured: +2.5-3 ms/block
        # at F=56/32, -0.2 at F=16, neutral at F=8 -- sublane relayouts
        # amortize over more columns). Without fshift, tiles <= 32 rows
        # measured best (s3 tile 21: 4.9 ms/block vs ~8 at tile 63).
        want_fshift = fp_all >= 24
        candidates = tile_candidates
        if not want_fshift:
            small = [tile for tile in candidates if tile <= 32]
            candidates = small + [t_ for t_ in candidates if t_ > 32]
        fallback = None
        for sub8 in (False, True):
            for tile in candidates:
                for chunk in chunks_for(tile, sub8):
                    resident, fshift_b = sizing(tile, chunk)
                    if want_fshift and resident + fshift_b < 12 * 1024 * 1024:
                        return tile, chunk, True, pack
                    if fallback is None and resident < 14.5 * 1024 * 1024:
                        fallback = (tile, chunk, False, pack)
                if not want_fshift and fallback is not None:
                    return fallback
            if fallback is not None:
                return fallback
        return fallback

    for pack in pack_candidates:
        plan = plan_for(pack)
        if plan is not None:
            return plan
    return None


def transposed_stage_plan(
    t: int, f_real: int, cp: int, h_dim: int, itemsize: int, b: int | None
) -> tuple[int, int, tuple[int, int | None, bool, int]] | None:
    """Plan for running a stage TRANSPOSED (time and freq swapped): the
    kernel's time axis becomes the real freq extent (``f_real`` rows, no
    padding — always a single tile for ConvNeXt-Tiny's narrow-F stages)
    and its freq axis becomes the time extent padded to 8. Returns
    ``(new_t, new_f_pad, plan)`` or None when no transposed plan fits.

    The 7x7 depthwise stencil is T/F-symmetric (cross-correlation with a
    square tap grid), so transposing the layout only requires transposing
    the tap axes of the depthwise weight; LN/MLP/scale/residual act per
    position or per channel and are layout-blind."""
    new_t = f_real
    new_f_pad = _round8(t)
    plan = plan_block(new_t, new_f_pad, cp, h_dim, itemsize, b)
    if plan is None:
        return None
    return new_t, new_f_pad, plan


def stage_transpose_wins(
    t: int,
    f_pad: int,
    f_real: int,
    cp: int,
    h_dim: int,
    itemsize: int,
    b: int | None,
    margin: float = 0.05,
) -> bool:
    """Auto heuristic: transpose a stage when the transposed layout's
    geometric efficiency (real elements / padded stencil elements,
    including pack gaps) beats the normal plan's by ``margin`` AND the
    transposed plan does not give up a freq-shift the normal plan has.
    At the production ConvNeXt-Tiny shapes this selects stages 3 and 4
    (s3: pack-2 with 8-col gaps covers 28 real of 40 stencil columns =
    0.70 vs 62/64 = 0.97 transposed; s4: 7/8 with 24-col work rows vs
    31/32 transposed — on-chip A/B r5h: 61.3 -> 53.8 ms). s1 is already
    gap-free; s2 passes the efficiency test (28/32 -> 125/128) but its
    transposed plan has no VMEM room for fshift while the normal plan
    runs fshift over F=32 — measured loss 95.2 -> 122.4 ms (r5h), hence
    the fshift guard."""
    cur = plan_block(t, f_pad, cp, h_dim, itemsize, b)
    if cur is None:
        return False
    _, _, cur_fshift, pack = cur
    fp_all = (pack - 1) * (f_pad + PACK_GAP) + f_pad
    eff_cur = pack * f_real / fp_all
    tr = transposed_stage_plan(t, f_real, cp, h_dim, itemsize, b)
    if tr is None:
        return False
    new_t, new_f_pad, (_, _, tr_fshift, _) = tr
    if cur_fshift and not tr_fshift:
        return False
    eff_tr = (t * f_real) / (new_t * new_f_pad)
    return eff_tr > eff_cur + margin


def pad_fc(x: jax.Array) -> jax.Array:
    """Stage-entry padding: (B, T, F, C) -> F to a multiple of 8, C to a
    multiple of 128 (zeros). The fused blocks chain in this layout."""
    b, t, f, c = x.shape
    return jnp.pad(x, ((0, 0), (0, 0), (0, (-f) % 8), (0, (-c) % 128)))


def pad_channels(a: jax.Array, c_full: int, axis: int = -1) -> jax.Array:
    """Zero-pad ``axis`` of a weight/bias up to ``c_full`` lanes."""
    c = a.shape[axis]
    if c == c_full:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis % a.ndim] = (0, c_full - c)
    return jnp.pad(a, widths)


def _fused_block_kernel(
    x_hbm_ref,  # (B, T, Fp, Cp) in HBM (stage-padded layout)
    w_ref,  # (7, 7, Cp) f32 depthwise weights
    b_ref,  # (1, Cp) f32
    g_ref,  # (1, Cp) f32 LN gamma
    beta_ref,  # (1, Cp) f32 LN beta
    w1_ref,  # (Cp, H) compute dtype
    b1_ref,  # (1, H) f32
    w2_ref,  # (H, Cp) compute dtype
    b2_ref,  # (1, Cp) f32
    scale_ref,  # (1, Cp) compute dtype (layer scale)
    out_ref,  # (1, t_tile, Fp, Cp) VMEM out block
    have_ref,  # scratch (2, win_rows, Fp, Cp) double-buffered DMA landing
    work_ref,  # scratch (t_tile + 6, W, Cp) halo'd stencil buffer
    y_ref,  # scratch (t_tile, Fp, Cp) LN output (compute dtype)
    fshift_ref,  # scratch (7, t_tile + 6, Fp, Cp) aligned freq shifts, or None
    dma_sems,  # (2,) DMA semaphores
    *,
    t_tile: int,
    n_t: int,
    t_total: int,
    f_real: int,
    c_real: int,
    eps: float,
    mlp_chunk_rows: int | None,
    use_fshift: bool,
    pack: int,
    ln_mode: str,
):
    b = pl.program_id(0)  # program batch index (covers `pack` batch rows)
    j = pl.program_id(1)
    n_b = pl.num_programs(0)
    f_pad = out_ref.shape[2]
    step = b * n_t + j
    slot = step % 2

    single = n_t == 1  # static: whole T fits one tile (window = T rows)
    win_rows = have_ref.shape[2]

    def seg_off(k: int) -> int:
        # packed segments sit side by side along freq, separated by
        # PACK_GAP zero columns (>= the 3-col stencil halo, 8-aligned)
        return F_OFF + k * (f_pad + PACK_GAP)

    def window_start(jj):
        # fixed-size DMA window clamped inside [0, T); edge tiles place
        # rows into the work buffer with a shift instead
        if single:
            return 0
        return jnp.clip(jj * t_tile - PAD, 0, t_total - win_rows)

    def dmas(bb, jj, s):
        # aligned dims only: HBM row-window -> full (rows, Fp, Cp) per
        # packed batch row
        return [
            pltpu.make_async_copy(
                x_hbm_ref.at[bb * pack + k, pl.ds(window_start(jj), win_rows), :, :],
                have_ref.at[s, k],
                dma_sems.at[s, k],
            )
            for k in range(pack)
        ]

    # one-time init: zero the work buffer -- the freq halo strips and
    # inter-segment gaps and the time halo rows stay zero forever;
    # per-tile copies only ever write the data regions / edge rows
    @pl.when(step == 0)
    def _():
        work_ref[...] = jnp.zeros_like(work_ref)
        for dma in dmas(b, j, slot):
            dma.start()

    # prefetch the next program's windows into the other slot
    @pl.when(step + 1 < n_b * n_t)
    def _():
        nb = b + (j + 1) // n_t
        nj = (j + 1) % n_t
        for dma in dmas(nb, nj, (step + 1) % 2):
            dma.start()

    for dma in dmas(b, j, slot):
        dma.wait()

    # place the windows into the halo'd work buffer (VMEM -> VMEM, ~1 MB)
    cp = have_ref.shape[4]
    zrows = jnp.zeros((PAD, f_pad, cp), work_ref.dtype)
    if single:
        for k in range(pack):
            work_ref[PAD : PAD + t_total, seg_off(k) : seg_off(k) + f_pad, :] = (
                have_ref[slot, k]
            )
    else:

        @pl.when(jnp.logical_and(j != 0, j != n_t - 1))
        def _():
            for k in range(pack):
                work_ref[:, seg_off(k) : seg_off(k) + f_pad, :] = have_ref[slot, k]

        @pl.when(j == 0)
        def _():
            for k in range(pack):
                work_ref[PAD:win_rows, seg_off(k) : seg_off(k) + f_pad, :] = (
                    have_ref[slot, k, 0 : win_rows - PAD]
                )
                work_ref[0:PAD, seg_off(k) : seg_off(k) + f_pad, :] = zrows

        @pl.when(j == n_t - 1)
        def _():
            for k in range(pack):
                work_ref[0 : win_rows - PAD, seg_off(k) : seg_off(k) + f_pad, :] = (
                    have_ref[slot, k, PAD:win_rows]
                )
                work_ref[
                    win_rows - PAD : win_rows, seg_off(k) : seg_off(k) + f_pad, :
                ] = zrows

    # ---- 49-tap depthwise stencil + bias + LayerNorm. Two measured-on-v5e
    # design points (PROFILE.md r2): (1) taps are evaluated on small row
    # chunks so the f32 accumulator stays vector-register-resident (Mosaic
    # executes each elementwise op as a full VMEM pass otherwise -- chunk 16
    # ran 2.2x slower than chunk 4); (2) when VMEM allows, the 7 freq
    # shifts are materialized once per tile into `fshift_ref` so every tap
    # is a sublane-ALIGNED load (7 relayouts per tile instead of 7 per
    # chunk; another ~1.2x). LN stats in f32; result stored in compute
    # dtype in y_ref (the MLP consumes it at that precision anyway).
    # Padded F columns produce garbage that is masked out at the write
    # below; their inputs are zero.
    fp_all = (pack - 1) * (f_pad + PACK_GAP) + f_pad  # packed col extent
    if use_fshift:
        for df in range(7):
            fshift_ref[df] = work_ref[
                :, df + F_OFF - PAD : df + F_OFF - PAD + fp_all, :
            ].astype(fshift_ref.dtype)
    for r0 in range(0, t_tile, STENCIL_ROWS):
        rows = min(STENCIL_ROWS, t_tile - r0)
        acc = None
        if use_fshift:
            for df in range(7):
                for dt in range(7):
                    term = fshift_ref[df, r0 + dt : r0 + dt + rows].astype(
                        jnp.float32
                    ) * w_ref[dt, df, :]
                    acc = term if acc is None else acc + term
        else:
            for df in range(7):
                sh = work_ref[
                    r0 : r0 + rows + 2 * PAD,
                    df + F_OFF - PAD : df + F_OFF - PAD + fp_all,
                    :,
                ]
                for dt in range(7):
                    term = sh[dt : dt + rows].astype(jnp.float32) * w_ref[dt, df, :]
                    acc = term if acc is None else acc + term
        acc = acc + b_ref[0]

        # LayerNorm over the real channels. Padded lanes of acc are exactly
        # zero (zero inputs x zero weights + zero bias), so plain full-lane
        # sums equal the real-lane sums -- no lane masking needed; variance
        # via E[x^2] - m^2 in f32 (single reduction pass each).
        inv_c = 1.0 / c_real
        if ln_mode == "skip":
            # INVALID-RESULTS timing bound: no stats, no normalization —
            # isolates the lane-reduction share for the per-stage roofline
            # (scripts/ab_s1ln.py). Never routed by production code.
            yc = acc
        else:
            if ln_mode == "mxu":
                # lane reductions as one skinny MXU matmul: [acc, acc*acc] @
                # ones(C, 1) -- cross-lane VPU reduction trees replaced by a
                # systolic pass (shootout-gated; see PROFILE.md r3)
                ones = jnp.ones((acc.shape[-1], 1), jnp.float32)
                stacked = jnp.concatenate([acc, acc * acc], axis=0)
                sums = jax.lax.dot_general(
                    stacked, ones,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                mean = sums[: acc.shape[0]] * inv_c
                sumsq = sums[acc.shape[0] :] * inv_c
            else:
                mean = jnp.sum(acc, axis=-1, keepdims=True) * inv_c
                sumsq = jnp.sum(acc * acc, axis=-1, keepdims=True) * inv_c
            var = sumsq - mean * mean
            yc = (acc - mean) * jax.lax.rsqrt(var + eps)
        # gamma is zero on padded lanes, so yc's nonzero -mean there is
        # re-zeroed by the affine step
        y_ref[r0 : r0 + rows] = (yc * g_ref[0] + beta_ref[0]).astype(y_ref.dtype)

    # ---- MLP on the MXU (4C intermediate never leaves VMEM). For wide
    # stages (C=768, H=3072: 9.4 MB of weights resident) the f32 MLP temps
    # push past the 16 MB VMEM budget, so rows are processed in chunks.
    cdt = w1_ref.dtype

    def mlp_rows(y_rows):
        h = jax.lax.dot_general(
            y_rows.astype(cdt),
            w1_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # tanh-form GELU (Mosaic lowers neither erf/erfc nor the bf16
        # comparisons an erf polynomial needs -- see _gelu; |err| ~3e-4,
        # below bf16 ulp): bias in f32, then GELU evaluated in compute
        # dtype (bf16) -- the tanh-form error and bf16 rounding are both
        # below bf16 ulp, and the elementwise passes over the 4C
        # intermediate move half the bytes of an f32 evaluation
        h = _gelu((h + b1_ref[0]).astype(cdt))
        z = jax.lax.dot_general(
            h,
            w2_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (z + b2_ref[0]).astype(out_ref.dtype) * scale_ref[0]

    col = (
        jax.lax.broadcasted_iota(jnp.int32, (1, f_pad, cp), 1)
        if f_pad != f_real
        else None
    )

    def emit(r0, rows, z_rows):
        # z col 0 maps to work col F_OFF; extract each packed segment
        for k in range(pack):
            z0 = k * (f_pad + PACK_GAP)
            shortcut = work_ref[
                PAD + r0 : PAD + r0 + rows, seg_off(k) : seg_off(k) + f_pad, :
            ]
            res = shortcut + z_rows[:, z0 : z0 + f_pad, :]
            if col is not None:
                # re-zero padded freq columns so blocks chain in padded
                # layout (gap columns of z are garbage and simply dropped)
                res = jnp.where(col < f_real, res, jnp.zeros_like(res))
            out_ref[k, r0 : r0 + rows] = res

    if mlp_chunk_rows is None:
        emit(0, t_tile, mlp_rows(y_ref[:]))
    else:
        for r0 in range(0, t_tile, mlp_chunk_rows):
            rows = min(mlp_chunk_rows, t_tile - r0)
            emit(r0, rows, mlp_rows(y_ref[r0 : r0 + rows]))


@functools.partial(
    jax.jit,
    static_argnames=(
        "f_real", "c_real", "eps", "interpret", "_plan", "ln_mode", "fshift_f32"
    ),
)
def fused_convnext_block_padded(
    x: jax.Array,
    f_real: int,
    c_real: int,
    dw_weight: jax.Array,
    dw_bias: jax.Array,
    ln_weight: jax.Array,
    ln_bias: jax.Array,
    pw1_weight: jax.Array,
    pw1_bias: jax.Array,
    pw2_weight: jax.Array,
    pw2_bias: jax.Array,
    layer_scale: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
    _plan: tuple[int, int | None, bool] | None = None,
    ln_mode: str = "vpu",
    fshift_f32: bool = False,
) -> jax.Array:
    """Fused block in the stage-padded layout: ``x`` is (B, T, Fp, Cp) with
    Fp % 8 == 0, Cp % 128 == 0 and zero padding beyond ``f_real`` /
    ``c_real``. Weights are passed unpadded (padded here); the output stays
    in the same padded layout so blocks chain without repacking."""
    b, t, f_pad, cp = x.shape
    if f_pad % 8 or cp % 128:
        raise ValueError(f"stage-padded input required, got F={f_pad} C={cp}")
    if dw_weight.ndim == 4:
        dw_weight = dw_weight[:, :, 0, :]
    cdt = x.dtype
    h_dim = pw1_weight.shape[1]
    plan = _plan or plan_block(t, f_pad, cp, h_dim, jnp.dtype(cdt).itemsize, b)
    if plan is None:
        raise ValueError(
            f"fused block does not fit VMEM for T={t} F={f_pad} C={cp} "
            f"H={h_dim} dtype={cdt} (use the XLA path)"
        )
    if len(plan) == 3:  # _plan overrides may omit pack
        plan = (*plan, 1)
    t_tile, mlp_chunk_rows, use_fshift, pack = plan
    if b % pack:
        pack = 1
    n_t = t // t_tile
    fp_all = (pack - 1) * (f_pad + PACK_GAP) + f_pad
    width = _round8(F_OFF + fp_all + PAD)

    kernel = functools.partial(
        _fused_block_kernel,
        t_tile=t_tile,
        n_t=n_t,
        t_total=t,
        f_real=f_real,
        c_real=c_real,
        eps=eps,
        mlp_chunk_rows=mlp_chunk_rows,
        use_fshift=use_fshift,
        pack=pack,
        ln_mode=ln_mode,
    )
    if ln_mode not in ("vpu", "mxu", "skip"):
        raise ValueError(f"unknown ln_mode {ln_mode!r}")
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    win_rows = t if n_t == 1 else t_tile + 2 * PAD
    return pl.pallas_call(
        kernel,
        grid=(b // pack, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # manual halo DMA
            full((7, 7, cp)),
            full((1, cp)),
            full((1, cp)),
            full((1, cp)),
            full((cp, h_dim)),
            full((1, h_dim)),
            full((h_dim, cp)),
            full((1, cp)),
            full((1, cp)),
        ],
        out_specs=pl.BlockSpec(
            (pack, t_tile, f_pad, cp),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, f_pad, cp), cdt),
        scratch_shapes=[
            pltpu.VMEM((2, pack, win_rows, f_pad, cp), cdt),
            pltpu.VMEM((t_tile + 2 * PAD, width, cp), cdt),
            pltpu.VMEM((t_tile, fp_all, cp), cdt),
            pltpu.VMEM(
                (7, t_tile + 2 * PAD, fp_all, cp) if use_fshift else (1, 1, 8, 128),
                jnp.float32 if (fshift_f32 and use_fshift) else cdt,
            ),
            pltpu.SemaphoreType.DMA((2, pack)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * f_real * c_real * (49 + 8 * c_real)
            + 8 * b * t * f_real * c_real,
            bytes_accessed=2 * b * t * f_pad * cp * x.dtype.itemsize,
            transcendentals=b * t * f_real * 4 * c_real,
        ),
        interpret=interpret,
    )(
        x,
        pad_channels(dw_weight.astype(jnp.float32), cp),
        pad_channels(dw_bias.reshape(1, -1).astype(jnp.float32), cp),
        pad_channels(ln_weight.reshape(1, -1).astype(jnp.float32), cp),
        pad_channels(ln_bias.reshape(1, -1).astype(jnp.float32), cp),
        pad_channels(pw1_weight.astype(cdt), cp, axis=0),
        pw1_bias.reshape(1, h_dim).astype(jnp.float32),
        pad_channels(pw2_weight.astype(cdt), cp, axis=1),
        pad_channels(pw2_bias.reshape(1, -1).astype(jnp.float32), cp),
        pad_channels(layer_scale.reshape(1, -1).astype(cdt), cp),
    )


def fused_convnext_block(
    x: jax.Array,
    dw_weight: jax.Array,
    dw_bias: jax.Array,
    ln_weight: jax.Array,
    ln_bias: jax.Array,
    pw1_weight: jax.Array,
    pw1_bias: jax.Array,
    pw2_weight: jax.Array,
    pw2_bias: jax.Array,
    layer_scale: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
    ln_mode: str = "vpu",
    fshift_f32: bool = False,
) -> jax.Array:
    """Whole ConvNeXt block (dwconv7x7+LN+MLP+scale+residual) in one fused
    pass over HBM; unpadded convenience wrapper (pads, runs, slices).
    Stage loops should pad once with ``pad_fc`` and chain
    ``fused_convnext_block_padded`` instead.

    :param x: (B, T, F, C) NHWC activations (bf16 or f32).
    :param dw_weight: (7, 7, 1, C) HWIO depthwise kernel or (7, 7, C).
    :returns: (B, T, F, C), dtype of ``x``.
    """
    _, _, f, c = x.shape
    out = fused_convnext_block_padded(
        pad_fc(x),
        f,
        c,
        dw_weight,
        dw_bias,
        ln_weight,
        ln_bias,
        pw1_weight,
        pw1_bias,
        pw2_weight,
        pw2_bias,
        layer_scale,
        eps=eps,
        interpret=interpret,
        ln_mode=ln_mode,
        fshift_f32=fshift_f32,
    )
    return out[:, :, :f, :c]
