#!/usr/bin/env python
"""Per-stage encoder roofline (VERDICT r4 next #3).

For each fused-ConvNeXt-block stage geometry (batch 128, 10 s clips —
the trace shapes from PROFILE.md addendum 1) this measures, all WITHIN ONE
process (the chip is time-sliced; only within-session comparisons are
valid):

1. ``block_ms`` — per-block time of the production Pallas fused block,
   isolated by differencing two chain lengths (y = block(y) applied N1 vs
   N2 times per dispatch), which cancels the ~30 ms relay dispatch tax and
   any fixed per-dispatch overhead;
2. ``anchor`` — the chip's achieved **load+FMA issue rate** for the same
   access pattern, measured as an XLA 49-tap 1-D stencil over an
   HBM-resident array of the same element count (49 overlapping slice
   loads + FMAs per element, unfoldable), plus a pure HBM stream rate
   (copy) — together these bound what ANY formulation of the dwconv+LN
   stencil could achieve at that shape;
3. ``pct_of_ceiling`` — block VPU-side time vs the anchor-implied floor,
   after subtracting the MLP's MXU time at the session-measured matmul
   rate (the 4C MLP is MXU work, not stencil work).

A stage under ~80% of its ceiling has kernel headroom; stages at ceiling
close the 850-clips/s question as chip-tenancy-bound with data
(PROFILE.md r5). Reference anchor for what this stack replaces:
``/root/reference/src/conette/nn/encoders/convnext.py:302-322``.

Usage: python scripts/roofline_stages.py [--batch 128] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, T, f_real, c_real, n_blocks_in_stage) at batch 128, 10 s
STAGES = [
    ("s1", 250, 56, 96, 3),
    ("s2", 125, 28, 192, 3),
    ("s3", 62, 14, 384, 9),
    ("s4", 31, 7, 768, 3),
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chains", type=int, nargs=2, default=(2, 8))
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from conette_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    from conette_tpu.ops.pallas.convnext_block import (
        fused_convnext_block_padded,
        pad_fc,
    )

    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16
    # CPU smoke path (tests/test_ab_scripts.py): Mosaic only lowers on TPU —
    # run the kernel in interpret mode and shrink the anchors; numbers are
    # meaningless there, only the machinery is being exercised
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    interpret = not on_tpu
    anchor_rows = 32_000 if on_tpu else 64
    anchor_w = 7168 if on_tpu else 256

    def block_weights(c: int):
        def t(*s):
            return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.02)

        return dict(
            dw_weight=t(7, 7, c), dw_bias=t(c),
            ln_weight=jnp.ones((c,), jnp.float32), ln_bias=jnp.zeros((c,), jnp.float32),
            pw1_weight=t(c, 4 * c), pw1_bias=t(4 * c),
            pw2_weight=t(4 * c, c), pw2_bias=t(c),
            layer_scale=jnp.full((c,), 1e-6, jnp.float32),
        )

    def timed(fn, *fn_args, iters: int) -> float:
        # Every target returns a SCALAR as its first leaf: executables run
        # atomically, so fetching the scalar forces completion of the whole
        # program (including big device-resident outputs) while moving only
        # bytes — fetching a full array over the tunnel costs seconds and
        # its jitter swamped the chain differencing (r5: s2 measured
        # NEGATIVE when the per-call fetch was 458 MB).
        _ = np.asarray(jax.tree.leaves(fn(*fn_args, jnp.float32(0)))[0])  # compile
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fn(*fn_args, jnp.float32(i + 1)))[0])
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    n1, n2 = args.chains
    report: dict = {"batch": args.batch, "chains": [n1, n2]}

    # ---- session anchors ------------------------------------------------
    # The per-stage block times below cancel the relay's ~30 ms dispatch tax
    # by chain-differencing; the anchors are single-dispatch walls, so the
    # tax is measured directly here (tiny-op roundtrip) and subtracted.
    tiny = jnp.ones((8, 8), cdt)

    @jax.jit
    def tiny_op(x, j):
        return x + j.astype(cdt)

    t_tax = timed(tiny_op, tiny, iters=max(args.iters, 5))
    report["dispatch_tax_ms"] = round(t_tax * 1e3, 2)

    def detaxed(t: float) -> float:
        # never below 10% of the raw wall: a tax estimate from a noisy
        # window must not turn a real measurement into ~0
        return max(t - t_tax, 0.1 * t)

    # big bf16 matmul rate (for MLP time accounting)
    m, k, n = (8192, 8192, 8192) if on_tpu else (256, 256, 256)
    a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(cdt)
    bmat = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32)).astype(cdt)

    @jax.jit
    def matmul(a, b, j):
        return jnp.sum(
            jnp.dot(a + j.astype(cdt) * cdt(1e-3), b,
                    preferred_element_type=jnp.float32)
        )

    t_mm = detaxed(timed(matmul, a, bmat, iters=args.iters))
    mm_tflops = 2 * m * k * n / t_mm / 1e12
    report["anchor_matmul_tflops"] = round(mm_tflops, 1)

    # HBM stream rate: big copy-scale (read + write, no reuse)
    big = jnp.asarray(
        rng.standard_normal((anchor_rows, anchor_w)).astype(np.float32)
    ).astype(cdt)

    @jax.jit
    def stream(x, j):
        y = x * (1.0 + j * 1e-6).astype(cdt)
        return y[0, 0], y  # scalar first-leaf; y stays a program output

    t_st = detaxed(timed(stream, big, iters=args.iters))
    hbm_gbs = 2 * big.size * 2 / t_st / 1e9
    report["anchor_hbm_stream_gbs"] = round(hbm_gbs, 1)

    # 49-tap 1-D stencil: 49 overlapping slice loads + FMA per element —
    # the chip's achievable load+FMA issue rate under XLA for this mix.
    # Row-chunked via lax.map: the unrolled 49-slice form at full rows made
    # XLA materialize ~48 input-window temps (21 GB HBM, compile OOM on
    # chip); mapping over row blocks bounds live temps to one chunk's worth.
    st_rows, st_w = anchor_rows, anchor_w
    chunk = min(st_rows, 2000)
    assert st_rows % chunk == 0
    sx = jnp.asarray(
        rng.standard_normal((st_rows, st_w + 49)).astype(np.float32)
    ).astype(cdt)
    taps = [cdt(0.01 * (i + 1)) for i in range(49)]

    @jax.jit
    def stencil49(x, j):
        xc = x.reshape(st_rows // chunk, chunk, st_w + 49)

        def one(xr):
            acc = (
                xr[:, 0:st_w] * (taps[0] + j.astype(cdt) * cdt(1e-6))
            ).astype(jnp.float32)
            for i in range(1, 49):
                acc = acc + xr[:, i : i + st_w] * taps[i]
            return acc.astype(cdt)

        out = jax.lax.map(one, xc)
        return out[0, 0, 0], out

    t_sten = detaxed(timed(stencil49, sx, iters=args.iters))
    elems = st_rows * st_w
    sten_gelem = elems / t_sten / 1e9  # giga-elements(×49 taps)/s
    report["anchor_stencil49_ns_per_elem"] = round(t_sten / elems * 1e9, 4)
    report["anchor_stencil49_gelem_s"] = round(sten_gelem, 2)

    # ---- per-stage fused block ------------------------------------------
    for name, t_len, f_real, c_real, n_blocks in STAGES:
        w = block_weights(c_real)
        x = np.zeros((args.batch, t_len, f_real, c_real), np.float32)
        x[:] = rng.standard_normal(x.shape).astype(np.float32) * 0.1
        xp = pad_fc(jnp.asarray(x).astype(cdt))

        def chain(n, xp=xp, w=w, f_real=f_real, c_real=c_real):
            @jax.jit
            def fn(y, j):
                y = y + j.astype(cdt) * cdt(1e-6)
                for _ in range(n):
                    y = fused_convnext_block_padded(
                        y, f_real, c_real,
                        w["dw_weight"], w["dw_bias"], w["ln_weight"], w["ln_bias"],
                        w["pw1_weight"], w["pw1_bias"], w["pw2_weight"],
                        w["pw2_bias"], w["layer_scale"],
                        interpret=interpret,
                    )
                return y[0, 0, 0, 0], y

            return fn

        t1 = timed(chain(n1), xp, iters=args.iters)
        t2 = timed(chain(n2), xp, iters=args.iters)
        block_ms = (t2 - t1) / (n2 - n1) * 1e3

        elems = int(np.prod(xp.shape))  # padded lanes do issue work too
        mlp_flops = 2 * args.batch * t_len * f_real * c_real * 8 * c_real
        t_mlp = mlp_flops / (mm_tflops * 1e12)
        hbm_bytes = 2 * elems * 2  # one read + one write per block
        t_hbm = hbm_bytes / (hbm_gbs * 1e9)
        # stencil floor at the session anchor's issue rate (49-tap mix)
        t_sten_floor = elems / (sten_gelem * 1e9)
        floor_ms = max(t_sten_floor + t_mlp, t_hbm) * 1e3
        vpu_ms = block_ms - t_mlp * 1e3
        report[name] = {
            "T": t_len, "F": f_real, "C": c_real, "padded": list(xp.shape),
            "block_ms": round(block_ms, 2),
            "stage_ms": round(block_ms * n_blocks, 1),
            "mlp_ms_at_anchor": round(t_mlp * 1e3, 2),
            "hbm_ms_at_anchor": round(t_hbm * 1e3, 2),
            "stencil_floor_ms_at_anchor": round(t_sten_floor * 1e3, 2),
            "floor_ms": round(floor_ms, 2),
            "ns_per_elem_vpu": round(vpu_ms * 1e6 / elems * 1e3, 4)
            if vpu_ms > 0 else None,
            "pct_of_ceiling": round(100 * floor_ms / block_ms, 1)
            if block_ms > 0 else None,
        }
        print(json.dumps({name: report[name]}), file=sys.stderr)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)  # PJRT teardown can hang over the tunnel
