#!/usr/bin/env python
"""Within-session A/B of the TRANSPOSED fused-block stage layout (r5).

The 7x7 depthwise stencil is T/F-symmetric, so a stage can run with time
and freq swapped (``convnext_features(fused_transpose=)``,
``ops/pallas/convnext_block.py::stage_transpose_wins``). ``--stage``
selects the production ConvNeXt-Tiny geometry to A/B:

- stage 3 (default; T=62, F=14, C=384, 9 blocks): normal plan is pack-2
  with 8-column zero gaps — 28 real of 40 stencil columns (70%), vs a
  single (t=14, F_pad=64) transposed tile at 62/64 = 97% with 64-wide
  sublane extents. Measured winner, production since r5 (PROFILE.md).
- stage 4 (T=31, F=7, C=768, 3 blocks): normal plan is unpacked F_pad=8
  (7/8 real) but the stencil's work rows are 24 columns wide for 7 real
  ones; transposed it runs (t=7, F_pad=32) at 31/32 with the halo
  amortized over 4x the columns. Needs the sub-8 MLP chunk plans (the
  9.4 MB resident weights leave no room for 8-row f32 MLP temps).
- stage 2 (T=125, F=28, C=192, 3 blocks): normal 28/32 with fshift;
  transposed (t=28, F_pad=128) at 125/128 WITHOUT fshift (no VMEM room)
  — the A/B decides whether the width win beats the fshift loss.
- stage 1 (T=250, F=56, C=96): gap-free already; included for
  completeness (auto never selects it).

The tunneled chip is time-sliced, so cross-run comparisons are invalid
(PROFILE.md "chip reality"); this alternates the two layouts in ONE
process and reports per-variant medians, at two levels:

1. stage-only: the isolated block chain, baseline vs transposed
   (including the transposed variant's slice/transpose/re-pad seams).
2. e2e: the full encoder via ``convnext_apply(fused_transpose=...)``.

Usage:  python scripts/ab_stage3.py [--stage 3] [--batch 384] [--iters 8]
        [--check-only] [--interpret] [--skip-e2e]
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

# production ConvNeXt-Tiny stage geometries: (T, F_real, C_real, depth)
STAGES = {
    1: (250, 56, 96, 3),
    2: (125, 28, 192, 3),
    3: (62, 14, 384, 9),
    4: (31, 7, 768, 3),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=3, choices=sorted(STAGES))
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--interpret", action="store_true", help="CPU smoke mode")
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()
    T, F_REAL, C, DEPTH = STAGES[args.stage]

    import jax
    import jax.numpy as jnp

    from conette_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    import conette_tpu.models.convnext as cv
    from conette_tpu.models.layers import conv2d_init, layer_norm_init, linear_init
    from conette_tpu.ops.pallas.convnext_block import (
        fused_convnext_block_padded,
        pad_fc,
    )

    key = jax.random.PRNGKey(0)

    def make_block(k, c):
        ks = jax.random.split(k, 6)
        p = {
            "dwconv": conv2d_init(ks[0], c, c, (7, 7), groups=c),
            "norm": layer_norm_init(c),
            "pwconv1": linear_init(ks[1], c, 4 * c, init="trunc_normal"),
            "pwconv2": linear_init(ks[2], 4 * c, c, init="trunc_normal"),
            "scale": jax.random.normal(ks[3], (c,), jnp.float32) * 0.1,
        }
        p["norm"]["weight"] = 1.0 + 0.1 * jax.random.normal(ks[4], (c,))
        p["dwconv"]["bias"] = 0.1 * jax.random.normal(ks[5], (c,))
        return p

    blocks = [make_block(jax.random.fold_in(key, i), C) for i in range(DEPTH)]
    x = (
        jax.random.normal(jax.random.fold_in(key, 99), (args.batch, T, F_REAL, C))
        * 0.5
    ).astype(jnp.bfloat16)
    xp = pad_fc(x)  # (B, 62, 16, 384): C is already a lane multiple

    def run_block(y, blk, f_real, dw):
        return fused_convnext_block_padded(
            y, f_real, C,
            dw, blk["dwconv"]["bias"],
            blk["norm"]["weight"], blk["norm"]["bias"],
            blk["pwconv1"]["weight"], blk["pwconv1"]["bias"],
            blk["pwconv2"]["weight"], blk["pwconv2"]["bias"],
            blk["scale"], interpret=args.interpret,
        )

    def baseline(y, j):
        y = y + (j * 1e-6).astype(y.dtype)
        for blk in blocks:
            y = run_block(y, blk, F_REAL, blk["dwconv"]["weight"])
        return y[0, 0, 0, 0], y

    def transposed(y, j):
        y = y + (j * 1e-6).astype(y.dtype)
        # the exact seams convnext_features(fused_transpose=) emits
        y = jnp.swapaxes(y[:, :, :F_REAL, :], 1, 2)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, (-T) % 8), (0, 0)))
        for blk in blocks:
            dw = jnp.swapaxes(blk["dwconv"]["weight"][:, :, 0, :], 0, 1)
            y = run_block(y, blk, T, dw)
        y = jnp.swapaxes(y[:, :, :T, :], 1, 2)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, (-F_REAL) % 8), (0, 0)))
        return y[0, 0, 0, 0], y

    fns = {name: jax.jit(fn) for name, fn in [("baseline", baseline), ("transposed", transposed)]}
    outs = {}
    for name, fn in fns.items():
        outs[name] = fn(xp, jnp.float32(0))  # compile
        np.asarray(outs[name][0])

    report: dict = {"batch": args.batch, "stage": args.stage}
    if args.check_only:
        a = np.asarray(outs["baseline"][1], np.float32)
        b = np.asarray(outs["transposed"][1], np.float32)
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        # XLA reference chain on the real extent
        yref = x
        for blk in blocks:
            yref = cv.convnext_block(blk, yref)
        r = np.asarray(yref, np.float32)
        # slice BOTH padded axes back to the real extent (C pads to a lane
        # multiple for s1/s2/s4; s3's 384 is already lane-aligned)
        rel_xla = (
            np.abs(a[:, :, :F_REAL, :C] - r).max() / max(np.abs(r).max(), 1e-6)
        )
        pad_zero = float(np.abs(b[:, :, F_REAL:, :]).max())
        report.update(
            {
                "max_rel_baseline_vs_transposed": float(rel),
                "max_rel_baseline_vs_xla": float(rel_xla),
                "transposed_pad_cols_abs_max": pad_zero,
                "ok": bool(rel < 0.02 and rel_xla < 0.02 and pad_zero == 0.0),
            }
        )
        print(json.dumps(report))
        return 0 if report["ok"] else 1

    def t_of(fn, j) -> float:
        t0 = time.perf_counter()
        s, _ = fn(xp, jnp.float32(j))
        np.asarray(s)
        return time.perf_counter() - t0

    times: dict[str, list[float]] = {n: [] for n in fns}
    for i in range(args.iters):  # alternate: both variants see every window
        for n, fn in fns.items():
            times[n].append(t_of(fn, 1 + i) * 1e3)
    for n in fns:
        report[f"{n}_ms"] = [round(v, 1) for v in times[n]]
        report[f"median_{n}_ms"] = round(statistics.median(times[n]), 1)

    if not args.skip_e2e:
        params = cv.convnext_init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        wav = jnp.asarray(
            rng.standard_normal((args.batch, 320_000)).astype(np.float32) * 0.1
        )
        lens = jnp.full((args.batch,), 320_000, jnp.int32)

        def make(mode: str):
            def run(w, l, j):
                out = cv.convnext_apply(
                    params, w + j * 1e-6, l, compute_dtype=jnp.bfloat16,
                    use_fused_block=True, fused_interpret=args.interpret,
                    fused_transpose=mode,
                )
                return jnp.sum(out["frame_embs"].astype(jnp.float32))

            fn = jax.jit(run)
            _ = np.asarray(fn(wav, lens, jnp.float32(0)))
            return fn

        e2e = {"never": make("never"), "auto": make("auto")}
        et: dict[str, list[float]] = {n: [] for n in e2e}
        for i in range(args.iters):
            for n, fn in e2e.items():
                t0 = time.perf_counter()
                np.asarray(fn(wav, lens, jnp.float32(1 + i)))
                et[n].append((time.perf_counter() - t0) * 1e3)
        for n in e2e:
            report[f"e2e_{n}_ms"] = [round(v, 1) for v in et[n]]
            report[f"median_e2e_{n}_ms"] = round(statistics.median(et[n]), 1)

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)  # PJRT teardown can hang over the tunnel
