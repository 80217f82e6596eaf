#!/usr/bin/env python
"""Within-session A/B of the stage-1 fused-block LayerNorm formulations (r5).

The per-stage roofline (PROFILE.md r5, `scripts/roofline_stages.py`)
attributes stage 1's residual over the demonstrated per-element ceiling
(50.7 vs 38.4 ps/elem) to "LN lane-reduction share" — at C_pad=128 (one
lane register) the two cross-lane reduction trees per STENCIL_ROWS chunk
are a larger fraction of the block than at C=256+. That attribution was an
inference, not a measurement. This script measures it directly by running
the stage-1 chain (3 blocks, T=250, F=56, C=96→128) with the kernel's
``ln_mode`` static parameter:

- ``vpu``  — production: `jnp.sum` lane reductions (log-tree shuffles).
- ``mxu``  — [acc, acc·acc] @ ones(C,1) skinny matmul (r3 shootout: wash
  at the whole-encoder level; re-measured here per-stage).
- ``skip`` — INVALID-RESULTS bound: no stats, no normalize. The vpu−skip
  gap IS the LN share; if it's small, s1 is closed as shape-bound with
  data and no LN rework can pay.

The tunneled chip is time-sliced, so cross-run comparisons are invalid
(PROFILE.md "chip reality"); all variants alternate in ONE process and the
report gives per-variant medians.

Usage:  python scripts/ab_s1ln.py [--batch 384] [--iters 8] [--interpret]
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

T, F_REAL, C, DEPTH = 250, 56, 96, 3  # ConvNeXt-Tiny stage 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--interpret", action="store_true", help="CPU smoke mode")
    args = ap.parse_args()

    import jax

    # sitecustomize pins JAX_PLATFORMS=axon before script code runs; honor an
    # explicit env override (the CI smoke sets JAX_PLATFORMS=cpu)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from conette_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

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
    xp = pad_fc(x)  # (B, 250, 56, 128)

    def chain(mode: str):
        def run(y, j):
            y = y + (j * 1e-6).astype(y.dtype)
            for blk in blocks:
                y = fused_convnext_block_padded(
                    y, F_REAL, C,
                    blk["dwconv"]["weight"], blk["dwconv"]["bias"],
                    blk["norm"]["weight"], blk["norm"]["bias"],
                    blk["pwconv1"]["weight"], blk["pwconv1"]["bias"],
                    blk["pwconv2"]["weight"], blk["pwconv2"]["bias"],
                    blk["scale"], interpret=args.interpret, ln_mode=mode,
                )
            return y[0, 0, 0, 0]  # scalar fetch only (tunnel-cheap)

        return jax.jit(run)

    fns = {m: chain(m) for m in ("vpu", "mxu", "skip")}
    for fn in fns.values():
        np.asarray(fn(xp, jnp.float32(0)))  # compile

    times: dict[str, list[float]] = {n: [] for n in fns}
    for i in range(args.iters):  # alternate: every variant sees every window
        for n, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(xp, jnp.float32(1 + i)))
            times[n].append((time.perf_counter() - t0) * 1e3)

    report: dict = {"batch": args.batch, "stage": "s1", "depth": DEPTH}
    for n in fns:
        report[f"{n}_ms"] = [round(v, 1) for v in times[n]]
        report[f"median_{n}_ms"] = round(statistics.median(times[n]), 1)
    report["ln_share_ms"] = round(
        report["median_vpu_ms"] - report["median_skip_ms"], 1
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)  # PJRT teardown can hang over the tunnel
