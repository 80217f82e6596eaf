#!/usr/bin/env python
"""Within-session A/B of the fused downsample-seam kernel (r4).

The tunneled chip is time-sliced, so cross-run comparisons are invalid
(PROFILE.md "chip reality"); this alternates the seams-ON and seams-OFF
encoder in ONE process and reports per-variant medians, plus an optional
interleaved device trace for per-op attribution.

Usage:  python scripts/ab_seams.py [--batch 128] [--iters 6] [--trace]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from conette_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    import conette_tpu.models.convnext as cv

    params = cv.convnext_init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        rng.standard_normal((args.batch, 320_000)).astype(np.float32) * 0.1
    )
    lens = jnp.full((args.batch,), 320_000, jnp.int32)

    def make(seams: bool):
        # _FUSED_SEAMS is read at TRACE time inside convnext_features, so
        # toggling the module global before the first call of a fresh jit
        # bakes the variant into that program
        def run(w, l, j):
            out = cv.convnext_apply(
                params, w + j * 1e-6, l, compute_dtype=jnp.bfloat16
            )
            return jnp.sum(out["frame_embs"].astype(jnp.float32))

        fn = jax.jit(run)
        cv._FUSED_SEAMS = seams
        _ = np.asarray(fn(wav, lens, jnp.float32(0)))  # trace+compile now
        return fn

    fn_on = make(True)
    fn_off = make(False)

    def t_of(fn, jit_offset: float) -> float:
        t0 = time.perf_counter()
        o = fn(wav, lens, jnp.float32(jit_offset))
        np.asarray(o)
        return time.perf_counter() - t0

    on_ms, off_ms = [], []
    for i in range(args.iters):  # alternate: both variants see every window
        on_ms.append(t_of(fn_on, 1 + i) * 1e3)
        off_ms.append(t_of(fn_off, 101 + i) * 1e3)

    report = {
        "batch": args.batch,
        "seams_on_ms": [round(x, 1) for x in on_ms],
        "seams_off_ms": [round(x, 1) for x in off_ms],
        "median_on_ms": round(statistics.median(on_ms), 1),
        "median_off_ms": round(statistics.median(off_ms), 1),
    }
    if args.trace:
        trace_dir = os.path.join(os.path.dirname(__file__), "..", ".ab_seams_trace")
        import jax.profiler

        with jax.profiler.trace(trace_dir):
            np.asarray(fn_on(wav, lens, jnp.float32(999)))
            np.asarray(fn_off(wav, lens, jnp.float32(998)))
        report["trace_dir"] = trace_dir
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)  # PJRT teardown can hang over the tunnel
