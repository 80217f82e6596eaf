#!/usr/bin/env python
"""Within-session A/B of the radix-2 split DFT in the log-mel frontend.

The tunneled chip is time-sliced, so cross-run comparisons are invalid
(PROFILE.md "chip reality"); this alternates the split-radix and full-basis
frontends in ONE process and reports per-variant medians. Both variants pay
the same ~30 ms relay dispatch tax, so the wall delta is the device delta.

Usage:  python scripts/ab_split_radix.py [--batch 384] [--iters 8]
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
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from conette_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    import conette_tpu.ops.stft as stft_mod
    from conette_tpu.ops.frontend import DEFAULT_LOGMEL, logmel_spectrogram

    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        rng.standard_normal((args.batch, 320_000)).astype(np.float32) * 0.1
    )

    def make(split: bool):
        # _SPLIT_RADIX is read at trace time, so toggling the module global
        # before the first call of a fresh jit bakes the variant in
        def run(w, j):
            mel = logmel_spectrogram(w + j * 1e-6, DEFAULT_LOGMEL)
            return jnp.sum(mel)

        fn = jax.jit(run)
        stft_mod._SPLIT_RADIX = split
        _ = np.asarray(fn(wav, jnp.float32(0)))  # trace+compile now
        return fn

    fn_on = make(True)
    fn_off = make(False)

    def t_of(fn, jit_offset: float) -> float:
        t0 = time.perf_counter()
        np.asarray(fn(wav, jnp.float32(jit_offset)))
        return time.perf_counter() - t0

    on_ms, off_ms = [], []
    for i in range(args.iters):  # alternate: both variants see every window
        on_ms.append(t_of(fn_on, 1 + i) * 1e3)
        off_ms.append(t_of(fn_off, 101 + i) * 1e3)

    print(
        json.dumps(
            {
                "batch": args.batch,
                "split_on_ms": [round(x, 1) for x in on_ms],
                "split_off_ms": [round(x, 1) for x in off_ms],
                "median_on_ms": round(statistics.median(on_ms), 1),
                "median_off_ms": round(statistics.median(off_ms), 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)  # PJRT teardown can hang over the tunnel
