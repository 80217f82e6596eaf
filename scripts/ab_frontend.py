#!/usr/bin/env python
"""Within-session A/B of the log-mel frontend framing strategies.

Variants (all bf16 DFT/mel matmuls, the production bench dtype):
  slices    — concat-of-hop-block-slices framing (ops/stft.py default)
  gather    — strided-gather framing (the pre-r4 formulation)
  dft_only  — frames pre-materialized outside the timed region: bounds the
              pure DFT+square+mel matmul cost (what framing can never beat)

The tunneled chip is time-sliced, so cross-run comparisons are invalid
(PROFILE.md "chip reality"); this alternates all variants in ONE process
and reports per-variant medians of the full logmel at bench shapes.

Usage:  python scripts/ab_frontend.py [--batch 384] [--iters 8]
"""

from __future__ import annotations

import argparse
import functools
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

    SR, SECONDS = 32_000, 10
    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        rng.standard_normal((args.batch, SECONDS * SR)).astype(np.float32) * 0.1
    )

    orig_frame = stft_mod.frame_signal

    def make(impl: str):
        # power_spectrogram resolves frame_signal from the stft module's
        # global at trace time, so swapping it before the first call bakes
        # the variant into the jitted program
        def run(w, j):
            mel = logmel_spectrogram(
                w + j * 1e-6, DEFAULT_LOGMEL, compute_dtype=jnp.bfloat16
            )
            return jnp.sum(mel.astype(jnp.float32))

        fn = jax.jit(run)
        stft_mod.frame_signal = functools.partial(orig_frame, impl=impl)
        try:
            _ = np.asarray(fn(wav, jnp.float32(0)))  # trace+compile now
        finally:
            stft_mod.frame_signal = orig_frame
        return fn

    # dft_only: frames already materialized — matmul + epilogue bound
    frames_const = orig_frame(wav, DEFAULT_LOGMEL.n_fft, DEFAULT_LOGMEL.hop_length)

    @jax.jit
    def dft_only(frames, j):
        from conette_tpu.ops.frontend import _mel_matrix
        from conette_tpu.ops.stft import dft_basis

        n_freqs = DEFAULT_LOGMEL.n_fft // 2 + 1
        f = (frames + j * 1e-6).astype(jnp.bfloat16)
        basis = jnp.asarray(dft_basis(DEFAULT_LOGMEL.n_fft), jnp.bfloat16)
        spec = jnp.einsum("btn,nf->btf", f, basis, preferred_element_type=jnp.float32)
        power = spec[..., :n_freqs] ** 2 + spec[..., n_freqs:] ** 2
        fb = jnp.asarray(_mel_matrix(DEFAULT_LOGMEL), power.dtype)
        mel = jnp.einsum("btf,fm->btm", power, fb, preferred_element_type=jnp.float32)
        return jnp.sum(10.0 * jnp.log10(jnp.maximum(DEFAULT_LOGMEL.amin, mel)))

    variants = {
        "slices": (make("slices"), wav),
        "gather": (make("gather"), wav),
        "dft_only": (dft_only, frames_const),
    }
    _ = np.asarray(dft_only(frames_const, jnp.float32(0)))

    def t_of(fn, arg, jit_offset: float) -> float:
        t0 = time.perf_counter()
        np.asarray(fn(arg, jnp.float32(jit_offset)))
        return time.perf_counter() - t0

    times = {name: [] for name in variants}
    for i in range(args.iters):  # alternate: every variant sees every window
        for vi, (name, (fn, arg)) in enumerate(variants.items()):
            times[name].append(t_of(fn, arg, 1 + 100 * vi + i) * 1e3)

    out = {"batch": args.batch}
    for name, ms in times.items():
        out[f"{name}_ms"] = [round(x, 1) for x in ms]
        out[f"median_{name}_ms"] = round(statistics.median(ms), 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    rc = main()
    sys.stdout.flush()
    os._exit(rc)  # PJRT teardown can hang over the tunnel
