#!/usr/bin/env python
"""Within-session A/B of the beam KV-cache reorder formulations: the dense
(B·beam)² one-hot matmul (production, `models/decoder.py::reorder_cache`)
vs block-diagonal batched matmul / gather / elementwise select / fused
single-matmul / no-op (timing bound).

The tunneled chip is time-sliced, so cross-run comparisons are invalid
(PROFILE.md "chip reality"); this alternates both variants in ONE process
and reports per-variant medians of the FULL decode path (beam_search at
bench shapes), which is where the reorder lives.

Usage:  python scripts/ab_reorder.py [--batch 384] [--iters 8]
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


def run_check(args) -> int:
    """``--check-only``: quantitative ancestry-vs-physical equality report.

    The two formulations are the same algorithm (single-term one-hot sums),
    but the ancestry path contracts the attention value sum over a stacked
    ``beams·L`` axis while the physical path contracts over ``L`` — the same
    addends in a different order. In f32 that never flips a decision at
    these magnitudes; in bf16 the ulp is coarse enough that near-tied
    candidates can rank differently under ``top_k``. This mode reports, per
    dtype: the fraction of clips whose best tokens differ, and the max
    |Δ| of the best / sorted-global average log-probs — tie-class mismatches
    show token diffs with score diffs at bf16-ulp scale, a broken
    formulation would show large score drift.
    """
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from conette_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    from conette_tpu.decoding.beam import beam_search
    from conette_tpu.models.decoder import DecoderConfig, decoder_init

    BEAM, VOCAB, T_MEM, MAXP = 3, 4000, 31, 20
    cfg = DecoderConfig(vocab_size=VOCAB)
    params32 = decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mem32 = rng.standard_normal((args.batch, T_MEM, cfg.d_model)).astype(np.float32)
    mem_pad = jnp.zeros((args.batch, T_MEM), bool)
    bos = jnp.full((args.batch,), 4, jnp.int32)
    forbid = jnp.zeros((VOCAB,), bool).at[100:].set(True)

    from conette_tpu.models.decoder import (
        decode_step,
        init_cross,
        init_self,
        init_self_grouped,
        reorder_cache,
    )

    report = {"batch": args.batch}

    # Forced-token step-by-step logit comparison: feed BOTH formulations the
    # SAME tokens and the SAME parent maps (no top-k feedback), so any logit
    # difference is pure floating-point contraction-order effect — a broken
    # permutation would show O(1) logit error, rounding shows ulp-scale
    # growth with depth. This separates "formulation bug" from "bf16/MXU
    # rounding flips near-tied top-k picks" in the full-decode compare below.
    BEAM_K = 3
    n_steps = 8
    toks_np = rng.integers(5, VOCAB, size=(n_steps, args.batch * BEAM_K))
    pars_np = rng.integers(0, BEAM_K, size=(n_steps, args.batch, BEAM_K))

    for dtype in (jnp.bfloat16, jnp.float32):
        params = jax.tree.map(lambda p: p.astype(dtype), params32)
        memory = jnp.asarray(mem32).astype(dtype)
        toks = jnp.asarray(toks_np, jnp.int32)
        pars = jnp.asarray(pars_np, jnp.int32)

        @jax.jit
        def stepdiff(memory, toks, pars):
            ctx = init_cross(params, cfg, memory, mem_pad)
            cache_p = init_self(cfg, args.batch * BEAM_K, n_steps, dtype)
            cache_a = init_self_grouped(cfg, args.batch, BEAM_K, n_steps, dtype)
            anc = jnp.zeros((args.batch, BEAM_K, n_steps), jnp.int32)
            own = jnp.broadcast_to(
                jnp.arange(BEAM_K, dtype=jnp.int32)[None, :, None],
                (args.batch, BEAM_K, 1),
            )
            diffs = []
            for s in range(n_steps):
                anc = jax.lax.dynamic_update_slice(anc, own, (0, 0, s))
                raw_a, cache_a = decode_step(
                    params, cfg, cache_a, ctx, toks[s], jnp.int32(s), ancestry=anc
                )
                raw_p, cache_p = decode_step(
                    params, cfg, cache_p, ctx, toks[s], jnp.int32(s)
                )
                diffs.append(
                    jnp.max(jnp.abs(raw_a.astype(jnp.float32) - raw_p.astype(jnp.float32)))
                )
                anc = jnp.take_along_axis(anc, pars[s][:, :, None], axis=1)
                cache_p = reorder_cache(cache_p, pars[s], jnp.int32(s))
            return jnp.stack(diffs)

        try:
            d = np.asarray(stepdiff(memory, toks, pars))
        except Exception as exc:
            report[f"stepdiff_{dtype.__name__}"] = {"unsupported": type(exc).__name__}
            continue
        report[f"stepdiff_{dtype.__name__}"] = {
            "max_abs_d_logit_per_step": [round(float(x), 6) for x in d],
        }
        if dtype is jnp.float32:
            # full-precision control: with 3-pass f32 matmuls the MXU's
            # bf16-pass rounding disappears — if the residual diff is
            # ulp-scale the divergence is precision-class, not a bug
            try:
                with jax.default_matmul_precision("highest"):
                    dh = np.asarray(
                        jax.jit(stepdiff.__wrapped__)(memory, toks, pars)
                    )
                report["stepdiff_float32_highest"] = {
                    "max_abs_d_logit_per_step": [round(float(x), 8) for x in dh],
                }
            except Exception as exc:
                report["stepdiff_float32_highest"] = {
                    "unsupported": type(exc).__name__
                }

    for dtype in (jnp.bfloat16, jnp.float32):
        params = jax.tree.map(lambda p: p.astype(dtype), params32)
        memory = jnp.asarray(mem32).astype(dtype)

        def run(kv_reorder):
            return beam_search(
                params, cfg, memory, mem_pad, bos,
                beam_size=BEAM, min_pred_size=3, max_pred_size=MAXP,
                forbid_rep_mask=forbid, kv_reorder=kv_reorder,
            )

        key = dtype.__name__
        try:
            a = jax.jit(run, static_argnums=0)("ancestry")
            p = jax.jit(run, static_argnums=0)("physical")
            a_tok = np.asarray(a.best_preds)
        except Exception as exc:  # CPU XLA lacks some bf16 dot kernels
            report[key] = {"unsupported": type(exc).__name__}
            continue
        p_tok = np.asarray(p.best_preds)
        row_diff = (a_tok != p_tok).any(axis=1)
        report[key] = {
            "clips_with_token_diff": int(row_diff.sum()),
            "max_abs_d_best_avg_lprob": float(
                np.abs(
                    np.asarray(a.best_avg_lprobs) - np.asarray(p.best_avg_lprobs)
                ).max()
            ),
            # multiset compare of the whole finished store: rank flips under
            # ties reorder rows, sorting removes the labelling
            "max_abs_d_sorted_global_avg": float(
                np.abs(
                    np.sort(np.asarray(a.global_avg_lprobs), axis=1)
                    - np.sort(np.asarray(p.global_avg_lprobs), axis=1)
                ).max()
            ),
        }
    print(json.dumps(report))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--check-only", action="store_true",
        help="skip timing; print the quantitative ancestry-vs-physical "
        "equality report (bf16 + f32) as one JSON line",
    )
    args = ap.parse_args()
    if args.check_only:
        return run_check(args)

    import jax

    # sitecustomize pins JAX_PLATFORMS=axon before script code runs; honor an
    # explicit env override (the CPU smoke test relies on this).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from conette_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    import conette_tpu.decoding.beam as beam_mod
    from conette_tpu.models.decoder import DecodeCache, DecoderConfig, decoder_init

    BEAM, VOCAB, T_MEM, MAXP = 3, 4000, 31, 20
    cfg = DecoderConfig(vocab_size=VOCAB)
    params = decoder_init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(
        rng.standard_normal((args.batch, T_MEM, cfg.d_model)).astype(np.float32)
    ).astype(jnp.bfloat16)
    mem_pad = jnp.zeros((args.batch, T_MEM), bool)
    bos = jnp.full((args.batch,), 4, jnp.int32)
    forbid = jnp.zeros((VOCAB,), bool).at[100:].set(True)

    def block_diag_reorder(cache: DecodeCache, parent, step=None) -> DecodeCache:
        # batched (beam×beam) one-hot dot_general — B× fewer FLOPs on paper,
        # but the tiny per-clip matmuls lower terribly (measured 2.2× slower)
        bsz, k = parent.shape
        dtype = cache.self_k[0].dtype
        perm = jax.nn.one_hot(parent, k, dtype=dtype)  # (B, k, k)

        def permute(buf):
            flat = buf.reshape(bsz, k, -1)
            out = jax.lax.dot_general(
                perm, flat,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=dtype,
            )
            return out.reshape(buf.shape)

        return DecodeCache(
            self_k=tuple(permute(kk) for kk in cache.self_k),
            self_v=tuple(permute(v) for v in cache.self_v),
        )

    def elementwise_reorder(cache: DecodeCache, parent, step=None) -> DecodeCache:
        # out[b,i] = Σ_j perm[b,i,j] · flat[b,j] — k broadcast FMA passes on
        # the VPU, no matmul lowering at all
        bsz, k = parent.shape
        dtype = cache.self_k[0].dtype
        perm = jax.nn.one_hot(parent, k, dtype=dtype)  # (B, k, k)

        def permute(buf):
            flat = buf.reshape(bsz, k, -1)
            out = sum(
                perm[:, :, j][:, :, None] * flat[:, j][:, None, :]
                for j in range(k)
            )
            return out.reshape(buf.shape)

        return DecodeCache(
            self_k=tuple(permute(kk) for kk in cache.self_k),
            self_v=tuple(permute(v) for v in cache.self_v),
        )

    def gather_reorder(cache: DecodeCache, parent, step=None) -> DecodeCache:
        # plain beam-axis take_along_axis (XLA gather lowering)
        bsz, k = parent.shape

        def permute(buf):
            flat = buf.reshape(bsz, k, -1)
            out = jnp.take_along_axis(flat, parent[:, :, None], axis=1)
            return out.reshape(buf.shape)

        return DecodeCache(
            self_k=tuple(permute(kk) for kk in cache.self_k),
            self_v=tuple(permute(v) for v in cache.self_v),
        )

    def fused_full_perm_reorder(cache: DecodeCache, parent, step=None) -> DecodeCache:
        # full_perm, but all 12 buffers concatenated into ONE matmul
        bsz, k = parent.shape
        flat_parent = (parent + (jnp.arange(bsz) * k)[:, None]).reshape(-1)
        n = cache.self_k[0].shape[0]
        dtype = cache.self_k[0].dtype
        perm = jax.nn.one_hot(flat_parent, n, dtype=dtype)
        bufs = list(cache.self_k) + list(cache.self_v)
        big = jnp.concatenate([b.reshape(n, -1) for b in bufs], axis=1)
        out = jnp.dot(perm, big, preferred_element_type=dtype)
        per = bufs[0].reshape(n, -1).shape[1]
        outs = [
            out[:, i * per : (i + 1) * per].reshape(bufs[0].shape)
            for i in range(len(bufs))
        ]
        nl = len(cache.self_k)
        return DecodeCache(
            self_k=tuple(outs[:nl]),
            self_v=tuple(outs[nl:]),
        )

    def make_tiled_reorder(tile: int):
        # The full (n, n) permutation is block-diagonal at clip granularity
        # (parents stay within a clip), so rows can be processed in
        # independent tiles of ``tile`` rows (tile % beam == 0 keeps clips
        # unsplit): a batched (n/tile, tile, tile) @ (n/tile, tile, payload)
        # dot_general with tile/n of the dense FLOPs.
        def tiled_reorder(cache: DecodeCache, parent, step=None) -> DecodeCache:
            bsz, k = parent.shape
            n = bsz * k
            assert n % tile == 0 and tile % k == 0
            g = n // tile
            flat_parent = (parent + (jnp.arange(bsz) * k)[:, None]).reshape(g, tile)
            local = flat_parent - (jnp.arange(g) * tile)[:, None]
            dtype = cache.self_k[0].dtype
            perm = jax.nn.one_hot(local, tile, dtype=dtype)  # (g, tile, tile)

            def permute(buf):
                flat = buf.reshape(g, tile, -1)
                out = jax.lax.dot_general(
                    perm, flat,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=dtype,
                )
                return out.reshape(buf.shape)

            return DecodeCache(
                self_k=tuple(permute(kk) for kk in cache.self_k),
                self_v=tuple(permute(v) for v in cache.self_v),
            )

        return tiled_reorder

    def no_reorder(cache: DecodeCache, parent, step=None) -> DecodeCache:
        # identity — WRONG results; bounds the reorder's share of decode time
        return cache

    prod_reorder = beam_mod.reorder_cache

    def make(variant=None, l_chunks: int = 1, kv_reorder: str = "physical"):
        # Production variants select themselves through beam_search's
        # kv_reorder=/l_chunks= PARAMETERS (threaded since r5; the r4
        # module-global patching broke once, commit 2d63348). Custom
        # experimental reorder fns — (cache, parent, step) — still patch
        # ``reorder_cache`` around trace time only.
        def run(mem, j):
            res = beam_mod.beam_search(
                params, cfg, mem + j * 1e-6, mem_pad, bos,
                beam_size=BEAM, min_pred_size=3, max_pred_size=MAXP,
                forbid_rep_mask=forbid,
                kv_reorder=kv_reorder, l_chunks=l_chunks,
            )
            return res.best_preds

        fn = jax.jit(run)
        if variant is not None:
            def patched(cache, parent, step=None, l_chunks=1, _v=variant):
                return _v(cache, parent, step)

            beam_mod.reorder_cache = patched
        try:
            _ = np.asarray(fn(memory, jnp.float32(0)))  # trace+compile now
        finally:
            beam_mod.reorder_cache = prod_reorder
        return fn

    variants = {
        # reorder-free: unpermuted grouped cache + ancestry-indexed
        # attention read (models/decoder.py decode_step ancestry path)
        "ancestry": make(kv_reorder="ancestry"),
        # read-time formulation variants of the same ancestry path
        # (decode_step ancestry_impl=): "gather" replaces the score-select
        # einsum with take_along_axis (bit-identical); "stacked" masks the
        # non-ancestor lanes and softmaxes over the stacked beams·L axis,
        # removing both the select einsum and the weight scatter
        "anc_gather": make(kv_reorder="ancestry:gather"),
        "anc_stacked": make(kv_reorder="ancestry:stacked"),
        "full_perm": make(),  # dense (B·beam)² matmul, no chunking
        # step-gated L-chunking: permute only chunks the decode has reached
        "chunked_2": make(l_chunks=2),
        "chunked_4": make(l_chunks=4),
        "none": make(no_reorder),
    }
    if os.environ.get("CONETTE_AB_ALL"):
        variants["chunked_10"] = make(l_chunks=10)
    if os.environ.get("CONETTE_AB_ALL"):
        variants.update(
            tiled_384=make(make_tiled_reorder(384)),
            tiled_192=make(make_tiled_reorder(192)),
            tiled_96=make(make_tiled_reorder(96)),
            block_diag=make(block_diag_reorder),
            elementwise=make(elementwise_reorder),
            gather=make(gather_reorder),
            fused_full_perm=make(fused_full_perm_reorder),
        )

    def t_of(fn, jit_offset: float) -> float:
        t0 = time.perf_counter()
        np.asarray(fn(memory, jnp.float32(jit_offset)))
        return time.perf_counter() - t0

    # correctness cross-check: ancestry and the physical reorder must emit
    # the same tokens (both are exact one-hot selections; a mismatch would
    # mean a broken formulation, not a numerics nit)
    if "ancestry" in variants and "full_perm" in variants:
        a = np.asarray(variants["ancestry"](memory, jnp.float32(0)))
        p = np.asarray(variants["full_perm"](memory, jnp.float32(0)))
        eq = {"ancestry_eq_full_perm": bool((a == p).all())}
        for name in ("anc_gather", "anc_stacked"):
            if name in variants:
                v = np.asarray(variants[name](memory, jnp.float32(0)))
                eq[f"{name}_eq_ancestry"] = bool((v == a).all())
        print(json.dumps(eq), file=sys.stderr)

    times = {name: [] for name in variants}
    for i in range(args.iters):  # alternate: every variant sees every window
        for vi, (name, fn) in enumerate(variants.items()):
            times[name].append(t_of(fn, 1 + 100 * vi + i) * 1e3)

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
