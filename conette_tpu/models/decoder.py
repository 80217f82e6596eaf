"""Task-conditioned transformer caption decoder with a static KV cache.

Capability twin of the reference ``AACTransformerDecoder``
(``src/conette/nn/decoders/aac_tfmer.py:18-118``): Embedding(vocab, 256,
padding_idx=pad) scaled by sqrt(d_model) + sinusoidal positional encoding
(``nn/modules/positional_encoding.py:13-36``) → 6 post-norm decoder layers
(d=256, 8 heads, FF 2048, GELU, eps 1e-5 — torch
``TransformerDecoderLayer(norm_first=False)`` semantics) → Linear(256, vocab).

TPU-first redesign:
- batch-first (B, L, D) activations;
- a **static-shape KV cache**: self-attention K/V live in (B, H, L_max, dh)
  buffers written with ``dynamic_update_slice``; cross-attention K/V are
  precomputed once per audio clip. One decode step is a handful of
  (B·H, 1, dh) matmuls — the reference re-runs the full decoder on the
  growing prefix each step with no cache (``nn/decoding/beam.py:113-127``);
- everything is a pure function usable under ``lax.scan``/``lax.while_loop``.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from conette_tpu.models.layers import (
    Params,
    dropout,
    embedding,
    gelu,
    layer_norm,
    linear,
    linear_init,
    xavier_uniform,
)

LN_EPS = 1e-5
NEG_INF = -1e30


class DecoderConfig(NamedTuple):
    vocab_size: int
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 2048
    dropout_p: float = 0.2
    bos_id: int = 1
    eos_id: int = 2
    pad_id: int = 0
    max_len: int = 5000  # positional table size (reference maxlen=5000)


# ------------------------------------------------------------------ pos enc
def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """Sin/cos positional table, parity with the reference
    ``PositionalEncoding`` (sin on even dims, cos on odd dims)."""
    den = np.exp(-np.arange(0, d_model, 2, dtype=np.float64) * math.log(10000.0) / d_model)
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    table = np.zeros((max_len, d_model), dtype=np.float64)
    table[:, 0::2] = np.sin(pos * den)
    table[:, 1::2] = np.cos(pos * den)
    return table.astype(np.float32)


# --------------------------------------------------------------------- init
def attention_init(key: jax.Array, d_model: int) -> Params:
    """torch MultiheadAttention init: xavier-uniform packed in-proj, zero
    in-proj bias, out-proj default linear init with zero bias."""
    kq, kk, kv, ko = jax.random.split(key, 4)
    # xavier over the packed (3d, d) matrix == per-block xavier with the
    # packed fan; replicate by drawing the packed matrix then splitting.
    packed = xavier_uniform(jax.random.fold_in(kq, 0), (d_model, 3 * d_model))
    wq, wk, wv = jnp.split(packed, 3, axis=1)
    out = linear_init(ko, d_model, d_model, init="torch")
    out["bias"] = jnp.zeros_like(out["bias"])
    return {
        "q": {"weight": wq, "bias": jnp.zeros((d_model,), jnp.float32)},
        "k": {"weight": wk, "bias": jnp.zeros((d_model,), jnp.float32)},
        "v": {"weight": wv, "bias": jnp.zeros((d_model,), jnp.float32)},
        "out": out,
    }


def decoder_init(key: jax.Array, cfg: DecoderConfig) -> Params:
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    emb = jax.random.normal(next(keys), (cfg.vocab_size, cfg.d_model), jnp.float32)
    emb = emb.at[cfg.pad_id].set(0.0)
    params: Params = {
        "emb": {"weight": emb},
        "layers": [],
        "classifier": linear_init(next(keys), cfg.d_model, cfg.vocab_size, init="torch"),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "self_attn": attention_init(next(keys), cfg.d_model),
                "cross_attn": attention_init(next(keys), cfg.d_model),
                "linear1": linear_init(next(keys), cfg.d_model, cfg.dim_feedforward, init="torch"),
                "linear2": linear_init(next(keys), cfg.dim_feedforward, cfg.d_model, init="torch"),
                "norm1": {"weight": jnp.ones((cfg.d_model,)), "bias": jnp.zeros((cfg.d_model,))},
                "norm2": {"weight": jnp.ones((cfg.d_model,)), "bias": jnp.zeros((cfg.d_model,))},
                "norm3": {"weight": jnp.ones((cfg.d_model,)), "bias": jnp.zeros((cfg.d_model,))},
            }
        )
    return params


# ---------------------------------------------------------------- attention
def _split_heads(x: jax.Array, nhead: int) -> jax.Array:
    b, l, d = x.shape
    return x.reshape(b, l, nhead, d // nhead).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def attention(
    params: Params,
    q_in: jax.Array,
    kv_in: jax.Array,
    nhead: int,
    *,
    mask: jax.Array | None = None,
    key_padding_mask: jax.Array | None = None,
    dropout_p: float = 0.0,
    deterministic: bool = True,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Multi-head attention. ``mask`` (Lq, Lk) additive-style bool (True =
    blocked); ``key_padding_mask`` (B, Lk) True = PAD."""
    d_model = q_in.shape[-1]
    dh = d_model // nhead
    q = _split_heads(linear(params["q"], q_in), nhead)
    k = _split_heads(linear(params["k"], kv_in), nhead)
    v = _split_heads(linear(params["v"], kv_in), nhead)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(dh)
    if mask is not None:
        scores = jnp.where(mask[None, None, :, :], NEG_INF, scores)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, scores)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if not deterministic and dropout_p > 0.0:
        weights = dropout(rng, weights, dropout_p, deterministic)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32)
    return linear(params["out"], _merge_heads(out.astype(q_in.dtype)))


# ------------------------------------------------------------- full forward
def decoder_forward(
    params: Params,
    cfg: DecoderConfig,
    memory: jax.Array,
    caps_in: jax.Array,
    *,
    memory_key_padding_mask: jax.Array | None = None,
    caps_in_pad_mask: jax.Array | None = None,
    causal: bool = True,
    deterministic: bool = True,
    rng: jax.Array | None = None,
    caps_in_embedded: bool = False,
) -> jax.Array:
    """Teacher-forcing forward.

    :param memory: (B, T_mem, D) projected frame embeddings.
    :param caps_in: (B, L) token ids, or (B, L, D) pre-mixed embeddings when
        ``caps_in_embedded`` (mixup path, ``pl_modules/conette.py:207-210``).
    :returns: (B, L, vocab) logits.
    """
    if caps_in_embedded:
        x = caps_in
    else:
        x = embedding(params["emb"], caps_in, dtype=memory.dtype)
    L = x.shape[1]
    x = x * math.sqrt(cfg.d_model)
    pos = jnp.asarray(sinusoidal_positions(L, cfg.d_model), dtype=x.dtype)
    x = x + pos[None, :, :]
    rngs = jax.random.split(rng, 1 + 6 * cfg.num_layers) if rng is not None else None
    x = dropout(rngs[0] if rngs is not None else None, x, cfg.dropout_p, deterministic)

    sq_mask = None
    if causal:
        sq_mask = jnp.triu(jnp.ones((L, L), bool), k=1)

    for i, layer in enumerate(params["layers"]):
        r = rngs[1 + 6 * i : 1 + 6 * (i + 1)] if rngs is not None else [None] * 6
        sa = attention(
            layer["self_attn"], x, x, cfg.nhead,
            mask=sq_mask, key_padding_mask=caps_in_pad_mask,
            dropout_p=cfg.dropout_p, deterministic=deterministic, rng=r[0],
        )
        x = layer_norm(layer["norm1"], x + dropout(r[1], sa, cfg.dropout_p, deterministic), LN_EPS)
        ca = attention(
            layer["cross_attn"], x, memory, cfg.nhead,
            key_padding_mask=memory_key_padding_mask,
            dropout_p=cfg.dropout_p, deterministic=deterministic, rng=r[2],
        )
        x = layer_norm(layer["norm2"], x + dropout(r[3], ca, cfg.dropout_p, deterministic), LN_EPS)
        ff = linear(layer["linear2"], dropout(r[4], gelu(linear(layer["linear1"], x)), cfg.dropout_p, deterministic))
        x = layer_norm(layer["norm3"], x + dropout(r[5], ff, cfg.dropout_p, deterministic), LN_EPS)

    return linear(params["classifier"], x).astype(jnp.float32)


# ------------------------------------------------------------- cached decode
class DecodeCache(NamedTuple):
    """Mutable static-shape incremental state for one decode stream batch.

    Holds ONLY the per-step-written self-attention buffers, so it is the
    whole of what a decode loop must carry (and what the beam reorder must
    permute). The loop-invariant cross-attention state lives in
    :class:`CrossContext`, which decode loops close over instead of
    carrying — keeping it out of the ``lax.while_loop`` state removes the
    per-step loop-buffer copies XLA emits for carried values (measured in
    the r4 device trace: ~11 ms of copies in a 67.6 ms batch-384 decode).
    """

    # per-layer tuples of (B, H, L_max, dh) — separate small buffers so each
    # step's dynamic_update_slice aliases in place (the written buffer is
    # itself the value carried forward AND the one attention reads; a single
    # stacked buffer forces XLA to copy it on every update), and the
    # beam-parent reorder is a leading-axis gather per layer
    self_k: tuple
    self_v: tuple


class CrossContext(NamedTuple):
    """Loop-invariant cross-attention state, stored PER CLIP.

    Beams of one clip share identical memory, so K/V are computed and kept
    at clip batch ``B`` while the token stream runs at ``B·beam`` — the
    per-step cross-attention reads 1/beam of the bytes (the decode loop is
    HBM-bound; r4 trace: cross-attn products were 40.6 MB/step/layer of the
    67.6 ms decode) and the K/V projections do 1/beam of the FLOPs.
    The reference re-encodes expanded memory per beam instead
    (``src/conette/nn/decoding/beam.py:68-69``).
    """

    cross_k: jax.Array  # (num_layers, B, H, T_mem, dh)
    cross_v: jax.Array  # (num_layers, B, H, T_mem, dh)
    memory_pad: jax.Array  # (B, T_mem) True = PAD


def init_cross(
    params: Params,
    cfg: DecoderConfig,
    memory: jax.Array,
    memory_key_padding_mask: jax.Array,
) -> CrossContext:
    """Precompute per-clip cross-attention K/V from projected memory."""
    cross_k, cross_v = [], []
    for layer in params["layers"]:
        ca = layer["cross_attn"]
        cross_k.append(_split_heads(linear(ca["k"], memory), cfg.nhead))
        cross_v.append(_split_heads(linear(ca["v"], memory), cfg.nhead))
    return CrossContext(
        cross_k=jnp.stack(cross_k),
        cross_v=jnp.stack(cross_v),
        memory_pad=memory_key_padding_mask,
    )


def init_self(
    cfg: DecoderConfig, batch: int, max_steps: int, dtype
) -> DecodeCache:
    """Allocate zeroed self-attention K/V buffers for ``batch`` streams."""
    dh = cfg.d_model // cfg.nhead
    zeros = jnp.zeros((batch, cfg.nhead, max_steps, dh), dtype)
    return DecodeCache(
        self_k=(zeros,) * cfg.num_layers,
        self_v=(zeros,) * cfg.num_layers,
    )


def init_self_grouped(
    cfg: DecoderConfig, b_clips: int, beams: int, max_steps: int, dtype
) -> DecodeCache:
    """Allocate zeroed self-attention K/V buffers in the GROUPED layout
    ``(B_clips, H, beams, L_max, dh)`` used by the ancestry (reorder-free)
    beam decode — beams of one clip sit side by side on one axis so the
    attention read can stack them along the key-length dim
    (``decode_step(..., ancestry=...)``)."""
    dh = cfg.d_model // cfg.nhead
    zeros = jnp.zeros((b_clips, cfg.nhead, beams, max_steps, dh), dtype)
    return DecodeCache(
        self_k=(zeros,) * cfg.num_layers,
        self_v=(zeros,) * cfg.num_layers,
    )


def init_cache(
    params: Params,
    cfg: DecoderConfig,
    memory: jax.Array,
    memory_key_padding_mask: jax.Array,
    max_steps: int,
) -> tuple[DecodeCache, CrossContext]:
    """Convenience: ``(init_self(...), init_cross(...))`` at equal batch."""
    ctx = init_cross(params, cfg, memory, memory_key_padding_mask)
    cache = init_self(cfg, memory.shape[0], max_steps, memory.dtype)
    return cache, ctx


def decode_step(
    params: Params,
    cfg: DecoderConfig,
    cache: DecodeCache,
    ctx: CrossContext,
    token_ids: jax.Array,
    step: jax.Array,
    *,
    ancestry: jax.Array | None = None,
    ancestry_impl: str = "scatter",
) -> tuple[jax.Array, DecodeCache]:
    """One incremental decode step.

    :param token_ids: (B·beam,) current input tokens; ``ctx`` is at clip
        batch B and ``beam = len(token_ids) // B`` consecutive rows share
        each clip's cross K/V (beam=1 for greedy/plain batches).
    :param step: scalar int32 position of ``token_ids`` in the sequence.
    :param ancestry: optional (B, beam, L_max) int32 map for the
        REORDER-FREE beam decode: ``ancestry[b, q, j]`` is the local beam
        row (within clip ``b``) whose cache slot holds logical beam
        ``q``'s K/V at position ``j``. When given, ``cache`` must be in the
        GROUPED layout from :func:`init_self_grouped` — the cache is never
        physically permuted (the beam loop gathers the tiny ancestry map by
        parent instead of matmul-permuting megabytes of K/V; see
        ``decoding/beam.py::beam_search(kv_reorder=...)``), and the
        self-attention read resolves the permutation by stacking a clip's
        ``beam·L_max`` cache rows along the key axis and one-hot-selecting
        per position — the same batched tiny-matmul shape class as the
        cross-attention product, which the r4 trace proved fast on-chip.
        Entries at positions > ``step`` may be garbage (masked out).
    :param ancestry_impl: how the ancestry permutation is resolved at
        attention-read time (A/B'd on-chip, scripts/ab_reorder.py):
        "scatter" — one-hot select the scores per position, softmax over
        L, then one-hot scatter the weights back over the stacked beams·L
        axis for the value sum; "gather" — the score selection as a tiny
        ``take_along_axis`` over the score tensor instead of the select
        einsum (bit-identical arithmetic to "scatter": both are
        single-term selections, value side unchanged); "stacked" — mask
        the non-ancestor score lanes to -inf and softmax directly over
        the stacked beams·L axis, removing both the selection einsum and
        the weight scatter (same addends, different f32 summation order
        in the softmax denominator).
    :returns: ((B·beam, vocab) logits for the next token, updated cache).
    """
    b = token_ids.shape[0]
    b_ctx = ctx.memory_pad.shape[0]
    assert b % b_ctx == 0, (
        f"token batch {b} is not a multiple of the cross-context clip batch "
        f"{b_ctx}: decode_step expects CLIP-MAJOR rows (all beams of clip 0, "
        "then clip 1, ...) with ctx at clip granularity — a mismatched "
        "ctx/cache pairing would otherwise surface as an opaque reshape "
        "error or silently wrong logits"
    )
    beams = b // b_ctx
    dh = cfg.d_model // cfg.nhead
    if ancestry is not None:
        assert cache.self_k[0].ndim == 5, (
            "ancestry decode needs the grouped (B, H, beams, L, dh) cache "
            "from init_self_grouped"
        )
        assert ancestry.shape[:2] == (b_ctx, beams), (
            f"ancestry {ancestry.shape} != (B_clips={b_ctx}, beams={beams}, L)"
        )
        max_steps = cache.self_k[0].shape[3]
    else:
        max_steps = cache.self_k[0].shape[2]

    x = embedding(params["emb"], token_ids, dtype=ctx.cross_k.dtype)
    x = x * math.sqrt(cfg.d_model)
    pos = jnp.asarray(sinusoidal_positions(cfg.max_len, cfg.d_model), dtype=x.dtype)
    x = x + jax.lax.dynamic_slice_in_dim(pos, step, 1, axis=0)[0]
    x = x[:, None, :]  # (B, 1, D)

    # positions > step are masked out of self-attention
    valid = (jnp.arange(max_steps) <= step)[None, :]  # (1, L_max)

    new_self_k = list(cache.self_k)
    new_self_v = list(cache.self_v)
    for i, layer in enumerate(params["layers"]):
        sa = layer["self_attn"]
        # fused QKV projection: one (D, 3D) matmul instead of three — the
        # concat is loop-invariant, XLA hoists it out of the decode loop
        w_qkv = jnp.concatenate(
            [sa["q"]["weight"], sa["k"]["weight"], sa["v"]["weight"]], axis=1
        ).astype(x.dtype)
        b_qkv = jnp.concatenate(
            [sa["q"]["bias"], sa["k"]["bias"], sa["v"]["bias"]]
        ).astype(jnp.float32)
        qkv = (
            jnp.dot(x, w_qkv, preferred_element_type=jnp.float32) + b_qkv
        ).astype(x.dtype)
        q, k_new, v_new = (
            _split_heads(t, cfg.nhead)
            for t in jnp.split(qkv, 3, axis=-1)
        )  # each (B, H, 1, dh)
        if ancestry is None:
            # one in-place dynamic_update_slice per buffer; the updated
            # buffer is both the carried state and the attention input
            k_buf = jax.lax.dynamic_update_slice(new_self_k[i], k_new, (0, 0, step, 0))
            v_buf = jax.lax.dynamic_update_slice(new_self_v[i], v_new, (0, 0, step, 0))
            new_self_k[i] = k_buf
            new_self_v[i] = v_buf

            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k_buf, preferred_element_type=jnp.float32
            ) / math.sqrt(dh)
            scores = jnp.where(valid[None, None, :, :], scores, NEG_INF)
            w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            sa_out = jnp.einsum("bhqk,bhkd->bhqd", w, v_buf, preferred_element_type=jnp.float32)
        else:
            # reorder-free read: each physical row writes its OWN slot; the
            # beam permutation is resolved at read time via ``ancestry``.
            # Stack a clip's (beams · L_max) cache rows along the key axis
            # and compute q against ALL of them — beams× the (tiny) QK^T
            # FLOPs, but the K/V buffers are read from HBM exactly once,
            # like the physical path, and the (B·beam)²-payload permutation
            # matmul disappears entirely.
            k_new_g = jnp.swapaxes(
                k_new.reshape(b_ctx, beams, cfg.nhead, 1, dh), 1, 2
            )  # (B, H, beams, 1, dh) — tiny transpose of the new slice only
            v_new_g = jnp.swapaxes(
                v_new.reshape(b_ctx, beams, cfg.nhead, 1, dh), 1, 2
            )
            k_buf = jax.lax.dynamic_update_slice(
                new_self_k[i], k_new_g, (0, 0, 0, step, 0)
            )
            v_buf = jax.lax.dynamic_update_slice(
                new_self_v[i], v_new_g, (0, 0, 0, step, 0)
            )
            new_self_k[i] = k_buf
            new_self_v[i] = v_buf

            s_len = beams * max_steps
            kb = k_buf.reshape(b_ctx, cfg.nhead, s_len, dh)
            vb = v_buf.reshape(b_ctx, cfg.nhead, s_len, dh)
            qg = q[:, :, 0, :].reshape(b_ctx, beams, cfg.nhead, dh)
            if jax.default_backend() == "cpu" and kb.dtype == jnp.bfloat16:
                # CPU XLA lacks bf16×bf16→f32 dot kernels for some of the
                # stacked-axis shapes below (DotThunk UNIMPLEMENTED, seen at
                # serving shapes); upcast at trace time — the products are
                # f32-accumulated on TPU anyway and the CPU path is
                # tests/dryrun only
                kb, vb, qg = (t.astype(jnp.float32) for t in (kb, vb, qg))
            # same batched-matmul shape class as the cross-attention product
            # ("bkhd,bhmd->bkhm" with m = beams·L_max instead of T_mem)
            scores_all = jnp.einsum(
                "bqhd,bhsd->bqhs", qg, kb, preferred_element_type=jnp.float32
            ) / math.sqrt(dh)
            scores_all = scores_all.reshape(
                b_ctx, beams, cfg.nhead, beams, max_steps
            )
            if ancestry_impl == "stacked":
                # mask every non-ancestor (s, l) lane to -inf and softmax
                # over the stacked beams·L axis directly: exactly one s is
                # live per valid l, so the live set equals the logical L
                # positions — same addends as "scatter", summed along the
                # stacked axis (f32 rounding may differ at ulp scale)
                sel = ancestry[:, :, None, :] == jnp.arange(beams)[
                    None, None, :, None
                ]  # (B, q, s, L) bool
                mask = sel & valid[None, :, :]  # valid (1, L) broadcasts
                scores_st = jnp.where(
                    mask[:, :, None, :, :], scores_all, NEG_INF
                ).reshape(b_ctx, beams, cfg.nhead, s_len)
                w_sel = jax.nn.softmax(scores_st, axis=-1).astype(q.dtype)
            else:
                if ancestry_impl == "gather":
                    # the same single-term selection as the one-hot einsum,
                    # as a tiny gather over the SCORE tensor (never over
                    # K/V bytes) — bit-identical to "scatter"
                    idx = jnp.broadcast_to(
                        ancestry[:, :, None, None, :],
                        (b_ctx, beams, cfg.nhead, 1, max_steps),
                    )
                    scores = jnp.take_along_axis(scores_all, idx, axis=3)[
                        :, :, :, 0, :
                    ]
                    onehot = jax.nn.one_hot(
                        ancestry, beams, dtype=scores_all.dtype
                    )
                else:
                    # one-hot select the ancestor row per position
                    # (single-term sums — exact); positions > step are
                    # masked below regardless
                    onehot = jax.nn.one_hot(
                        ancestry, beams, dtype=scores_all.dtype
                    )
                    scores = jnp.einsum("bqhsl,bqls->bqhl", scores_all, onehot)
                scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
                w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)  # (B,q,H,L)
                # scatter the weights back over the stacked (beams·L) key
                # axis: w_sel[b,q,h,s,l] = w[b,q,h,l] · 1[ancestry[b,q,l]==s]
                w_sel = (
                    w[:, :, :, None, :]
                    * jnp.swapaxes(onehot, 2, 3)[:, :, None, :, :].astype(q.dtype)
                ).reshape(b_ctx, beams, cfg.nhead, s_len)
            sa_out = jnp.einsum(
                "bqhs,bhsd->bqhd", w_sel, vb, preferred_element_type=jnp.float32
            ).reshape(b, cfg.nhead, 1, dh)
        sa_out = linear(sa["out"], _merge_heads(sa_out.astype(x.dtype)))
        x = layer_norm(layer["norm1"], x + sa_out, LN_EPS)

        ca = layer["cross_attn"]
        q = _split_heads(linear(ca["q"], x), cfg.nhead)  # (B·beam, H, 1, dh)
        # beams of a clip share K/V: batch the product over clips with the
        # beam axis free, reading each clip's K/V once instead of beam times
        qb = q[:, :, 0, :].reshape(b_ctx, beams, cfg.nhead, dh)
        scores = jnp.einsum(
            "bkhd,bhmd->bkhm", qb, ctx.cross_k[i], preferred_element_type=jnp.float32
        ) / math.sqrt(dh)
        scores = jnp.where(ctx.memory_pad[:, None, None, :], NEG_INF, scores)
        w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        ca_out = jnp.einsum(
            "bkhm,bhmd->bkhd", w, ctx.cross_v[i], preferred_element_type=jnp.float32
        )
        ca_out = ca_out.reshape(b, cfg.nhead, 1, dh)
        ca_out = linear(ca["out"], _merge_heads(ca_out.astype(x.dtype)))
        x = layer_norm(layer["norm2"], x + ca_out, LN_EPS)

        ff = linear(layer["linear2"], gelu(linear(layer["linear1"], x)))
        x = layer_norm(layer["norm3"], x + ff, LN_EPS)

    logits = linear(params["classifier"], x[:, 0, :]).astype(jnp.float32)
    return logits, DecodeCache(
        self_k=tuple(new_self_k),
        self_v=tuple(new_self_v),
    )


def reorder_cache(
    cache: DecodeCache,
    parent: jax.Array,
    step: jax.Array | None = None,
    l_chunks: int = 1,
) -> DecodeCache:
    """Gather the batch axis by per-clip beam parents (beam-search reorder).

    :param parent: (B, beam) parent beam index within each clip; the cache
        batch axis is laid out clip-major (``B·beam`` rows, beams of clip 0
        first).
    :param step: current decode step (rows > step are unwritten zeros).
        With ``l_chunks > 1`` the L axis is split into that many chunks and
        a chunk is permuted only when ``step`` has reached it
        (``lax.cond``), skipping the dense matmul's bytes+FLOPs for the
        unwritten suffix — on average ~40% of the reorder at beam-3
        geometry (triangular occupancy). Permuting zeros is a semantic
        no-op, so any chunking is exact. Production uses ``l_chunks=4``
        (beam.py): the 2026-08-19 on-chip A/B (full decode medians,
        batch 384) measured chunked_4 87.7 ms vs dense 91.7 ms vs
        chunked_2 90.1 vs chunked_10 92.1 vs none-bound 71.2 ms.

    Each chunk is ONE dense (B·beam)² one-hot permutation matmul per
    buffer. That looks wasteful — the permutation is block-diagonal (a
    winning beam's parent is always one of the SAME clip's beams), and the
    dense form burns ~163 GFLOP per decode step at batch 384 · beam 3 — but
    every "cheaper" formulation measured SLOWER on the chip in
    within-session A/Bs of the full beam decode (scripts/ab_reorder.py,
    batch 384): dense perm matmul 131 ms, fused single-matmul 166 ms,
    tiled block-diagonal (384/192/96 rows) 142–147 ms, batched (beam×beam)
    block-diagonal dot_general 292 ms (tiny-matmul lowering pads each 3×3
    block to MXU tiles), beam-axis take_along_axis gather 334 ms, broadcast
    multiply-add select 569 ms; no-op bound 108 ms. The
    (1152, 1152)@(1152, 5120) bf16 matmul is an ideal MXU shape; a 0/1
    permutation matrix is numerically exact (each output row is a
    single-term sum).
    """
    bsz, k = parent.shape
    n = bsz * k
    flat_parent = (parent + (jnp.arange(bsz) * k)[:, None]).reshape(n)
    dtype = cache.self_k[0].dtype
    perm = jax.nn.one_hot(flat_parent, n, dtype=dtype)  # (n, n)

    def permute(buf: jax.Array) -> jax.Array:
        flat = buf.reshape(n, -1)
        out = jnp.dot(perm, flat, preferred_element_type=dtype)
        return out.reshape(buf.shape)

    bufs = tuple(cache.self_k) + tuple(cache.self_v)
    if l_chunks <= 1 or step is None:
        out = tuple(permute(b) for b in bufs)
    else:
        l_max = bufs[0].shape[2]
        w = -(-l_max // l_chunks)
        out = bufs
        for c0 in range(0, l_max, w):
            cw = min(w, l_max - c0)

            def chunk_perm(bs, c0=c0, cw=cw):
                res = []
                for buf in bs:
                    sl = buf[:, :, c0 : c0 + cw, :]
                    flat = sl.reshape(n, -1)
                    o = jnp.dot(perm, flat, preferred_element_type=dtype)
                    res.append(buf.at[:, :, c0 : c0 + cw, :].set(o.reshape(sl.shape)))
                return tuple(res)

            out = jax.lax.cond(step >= c0, chunk_perm, lambda bs: bs, out)

    nl = len(cache.self_k)
    return DecodeCache(self_k=out[:nl], self_v=out[nl:])


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
