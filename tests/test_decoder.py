"""Decoder golden tests.

Oracle 1: torch.nn.TransformerDecoder with identical weights (the reference
decoder subclasses it — aac_tfmer.py:18-58), checking teacher-forcing logits.
Oracle 2: self-consistency of the static-KV-cache incremental path vs the
full forward.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from conette_tpu.models.decoder import (
    DecodeCache,
    DecoderConfig,
    decode_step,
    init_cross,
    init_self,
    decoder_forward,
    decoder_init,
    init_cache,
    reorder_cache,
    sinusoidal_positions,
)

CFG = DecoderConfig(
    vocab_size=50, d_model=64, nhead=4, num_layers=2, dim_feedforward=128,
    dropout_p=0.0, bos_id=1, eos_id=2, pad_id=0,
)


def _np(a):
    return np.asarray(a)


@pytest.fixture(scope="module")
def params():
    return decoder_init(jax.random.PRNGKey(0), CFG)


def build_torch_twin(params, cfg: DecoderConfig):
    layer = tnn.TransformerDecoderLayer(
        d_model=cfg.d_model,
        nhead=cfg.nhead,
        dim_feedforward=cfg.dim_feedforward,
        dropout=0.0,
        activation=torch.nn.functional.gelu,
        layer_norm_eps=1e-5,
        batch_first=False,
        norm_first=False,
    )
    dec = tnn.TransformerDecoder(layer, cfg.num_layers)
    emb = tnn.Embedding(cfg.vocab_size, cfg.d_model, padding_idx=cfg.pad_id)
    cls = tnn.Linear(cfg.d_model, cfg.vocab_size)

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    with torch.no_grad():
        emb.weight.copy_(t(params["emb"]["weight"]))
        cls.weight.copy_(t(params["classifier"]["weight"]).T)
        cls.bias.copy_(t(params["classifier"]["bias"]))
        for i, lp in enumerate(params["layers"]):
            tl = dec.layers[i]
            for attn_name, tattn in [("self_attn", tl.self_attn), ("cross_attn", tl.multihead_attn)]:
                ap = lp[attn_name]
                in_proj_w = torch.cat(
                    [t(ap["q"]["weight"]).T, t(ap["k"]["weight"]).T, t(ap["v"]["weight"]).T], 0
                )
                in_proj_b = torch.cat(
                    [t(ap["q"]["bias"]), t(ap["k"]["bias"]), t(ap["v"]["bias"])], 0
                )
                tattn.in_proj_weight.copy_(in_proj_w)
                tattn.in_proj_bias.copy_(in_proj_b)
                tattn.out_proj.weight.copy_(t(ap["out"]["weight"]).T)
                tattn.out_proj.bias.copy_(t(ap["out"]["bias"]))
            tl.linear1.weight.copy_(t(lp["linear1"]["weight"]).T)
            tl.linear1.bias.copy_(t(lp["linear1"]["bias"]))
            tl.linear2.weight.copy_(t(lp["linear2"]["weight"]).T)
            tl.linear2.bias.copy_(t(lp["linear2"]["bias"]))
            for n in ("norm1", "norm2", "norm3"):
                getattr(tl, n).weight.copy_(t(lp[n]["weight"]))
                getattr(tl, n).bias.copy_(t(lp[n]["bias"]))
    dec.eval()
    return dec, emb, cls


def test_positional_encoding_matches_reference_formula():
    pe = sinusoidal_positions(10, 8)
    den = np.exp(-np.arange(0, 8, 2) * math.log(10000) / 8)
    pos = np.arange(10)[:, None]
    np.testing.assert_allclose(pe[:, 0::2], np.sin(pos * den), atol=1e-6)
    np.testing.assert_allclose(pe[:, 1::2], np.cos(pos * den), atol=1e-6)


def test_forward_matches_torch_transformer_decoder(params):
    rng = np.random.default_rng(0)
    B, L, T = 3, 7, 11
    memory = rng.standard_normal((B, T, CFG.d_model)).astype(np.float32)
    ids = rng.integers(3, CFG.vocab_size, size=(B, L)).astype(np.int64)
    ids[1, 5:] = CFG.pad_id
    mem_pad = np.zeros((B, T), bool)
    mem_pad[0, 8:] = True
    caps_pad = ids == CFG.pad_id

    ours = _np(
        decoder_forward(
            params,
            CFG,
            jnp.asarray(memory),
            jnp.asarray(ids),
            memory_key_padding_mask=jnp.asarray(mem_pad),
            caps_in_pad_mask=jnp.asarray(caps_pad),
        )
    )

    dec, emb, cls = build_torch_twin(params, CFG)
    with torch.no_grad():
        x = emb(torch.from_numpy(ids)) * math.sqrt(CFG.d_model)
        pe = torch.from_numpy(sinusoidal_positions(L, CFG.d_model))
        x = (x + pe[None]).transpose(0, 1)  # (L, B, D)
        sq = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
        out = dec(
            tgt=x,
            memory=torch.from_numpy(memory).transpose(0, 1),
            tgt_mask=sq,
            tgt_key_padding_mask=torch.from_numpy(caps_pad),
            memory_key_padding_mask=torch.from_numpy(mem_pad),
        )
        ref = cls(out).transpose(0, 1).numpy()  # (B, L, vocab)

    # rows where the query itself is PAD can differ (torch NaN-guards them);
    # compare only valid query positions
    valid = ~caps_pad
    np.testing.assert_allclose(ours[valid], ref[valid], atol=2e-4, rtol=1e-4)


def test_incremental_decode_matches_full_forward(params):
    rng = np.random.default_rng(1)
    B, L, T = 2, 6, 9
    memory = jnp.asarray(rng.standard_normal((B, T, CFG.d_model)).astype(np.float32))
    ids = jnp.asarray(rng.integers(3, CFG.vocab_size, size=(B, L)).astype(np.int32))
    mem_pad = jnp.zeros((B, T), bool)

    full = _np(
        decoder_forward(params, CFG, memory, ids, memory_key_padding_mask=mem_pad)
    )

    cache, ctx = init_cache(params, CFG, memory, mem_pad, max_steps=L)
    inc = []
    for t in range(L):
        logits, cache = decode_step(params, CFG, cache, ctx, ids[:, t], jnp.int32(t))
        inc.append(_np(logits))
    inc = np.stack(inc, axis=1)
    np.testing.assert_allclose(inc, full, atol=1e-4, rtol=1e-4)


def test_cache_reorder_consistency(params):
    """Beam-reorder: gathering cache rows must equal recomputing from the
    gathered prefix."""
    rng = np.random.default_rng(2)
    B, T = 4, 5
    memory_np = rng.standard_normal((2, T, CFG.d_model)).astype(np.float32)
    # two clips × two beams: the per-clip cross context is shared by both
    # beam rows of each clip (clip-major token layout)
    memory = jnp.asarray(memory_np)
    mem_pad = jnp.zeros((2, T), bool)
    ids0 = jnp.asarray([4, 5, 6, 7], jnp.int32)
    ids1 = jnp.asarray([8, 9, 10, 11], jnp.int32)

    ctx = init_cross(params, CFG, memory, mem_pad)
    cache = init_self(CFG, B, 4, memory.dtype)
    _, cache = decode_step(params, CFG, cache, ctx, ids0, jnp.int32(0))
    # reorder within beam groups (local parents): flat [1, 0, 3, 2]
    perm = jnp.asarray([[1, 0], [1, 0]])
    cache_r = reorder_cache(cache, perm)
    logits_r, _ = decode_step(params, CFG, cache_r, ctx, ids1, jnp.int32(1))

    # recompute directly with permuted first tokens
    cache2 = init_self(CFG, B, 4, memory.dtype)
    _, cache2 = decode_step(
        params, CFG, cache2, ctx,
        ids0[perm.reshape(-1) + jnp.asarray([0, 0, 2, 2])], jnp.int32(0),
    )
    logits2, _ = decode_step(params, CFG, cache2, ctx, ids1, jnp.int32(1))
    np.testing.assert_allclose(_np(logits_r), _np(logits2), atol=1e-5)


@pytest.mark.parametrize("l_chunks", [2, 4, 10])
@pytest.mark.parametrize("step", [0, 3, 9, 19])
def test_chunked_reorder_equals_dense(l_chunks, step):
    """Step-gated L-chunked reorder must equal the dense permutation on all
    written rows (rows > step are zeros during decode, so skipping their
    permutation is exact)."""
    rng = np.random.default_rng(4)
    B, K, H, L, DH = 4, 3, 2, 20, 8
    n = B * K
    buf = rng.standard_normal((n, H, L, DH)).astype(np.float32)
    buf[:, :, step + 1 :, :] = 0.0  # decode invariant: suffix unwritten
    parent = jnp.asarray(rng.integers(0, K, (B, K)), jnp.int32)
    cache = DecodeCache(self_k=(jnp.asarray(buf),), self_v=(jnp.asarray(buf),))
    dense = reorder_cache(cache, parent)
    chunked = reorder_cache(cache, parent, jnp.int32(step), l_chunks=l_chunks)
    np.testing.assert_array_equal(_np(dense.self_k[0]), _np(chunked.self_k[0]))
    np.testing.assert_array_equal(_np(dense.self_v[0]), _np(chunked.self_v[0]))


def test_shared_cross_context_equals_expanded(params):
    """A per-clip CrossContext with beam>1 token rows must produce the same
    logits as expanding memory to one row per beam (the reference's layout,
    beam.py:68-69)."""
    rng = np.random.default_rng(3)
    B, K, T = 3, 2, 5
    memory_np = rng.standard_normal((B, T, CFG.d_model)).astype(np.float32)
    pad_np = np.zeros((B, T), bool)
    pad_np[1, -2:] = True  # a clip with real memory padding
    ids = jnp.asarray(rng.integers(3, CFG.vocab_size, size=(B * K,)), jnp.int32)

    ctx = init_cross(params, CFG, jnp.asarray(memory_np), jnp.asarray(pad_np))
    cache = init_self(CFG, B * K, 4, jnp.float32)
    shared, _ = decode_step(params, CFG, cache, ctx, ids, jnp.int32(0))

    ctx_exp = init_cross(
        params, CFG,
        jnp.asarray(np.repeat(memory_np, K, axis=0)),
        jnp.asarray(np.repeat(pad_np, K, axis=0)),
    )
    cache2 = init_self(CFG, B * K, 4, jnp.float32)
    expanded, _ = decode_step(params, CFG, cache2, ctx_exp, ids, jnp.int32(0))
    np.testing.assert_allclose(_np(shared), _np(expanded), atol=1e-5)


def test_embedding_scale_and_padding_row(params):
    assert _np(params["emb"]["weight"][CFG.pad_id]).sum() == 0.0
