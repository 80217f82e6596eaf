"""Greedy caption decoding as one compiled ``lax.scan``.

Behavior parity with the reference ``greedy_search``
(``src/conette/nn/decoding/greedy.py:18-131``): min-length EOS masking and
forbid-repetition masking applied to logits *before* selection, finished
rows emit the pad one-hot logits row; output logits shape (B, vocab, L).

TPU-first redesign: the reference re-runs the full decoder on the growing
prefix each step and shrinks the live batch dynamically (greedy.py:84-124);
here a static KV cache (models/decoder.py) makes each step O(1) in sequence
length, finished rows are masked instead of removed, and the whole loop is
a single ``lax.scan`` with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from conette_tpu.models.decoder import (
    DecoderConfig,
    Params,
    decode_step,
    init_cache,
)

__all__ = ["GreedyResult", "greedy_search", "masked_logits"]

NEG_INF = -jnp.inf


class GreedyResult(NamedTuple):
    preds: jax.Array  # (B, max_pred_size) token ids (pad after eos)
    logits: jax.Array  # (B, vocab, max_pred_size)


def masked_logits(
    logits: jax.Array,
    step: jax.Array,
    min_pred_size: int,
    eos_id: int,
    prev_multihot: jax.Array | None,
    forbid_rep_mask: jax.Array | None,
) -> jax.Array:
    """Apply min-length EOS mask + forbid-repetition mask (parity:
    ``greedy.py:96-106`` / ``beam.py:129-156``)."""
    vocab = logits.shape[-1]
    if min_pred_size > 0:
        eos_mask = (step < min_pred_size) & (jnp.arange(vocab) == eos_id)
        logits = jnp.where(eos_mask[None, :], NEG_INF, logits)
    if forbid_rep_mask is not None and prev_multihot is not None:
        blocked = prev_multihot & forbid_rep_mask[None, :]
        logits = jnp.where(blocked, NEG_INF, logits)
    return logits


def greedy_search(
    params: Params,
    cfg: DecoderConfig,
    memory: jax.Array,
    memory_key_padding_mask: jax.Array,
    bos_ids: jax.Array,
    *,
    min_pred_size: int = 0,
    max_pred_size: int = 20,
    forbid_rep_mask: jax.Array | None = None,
) -> GreedyResult:
    """
    :param memory: (B, T_mem, d_model) projected frame embeddings.
    :param memory_key_padding_mask: (B, T_mem) True = PAD.
    :param bos_ids: (B,) per-example BOS ids (task-token conditioning).
    :returns: GreedyResult(preds (B, L), logits (B, vocab, L)).
    """
    b = memory.shape[0]
    vocab = cfg.vocab_size
    cache, ctx = init_cache(
        params, cfg, memory, memory_key_padding_mask, max_pred_size
    )

    # pad one-hot row recorded for finished steps (greedy.py:63-69)
    pad_row = jnp.full((vocab,), NEG_INF, jnp.float32).at[cfg.pad_id].set(0.0)

    mh0 = jax.nn.one_hot(bos_ids, vocab, dtype=bool)

    def body(state, step):
        cache, tok, finished, mh = state
        raw, cache = decode_step(params, cfg, cache, ctx, tok, step)
        logits = masked_logits(
            raw, step, min_pred_size, cfg.eos_id, mh, forbid_rep_mask
        )
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out_logits = jnp.where(finished[:, None], pad_row[None, :], logits)
        out_tok = jnp.where(finished, cfg.pad_id, next_tok)
        new_finished = finished | (next_tok == cfg.eos_id)
        new_mh = mh | jax.nn.one_hot(out_tok, vocab, dtype=bool)
        return (cache, out_tok, new_finished, new_mh), (out_tok, out_logits)

    # while_loop with early exit when every row has emitted EOS (the
    # reference breaks out of its Python loop then, greedy.py:122-124)
    toks0 = jnp.full((b, max_pred_size), cfg.pad_id, jnp.int32)
    logits0 = jnp.broadcast_to(
        pad_row[None, :, None], (b, vocab, max_pred_size)
    )

    def cond(carry):
        step, state, _, _ = carry
        _, _, finished, _ = state
        return (step < max_pred_size) & ~jnp.all(finished)

    def loop_body(carry):
        step, state, toks, logits_out = carry
        state, (out_tok, out_logits) = body(state, step)
        toks = jax.lax.dynamic_update_slice(toks, out_tok[:, None], (0, step))
        logits_out = jax.lax.dynamic_update_slice(
            logits_out, out_logits[:, :, None], (0, 0, step)
        )
        return step + 1, state, toks, logits_out

    init = (cache, bos_ids.astype(jnp.int32), jnp.zeros((b,), bool), mh0)
    _, _, toks, logits = jax.lax.while_loop(
        cond, loop_body, (jnp.int32(0), init, toks0, logits0)
    )
    return GreedyResult(preds=toks, logits=logits)
