"""Batched beam search as one compiled ``lax.scan`` with a static KV cache.

Behavior parity with the reference ``generate``
(``src/conette/nn/decoding/beam.py:23-269``):

- per-example BOS ids (task-token conditioning, beam.py:71-84);
- scores are *sum* log-probs during search, final ranking by
  length-normalized (average) log-prob (beam.py:188-190,218-227);
- min-length EOS masking and forbid-repetition multihot masking applied to
  logits before the log-softmax (beam.py:129-156);
- at the first step only beam 0 competes (all beams identical,
  beam.py:244-246);
- a beam that emits EOS at step i is *retired* with avg = sum/(i+1); the
  remaining live beams continue and the selection width shrinks with it
  (beam.py:158-203); at the last step every live beam retires.

Tie-break semantics: torch's ``topk`` tie order is unspecified and
empirically unstable across input sizes (see tests/test_beam_tiebreak.py),
so exact-tie bit-parity vs the reference is unattainable even in principle.
This implementation's tie-break is deterministic and documented: XLA's
``lax.top_k`` keeps the LOWEST flat index first (parent-major, then token
id), and the final best-hypothesis ``argmax`` keeps the first maximum in
finish order (= score-rank order within a step). Under exact ties the
output differs from torch only by the arbitrary label among exactly
interchangeable hypotheses (scores identical); under near-ties that are
distinct in f32 the two stacks agree bit-exactly.

TPU-first redesign: the reference shrinks the live batch dynamically and
loops per batch element; here the state is a fixed (B·beam) batch where
retired beams are score-masked to -inf (so they sort last and never win),
the per-batch "top-k over live beams only" is expressed as a rank test
``rank < n_alive``, and retired hypotheses are scattered into a static
(B, beam) store via one-hot matmuls. The decoder KV cache is gathered by
parent index each step (``reorder_cache``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from conette_tpu.decoding.greedy import masked_logits
from conette_tpu.models.decoder import (
    DecoderConfig,
    Params,
    decode_step,
    init_cross,
    init_self,
    reorder_cache,
)

NEG = -1.0e30  # finite "-inf": keeps log-softmax NaN-free on dead rows

# Production chunk count for the step-gated L-chunked KV reorder. Module
# global (read at trace time) so scripts/ab_reorder.py can patch it per
# variant; 4 won the 2026-08-19 on-chip A/B (full decode medians, batch
# 384): chunked_4 87.7 ms vs dense 91.7 vs chunked_2 90.1 vs chunked_10
# 92.1 vs none-bound 71.2.
REORDER_L_CHUNKS = 4


class BeamResult(NamedTuple):
    best_preds: jax.Array  # (B, max_pred_size) best hypothesis (pad-filled)
    best_avg_lprobs: jax.Array  # (B,)
    global_preds: jax.Array  # (B, beam, max_pred_size)
    global_avg_lprobs: jax.Array  # (B, beam)


def beam_search(
    params: Params,
    cfg: DecoderConfig,
    memory: jax.Array,
    memory_key_padding_mask: jax.Array,
    bos_ids: jax.Array,
    *,
    beam_size: int = 3,
    min_pred_size: int = 0,
    max_pred_size: int = 20,
    forbid_rep_mask: jax.Array | None = None,
) -> BeamResult:
    """
    :param memory: (B, T_mem, d_model) projected frame embeddings.
    :param memory_key_padding_mask: (B, T_mem) True = PAD.
    :param bos_ids: (B,) per-example BOS token ids.
    """
    b, t_mem, _ = memory.shape
    k = beam_size
    vocab = cfg.vocab_size
    flat = b * k

    # beams stay a free axis of the per-clip cross context (the reference
    # instead expands memory to beam identical rows, beam.py:68-69); only
    # the token stream runs at B·k, in clip-major order
    bos_flat = jnp.repeat(bos_ids.astype(jnp.int32), k, axis=0)

    ctx = init_cross(params, cfg, memory, memory_key_padding_mask)
    cache = init_self(cfg, flat, max_pred_size, memory.dtype)

    class _State(NamedTuple):
        cache: object
        tok: jax.Array  # (flat,) last fed token
        preds: jax.Array  # (B, k, max_pred) generated tokens (no bos)
        sum_lprobs: jax.Array  # (B, k)
        alive: jax.Array  # (B, k)
        mh: jax.Array  # (B, k, vocab) prefix multihot (incl. bos)
        fin_preds: jax.Array  # (B, k, max_pred)
        fin_avg: jax.Array  # (B, k)
        fin_count: jax.Array  # (B,)

    state = _State(
        cache=cache,
        tok=bos_flat,
        preds=jnp.full((b, k, max_pred_size), cfg.pad_id, jnp.int32),
        # only beam 0 competes at the first step
        sum_lprobs=jnp.where(jnp.arange(k)[None, :] == 0, 0.0, NEG).astype(
            jnp.float32
        ) * jnp.ones((b, 1), jnp.float32),
        alive=jnp.ones((b, k), bool),
        mh=jax.nn.one_hot(bos_flat, vocab, dtype=bool).reshape(b, k, vocab),
        fin_preds=jnp.full((b, k, max_pred_size), cfg.pad_id, jnp.int32),
        fin_avg=jnp.zeros((b, k), jnp.float32),
        fin_count=jnp.zeros((b,), jnp.int32),
    )

    def body(state: _State, step: jax.Array):
        raw, cache = decode_step(params, cfg, state.cache, ctx, state.tok, step)
        logits = masked_logits(
            raw,
            step,
            min_pred_size,
            cfg.eos_id,
            state.mh.reshape(flat, vocab),
            forbid_rep_mask,
        ).reshape(b, k, vocab)

        lprobs = jax.nn.log_softmax(jnp.maximum(logits, NEG), axis=-1)
        cand = state.sum_lprobs[:, :, None] + lprobs  # (B, k, vocab)
        cand = jnp.where(state.alive[:, :, None], cand, NEG)

        n_alive = jnp.sum(state.alive, axis=1)  # (B,)
        scores, flat_idx = jax.lax.top_k(cand.reshape(b, k * vocab), k)
        parent = flat_idx // vocab  # (B, k) beam index within clip
        token = (flat_idx % vocab).astype(jnp.int32)

        rank = jnp.arange(k)[None, :]
        valid = rank < n_alive[:, None]  # only live beams yield winners

        # gather parent state
        preds = jnp.take_along_axis(state.preds, parent[:, :, None], axis=1)
        mh = jnp.take_along_axis(state.mh, parent[:, :, None], axis=1)
        preds = preds.at[:, :, step].set(jnp.where(valid, token, cfg.pad_id))
        mh = mh | jax.nn.one_hot(
            jnp.where(valid, token, cfg.pad_id), vocab, dtype=bool
        )

        is_last = step == max_pred_size - 1
        finishing = valid & ((token == cfg.eos_id) | is_last)

        # retire finishing winners into the store at slots
        # fin_count .. fin_count + n_finishing - 1 (order = score rank)
        offs = jnp.cumsum(finishing.astype(jnp.int32), axis=1) - 1
        slot = state.fin_count[:, None] + offs  # (B, k)
        onehot = (
            finishing[:, :, None]
            & (slot[:, :, None] == jnp.arange(k)[None, None, :])
        )  # (B, k_winner, k_slot)
        avg = scores / (step + 1).astype(jnp.float32)
        sel = onehot.astype(jnp.float32)
        fin_avg = state.fin_avg * (1.0 - sel.sum(1)) + jnp.einsum(
            "bws,bw->bs", sel, avg
        )
        fin_preds = state.fin_preds * (1 - onehot.astype(jnp.int32).sum(1))[
            :, :, None
        ] + jnp.einsum("bws,bwl->bsl", onehot.astype(jnp.int32), preds)
        fin_count = state.fin_count + finishing.sum(axis=1).astype(jnp.int32)

        new_alive = valid & ~finishing
        new_sum = jnp.where(new_alive, scores, NEG)

        # reorder KV cache by parents; retired/dead rows keep arbitrary data.
        # Step-gated L-chunking skips the unwritten suffix (~20% off the
        # reorder overhead, exactly; see REORDER_L_CHUNKS above).
        cache = reorder_cache(cache, parent, step, l_chunks=REORDER_L_CHUNKS)
        tok = jnp.where(valid, token, cfg.pad_id).reshape(flat)

        return (
            _State(
                cache=cache,
                tok=tok,
                preds=preds,
                sum_lprobs=new_sum,
                alive=new_alive,
                mh=mh,
                fin_preds=fin_preds,
                fin_avg=fin_avg,
                fin_count=fin_count,
            ),
            None,
        )

    # while_loop with an all-finished early exit (the reference breaks out of
    # its Python loop when every beam has retired, beam.py:192-194; the
    # average real caption ends well before max_pred_size)
    def cond(carry):
        step, state = carry
        return (step < max_pred_size) & jnp.any(state.alive)

    def loop_body(carry):
        step, state = carry
        state, _ = body(state, step)
        return step + 1, state

    _, state = jax.lax.while_loop(cond, loop_body, (jnp.int32(0), state))

    best_beam = jnp.argmax(state.fin_avg, axis=1)  # first max on ties
    best_preds = jnp.take_along_axis(
        state.fin_preds, best_beam[:, None, None], axis=1
    )[:, 0]
    best_avg = jnp.take_along_axis(state.fin_avg, best_beam[:, None], axis=1)[:, 0]
    return BeamResult(
        best_preds=best_preds,
        best_avg_lprobs=best_avg,
        global_preds=state.fin_preds,
        global_avg_lprobs=state.fin_avg,
    )
