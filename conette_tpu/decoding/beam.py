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
(B, beam) store via one-hot matmuls. The decoder KV cache follows beam
parents by one of two strategies (``kv_reorder=``): "ancestry" keeps the
cache physically fixed and resolves the permutation at attention-read time
through a tiny (B, beam, L) ancestry map, while "physical" permutes the
buffers with a dense one-hot matmul each step (``reorder_cache``). Both are
numerically exact (single-term one-hot sums); which one is faster is a chip
measurement (scripts/ab_reorder.py), not a belief.
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
    init_self_grouped,
    reorder_cache,
)

NEG = -1.0e30  # finite "-inf": keeps log-softmax NaN-free on dead rows

# Production KV-reorder strategy, threaded as ``beam_search`` PARAMETERS
# (kv_reorder= / l_chunks=) — the r4 module-global patching pattern broke
# the A/B scripts once (commit 2d63348) and is retired. The module-level
# defaults below exist only so every call site follows a production flip
# without edits.
#
# "ancestry": reorder-free decode — the self-attention KV cache is NEVER
#   physically permuted; a tiny (B, beam, L) ancestry map is gathered by
#   parent each step and the permutation is resolved at attention-read time
#   (models/decoder.py::decode_step ancestry path).
# "physical": dense (B·beam)² one-hot permutation matmul each step,
#   step-gated into ``l_chunks`` L-chunks (the r4 production path; 8
#   physical formulations measured, dense won — see
#   models/decoder.py::reorder_cache).
# Production default = whichever wins the on-chip A/B (scripts/ab_reorder.py,
# full-decode medians within one session; PROFILE.md records the dated row).
# r5 flip: ancestry 82.6 ms vs chunked_4 92.0 / full perm 91.3 (batch 384,
# window 21:33). The two strategies are the same exact algorithm and agree
# bit-for-bit at full f32 precision; under the MXU's default bf16 passes
# their different value-sum contraction order (stacked beams·L vs L) can
# flip near-tied top-k picks — measured and bounded in PROFILE.md r5
# (forced-token step logit diff ≤0.1 on random weights, step 0 bit-equal).
KV_REORDER = "ancestry"
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
    kv_reorder: str | None = None,
    l_chunks: int | None = None,
    eos_bias_schedule: jax.Array | None = None,
) -> BeamResult:
    """
    :param memory: (B, T_mem, d_model) projected frame embeddings.
    :param memory_key_padding_mask: (B, T_mem) True = PAD.
    :param bos_ids: (B,) per-example BOS token ids.
    :param kv_reorder: "ancestry" (reorder-free) or "physical" (dense
        permutation matmul); None → the production default ``KV_REORDER``.
        The ancestry read-time formulation is selectable for the A/B
        harness: "ancestry:gather" (score take_along_axis — bit-identical
        to "ancestry") and "ancestry:stacked" (masked softmax over the
        stacked beams·L axis) route ``decode_step(ancestry_impl=...)``.
    :param l_chunks: step-gated L-chunk count for the physical reorder
        (ignored by "ancestry"); None → ``REORDER_L_CHUNKS``.
    :param eos_bias_schedule: optional (B, max_pred_size) f32 bias added to
        the EOS logit of every beam of clip ``b`` at step ``s`` — per-clip
        caption-length shaping (e.g. force length L with +1e4 at steps
        ≥ L-1). Applied after the min-length EOS mask, which still wins
        (the mask's -1e30 dwarfs any finite bias).
    """
    kv_reorder = KV_REORDER if kv_reorder is None else kv_reorder
    if kv_reorder not in (
        "ancestry", "ancestry:gather", "ancestry:stacked", "physical"
    ):
        raise ValueError(f"unknown kv_reorder {kv_reorder!r}")
    ancestry_mode = kv_reorder.startswith("ancestry")
    ancestry_impl = (
        kv_reorder.split(":", 1)[1] if ":" in kv_reorder else "scatter"
    )
    l_chunks = REORDER_L_CHUNKS if l_chunks is None else l_chunks
    b, t_mem, _ = memory.shape
    k = beam_size
    vocab = cfg.vocab_size
    flat = b * k

    # beams stay a free axis of the per-clip cross context (the reference
    # instead expands memory to beam identical rows, beam.py:68-69); only
    # the token stream runs at B·k, in clip-major order
    bos_flat = jnp.repeat(bos_ids.astype(jnp.int32), k, axis=0)

    ctx = init_cross(params, cfg, memory, memory_key_padding_mask)
    if ancestry_mode:
        cache = init_self_grouped(cfg, b, k, max_pred_size, memory.dtype)
    else:
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
        anc: jax.Array  # (B, k, max_pred) ancestry map (ancestry mode only)

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
        # positions are stamped with the writer's own row at the top of each
        # step; (1,1,1) placeholder in physical mode keeps the carry tiny
        anc=jnp.zeros(
            (b, k, max_pred_size) if ancestry_mode else (1, 1, 1), jnp.int32
        ),
    )

    own_row = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :, None], (b, k, 1))

    def body(state: _State, step: jax.Array):
        if ancestry_mode:
            # each physical row writes position ``step`` into its own slot
            anc = jax.lax.dynamic_update_slice(state.anc, own_row, (0, 0, step))
            raw, cache = decode_step(
                params, cfg, state.cache, ctx, state.tok, step,
                ancestry=anc, ancestry_impl=ancestry_impl,
            )
        else:
            anc = state.anc
            raw, cache = decode_step(params, cfg, state.cache, ctx, state.tok, step)
        logits = masked_logits(
            raw,
            step,
            min_pred_size,
            cfg.eos_id,
            state.mh.reshape(flat, vocab),
            forbid_rep_mask,
        ).reshape(b, k, vocab)
        if eos_bias_schedule is not None:
            step_bias = jax.lax.dynamic_slice_in_dim(
                eos_bias_schedule.astype(logits.dtype), step, 1, axis=1
            )  # (B, 1) — broadcasts over beams
            logits = logits.at[:, :, cfg.eos_id].add(step_bias)

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

        if ancestry_mode:
            # the cache is untouched; only the tiny (B, k, L) ancestry map
            # follows the winners (logical beam q inherits its parent's
            # lineage, including position ``step`` just stamped above)
            anc = jnp.take_along_axis(anc, parent[:, :, None], axis=1)
        else:
            # reorder KV cache by parents; retired/dead rows keep arbitrary
            # data. Step-gated L-chunking skips the unwritten suffix (~20%
            # off the reorder overhead; see REORDER_L_CHUNKS above).
            cache = reorder_cache(cache, parent, step, l_chunks=l_chunks)
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
                anc=anc,
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
