"""Beam/greedy decoding parity tests.

The oracle reimplements the reference's *dynamic* beam-search semantics
(nn/decoding/beam.py:23-269: live-beam shrinking, per-batch top-k over
live·vocab, sum-lprob search + avg-lprob ranking, min-size and
forbid-repetition masking before log-softmax, first-step single-beam) as a
slow Python loop over our full decoder forward. The static-shape
``lax.scan`` implementation must reproduce it exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conette_tpu.decoding.beam import beam_search
from conette_tpu.decoding.greedy import greedy_search
from conette_tpu.models.decoder import DecoderConfig, decoder_forward, decoder_init

CFG = DecoderConfig(
    vocab_size=32, d_model=32, nhead=2, num_layers=2, dim_feedforward=64,
    dropout_p=0.0, bos_id=1, eos_id=2, pad_id=0,
)


@pytest.fixture(scope="module")
def setup():
    params = decoder_init(jax.random.PRNGKey(7), CFG)
    rng = np.random.default_rng(3)
    B, T = 3, 6
    memory = rng.standard_normal((B, T, CFG.d_model)).astype(np.float32) * 0.5
    mem_pad = np.zeros((B, T), bool)
    mem_pad[1, 4:] = True
    bos_ids = np.array([1, 5, 6], np.int32)  # per-example task BOS
    forbid = rng.random(CFG.vocab_size) > 0.5
    forbid[CFG.eos_id] = False
    return params, memory, mem_pad, bos_ids, forbid


def _step_logits(params, memory, mem_pad, prefixes, cfg=CFG):
    """Full-forward last-position logits for a list of token prefixes."""
    ids = jnp.asarray(np.stack(prefixes).astype(np.int32))
    logits = decoder_forward(
        params, cfg, jnp.asarray(memory), ids,
        memory_key_padding_mask=jnp.asarray(mem_pad),
        caps_in_pad_mask=jnp.zeros(ids.shape, bool),
    )
    return np.asarray(logits[:, -1, :], dtype=np.float64)


def _log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def oracle_beam(params, memory, mem_pad, bos_ids, beam, min_pred, max_pred, forbid,
                cfg=CFG):
    B = memory.shape[0]
    results = []
    for b in range(B):
        live = [([int(bos_ids[b])], 0.0)]  # (prefix incl bos, sum_lprob)
        live = live * beam
        finished = []
        for i in range(max_pred):
            prefixes = [p for p, _ in live]
            mem_rep = np.repeat(memory[b : b + 1], len(live), axis=0)
            pad_rep = np.repeat(mem_pad[b : b + 1], len(live), axis=0)
            logits = _step_logits(params, mem_rep, pad_rep, prefixes, cfg)
            if i < min_pred:
                logits[:, cfg.eos_id] = -np.inf
            if forbid is not None:
                for r, (p, _) in enumerate(live):
                    for tok in p:
                        if forbid[tok]:
                            logits[r, tok] = -np.inf
            lp = _log_softmax(logits)
            if i == 0:
                cand = lp[0:1]  # only beam 0
                sums = np.zeros(1)
            else:
                cand = lp
                sums = np.array([s for _, s in live])
            total = sums[:, None] + cand
            flat = total.reshape(-1)
            k = len(live)
            top = np.argsort(-flat, kind="stable")[:k]
            new_live = []
            for r in top:
                parent, tok = divmod(int(r), cfg.vocab_size)
                score = float(flat[r])
                prefix = live[parent][0] + [tok]
                if tok == cfg.eos_id or i == max_pred - 1:
                    finished.append((prefix[1:], score / (i + 1)))
                else:
                    new_live.append((prefix, score))
            live = new_live
            if not live:
                break
        best = max(finished, key=lambda x: x[1])
        results.append((best, finished))
    return results


class TestBeamParity:
    @pytest.mark.parametrize("kv_reorder", ["physical", "ancestry"])
    @pytest.mark.parametrize("use_forbid", [False, True])
    def test_matches_dynamic_oracle(self, setup, use_forbid, kv_reorder):
        params, memory, mem_pad, bos_ids, forbid = setup
        beam, min_p, max_p = 3, 2, 8
        fr = forbid if use_forbid else None
        res = beam_search(
            params, CFG, jnp.asarray(memory), jnp.asarray(mem_pad),
            jnp.asarray(bos_ids), beam_size=beam, min_pred_size=min_p,
            max_pred_size=max_p,
            forbid_rep_mask=jnp.asarray(fr) if fr is not None else None,
            kv_reorder=kv_reorder,
        )
        oracle = oracle_beam(
            params, memory, mem_pad, bos_ids, beam, min_p, max_p, fr
        )
        for b, ((best_toks, best_avg), finished) in enumerate(oracle):
            ours_toks = [t for t in np.asarray(res.best_preds[b]).tolist() if t != CFG.pad_id]
            # trim trailing pads only: keep up to length of oracle tokens
            ours_raw = np.asarray(res.best_preds[b]).tolist()
            assert ours_raw[: len(best_toks)] == best_toks, (
                f"batch {b}: {ours_raw} vs oracle {best_toks}"
            )
            assert all(t == CFG.pad_id for t in ours_raw[len(best_toks):])
            np.testing.assert_allclose(
                float(res.best_avg_lprobs[b]), best_avg, atol=1e-4
            )
            # global store: same multiset of avg scores
            ours_avgs = sorted(np.asarray(res.global_avg_lprobs[b]).tolist())
            ref_avgs = sorted(a for _, a in finished)
            np.testing.assert_allclose(ours_avgs, ref_avgs, atol=1e-4)
            del ours_toks

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_ancestry_equals_physical(self, seed):
        """The reorder-free (ancestry-indexed) decode and the physical
        permutation decode are the same algorithm with different KV-cache
        bookkeeping — tokens, best scores, and the whole global store must
        agree across batch/beam/mask/length variations (one-hot selections
        are single-term sums, so the equality is exact up to f32 contraction
        order; scores are checked to 1e-5)."""
        rng = np.random.default_rng(100 + seed)
        B = [1, 2, 5, 3][seed]
        beam = [2, 3, 4, 3][seed]
        T = [4, 7, 5, 6][seed]
        max_p = [6, 9, 8, 12][seed]
        params = decoder_init(jax.random.PRNGKey(40 + seed), CFG)
        memory = jnp.asarray(
            rng.standard_normal((B, T, CFG.d_model)).astype(np.float32) * 0.5
        )
        mem_pad = jnp.asarray(rng.random((B, T)) > 0.8).at[:, 0].set(False)
        bos_ids = jnp.asarray(rng.integers(1, 8, size=(B,)).astype(np.int32))
        forbid = jnp.asarray(rng.random(CFG.vocab_size) > 0.5).at[CFG.eos_id].set(False)
        kw = dict(beam_size=beam, min_pred_size=2, max_pred_size=max_p,
                  forbid_rep_mask=forbid)
        a = beam_search(params, CFG, memory, mem_pad, bos_ids,
                        kv_reorder="ancestry", **kw)
        p = beam_search(params, CFG, memory, mem_pad, bos_ids,
                        kv_reorder="physical", **kw)
        np.testing.assert_array_equal(np.asarray(a.best_preds), np.asarray(p.best_preds))
        np.testing.assert_array_equal(np.asarray(a.global_preds), np.asarray(p.global_preds))
        np.testing.assert_allclose(
            np.asarray(a.best_avg_lprobs), np.asarray(p.best_avg_lprobs), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a.global_avg_lprobs), np.asarray(p.global_avg_lprobs), atol=1e-5
        )
        # the read-time formulation variants of the SAME ancestry algorithm
        # (decode_step ancestry_impl=) must agree with the scatter default:
        # "gather" is bit-identical arithmetic (take_along_axis vs one-hot
        # einsum, both single-term selections); "stacked" sums the same
        # softmax addends along the stacked beams·L axis (f32 order may
        # differ at ulp scale, tokens and 1e-5 scores must still match)
        for impl in ("ancestry:gather", "ancestry:stacked"):
            v = beam_search(params, CFG, memory, mem_pad, bos_ids,
                            kv_reorder=impl, **kw)
            np.testing.assert_array_equal(
                np.asarray(v.best_preds), np.asarray(a.best_preds)
            )
            np.testing.assert_array_equal(
                np.asarray(v.global_preds), np.asarray(a.global_preds)
            )
            np.testing.assert_allclose(
                np.asarray(v.best_avg_lprobs),
                np.asarray(a.best_avg_lprobs), atol=1e-5,
            )

    @pytest.mark.parametrize("kv_reorder", ["physical", "ancestry"])
    def test_eos_bias_schedule_scripts_lengths(self, setup, kv_reorder):
        """A per-clip EOS bias schedule (bench.py's scripted-length realism
        device) forces each clip's beams to retire at exactly the scheduled
        step — caption length (incl. EOS) == target, for every beam in the
        global store, and the min-length mask still wins below
        min_pred_size."""
        params, memory, mem_pad, bos_ids, _ = setup
        max_p = 10
        # clip 1's target (2) sits BELOW min_pred_size=3: the -1e30 min-len
        # mask must override the +1e4 forcing until step 3
        targets = np.array([5, 2, 8], np.int32)
        sched = np.where(
            np.arange(max_p)[None, :] >= targets[:, None] - 1, 1.0e4, 0.0
        ).astype(np.float32)
        res = beam_search(
            params, CFG, jnp.asarray(memory), jnp.asarray(mem_pad),
            jnp.asarray(bos_ids), beam_size=3, min_pred_size=3,
            max_pred_size=max_p, eos_bias_schedule=jnp.asarray(sched),
            kv_reorder=kv_reorder,
        )
        want = np.maximum(targets, 3 + 1)  # min_pred floor: eos at step 3
        # length = first-EOS position + 1 (a random tiny-vocab model can
        # emit token 0 = pad_id as a CONTENT token, so counting non-pad
        # undercounts)
        best = np.asarray(res.best_preds)
        got = np.argmax(best == CFG.eos_id, axis=1) + 1
        np.testing.assert_array_equal(got, want)
        galls = np.asarray(res.global_preds)
        got_all = np.argmax(galls == CFG.eos_id, axis=2) + 1
        np.testing.assert_array_equal(got_all, np.broadcast_to(want[:, None], got_all.shape))
        # nothing but pad after the scheduled EOS
        for b in range(3):
            assert (best[b, want[b]:] == CFG.pad_id).all()

    def test_beam1_equals_greedy(self, setup):
        params, memory, mem_pad, bos_ids, forbid = setup
        res = beam_search(
            params, CFG, jnp.asarray(memory), jnp.asarray(mem_pad),
            jnp.asarray(bos_ids), beam_size=1, min_pred_size=2, max_pred_size=8,
            forbid_rep_mask=jnp.asarray(forbid),
        )
        g = greedy_search(
            params, CFG, jnp.asarray(memory), jnp.asarray(mem_pad),
            jnp.asarray(bos_ids), min_pred_size=2, max_pred_size=8,
            forbid_rep_mask=jnp.asarray(forbid),
        )
        np.testing.assert_array_equal(
            np.asarray(res.best_preds), np.asarray(g.preds)
        )


class TestGreedy:
    def test_matches_naive_loop(self, setup):
        params, memory, mem_pad, bos_ids, forbid = setup
        max_p, min_p = 8, 2
        g = greedy_search(
            params, CFG, jnp.asarray(memory), jnp.asarray(mem_pad),
            jnp.asarray(bos_ids), min_pred_size=min_p, max_pred_size=max_p,
            forbid_rep_mask=jnp.asarray(forbid),
        )
        B = memory.shape[0]
        for b in range(B):
            prefix = [int(bos_ids[b])]
            out = []
            for i in range(max_p):
                logits = _step_logits(
                    params, memory[b : b + 1], mem_pad[b : b + 1], [prefix]
                )[0]
                if i < min_p:
                    logits[CFG.eos_id] = -np.inf
                for tok in prefix:
                    if forbid[tok]:
                        logits[tok] = -np.inf
                nxt = int(np.argmax(logits))
                out.append(nxt)
                prefix.append(nxt)
                if nxt == CFG.eos_id:
                    break
            ours = np.asarray(g.preds[b]).tolist()
            assert ours[: len(out)] == out
            assert all(t == CFG.pad_id for t in ours[len(out):])

    def test_eos_not_before_min_pred(self, setup):
        params, memory, mem_pad, bos_ids, _ = setup
        g = greedy_search(
            params, CFG, jnp.asarray(memory), jnp.asarray(mem_pad),
            jnp.asarray(bos_ids), min_pred_size=3, max_pred_size=8,
        )
        preds = np.asarray(g.preds)
        assert not (preds[:, :3] == CFG.eos_id).any()

    def test_jit_compiles_once(self, setup):
        params, memory, mem_pad, bos_ids, _ = setup
        fn = jax.jit(
            lambda p, m, mp, bi: greedy_search(
                p, CFG, m, mp, bi, min_pred_size=2, max_pred_size=8
            ).preds
        )
        out1 = fn(params, jnp.asarray(memory), jnp.asarray(mem_pad), jnp.asarray(bos_ids))
        out2 = fn(params, jnp.asarray(memory), jnp.asarray(mem_pad), jnp.asarray(bos_ids))
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
