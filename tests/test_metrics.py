"""Metric tests: BLEU vs NLTK oracle, CIDEr-D/ROUGE-L analytic properties,
diversity/text-stats, cross-referencing, augmentations."""

import numpy as np
import pytest

from conette_tpu.metrics import (
    AllMetrics,
    bleu,
    cider_d,
    compute_cross_referencing,
    diversity,
    new_words,
    rouge_l,
    text_stats,
)

CANDS = [
    "a dog barks loudly in the yard".split(),
    "rain falls on the roof".split(),
    "a man speaks".split(),
]
REFS = [
    [
        "a dog is barking loudly in a yard".split(),
        "the dog barks outside".split(),
    ],
    [
        "rain falls on a tin roof".split(),
        "heavy rain hits the roof".split(),
    ],
    [
        "a man is speaking".split(),
        "a man talks".split(),
    ],
]


class TestBleu:
    def test_matches_nltk_corpus_bleu(self):
        from nltk.translate.bleu_score import corpus_bleu

        ours = bleu(CANDS, REFS)
        for n in (1, 2, 3, 4):
            weights = tuple([1.0 / n] * n)
            ref = corpus_bleu(REFS, CANDS, weights=weights)
            # nltk returns ~0 when some n-gram overlap is zero; compare where finite
            if ref > 1e-6:
                np.testing.assert_allclose(ours[f"bleu_{n}"], ref, rtol=1e-6)

    def test_perfect_match(self):
        out = bleu(CANDS, [[c] for c in CANDS])
        for n in (1, 2, 3, 4):
            np.testing.assert_allclose(out[f"bleu_{n}"], 1.0)

    def test_empty_overlap(self):
        out = bleu([["x", "y"]], [[["a", "b"]]])
        assert out["bleu_1"] < 1e-6


class TestRougeL:
    def test_perfect_match(self):
        out = rouge_l(CANDS, [[c] for c in CANDS])
        np.testing.assert_allclose(out["rouge_l"], 1.0)

    def test_known_value(self):
        # cand "a b c", ref "a c" → LCS=2, P=2/3, R=1 → F(β=1.2)
        out = rouge_l([["a", "b", "c"]], [[["a", "c"]]])
        beta = 1.2
        p, r = 2 / 3, 1.0
        expected = (1 + beta**2) * p * r / (r + beta**2 * p)
        np.testing.assert_allclose(out["rouge_l"], expected)

    def test_bounds(self):
        out = rouge_l(CANDS, REFS)
        assert 0.0 < out["rouge_l"] < 1.0


class TestCiderD:
    def test_perfect_match_scores_10(self):
        # all candidates identical to their single distinct reference
        # (≥4 tokens so every n-gram order has a nonzero tf-idf vector)
        cands = [
            ["a", "dog", "barks", "in", "the", "yard"],
            ["heavy", "rain", "falls", "on", "the", "roof"],
            ["an", "old", "man", "speaks", "very", "slowly"],
        ]
        refs = [[c] for c in cands]
        out = cider_d(cands, refs)
        np.testing.assert_allclose(out["cider_d"], 10.0, atol=1e-6)

    def test_length_penalty(self):
        cands_short = [["dog"], ["rain", "falls"], ["man", "speaks"]]
        refs = [[["dog", "barks", "loud", "now", "often", "daily", "x", "y"]],
                [["rain", "falls"]], [["man", "speaks"]]]
        out = cider_d(cands_short, refs)
        assert out["cider_d_sents"][0] < out["cider_d_sents"][1]

    def test_bounds(self):
        out = cider_d(CANDS, REFS)
        assert 0.0 <= out["cider_d"] <= 10.0
        assert len(out["cider_d_sents"]) == 3


class TestDiversityStats:
    def test_diversity_unique(self):
        corpus, sents = diversity([["a", "b", "c"]], [[["a", "b"]]], n_max=1)
        np.testing.assert_allclose(corpus["sents_div1.cands"], 1.0)
        np.testing.assert_allclose(sents["sents_div1.cands"], [1.0])

    def test_diversity_repeats(self):
        corpus, _ = diversity([["a", "a", "a", "a"]], [[["a", "b"]]], n_max=1)
        np.testing.assert_allclose(corpus["sents_div1.cands"], 0.25)

    def test_diversity_ratio_zero_when_ref_empty(self):
        # reference semantics: per-sentence ratio is 0 where the ref
        # diversity is 0 (diversity.py:113-116)
        corpus, sents = diversity([["a", "b"]], [[[]]], n_max=1)
        assert sents["sents_div1.ratio"] == [0.0]

    def test_text_stats(self):
        corpus, sents = text_stats(CANDS, REFS)
        assert corpus["sent_len.cands"] == pytest.approx(
            (len(CANDS[0]) + len(CANDS[1]) + len(CANDS[2])) / 3
        )
        assert corpus["empty_sents"] == 0.0
        assert 0.0 < corpus["vocab_coverage"] <= 1.0
        assert corpus["vocab_in_ref_ratio"] <= 1.0
        # per-sentence CSV quirk: underscored key (reference
        # text_stats.py:96-101)
        assert len(sents["sent_len_cands"]) == len(CANDS)

    def test_new_words(self):
        corpus, sents = new_words([["a", "zebra"]], train_vocab=["a", "dog"])
        assert corpus["new_words"] == 1.0
        assert sents["new_words"] == [1.0]

    def test_new_words_counts_unique_per_sentence(self):
        # "zebra zebra" is ONE new unique word; corpus = mean over sents
        corpus, sents = new_words(
            [["zebra", "zebra"], ["a"]], train_vocab=["a"]
        )
        assert sents["new_words"] == [1.0, 0.0]
        assert corpus["new_words"] == 0.5


class TestAllMetrics:
    def test_computes_available_and_skips_gated(self):
        am = AllMetrics(
            train_vocab=["a", "dog", "rain"],
            use_java=False, use_fense=False, use_bert_score=False,
        )
        corpus, sents = am(
            [" ".join(c) for c in CANDS],
            [[" ".join(r) for r in refs] for refs in REFS],
        )
        for key in (
            "bleu_1", "bleu_4", "rouge_l", "cider_d",
            "sents_div1.cands", "corpus_div3.ratio",
            "sent_len.cands", "vocab_len.cands", "new_words",
        ):
            assert key in corpus, key
        assert "spice" not in corpus  # gated (no java jar)
        assert len(sents["cider_d"]) == 3
        assert len(sents["bleu_4"]) == 3
        assert len(sents["sents_div2.ratio"]) == 3


class TestFluencyAndFense:
    def test_fluency_outputs_threshold_and_keys(self):
        from conette_tpu.metrics.functional.fluency import (
            ERROR_NAMES,
            fluency_outputs,
        )

        probs = {f"{n}_prob": np.array([0.1, 0.95]) for n in ERROR_NAMES}
        corpus, sents = fluency_outputs(probs)
        assert sents["fer"] == [0.0, 1.0]  # error_prob > 0.9 flags
        assert corpus["fer"] == 0.5
        for n in ERROR_NAMES:
            assert corpus[f"fer.{n}_prob"] == pytest.approx(0.525)

    def test_fense_applies_echecker_penalty(self, monkeypatch):
        from conette_tpu.metrics.functional import fense as fense_mod

        class FakeSbert:
            def encode(self, sents, show_progress_bar=False):
                # "bad" maps opposite to everything else
                return np.array(
                    [[1.0, 0.0] if "bad" not in s else [0.0, 1.0] for s in sents]
                )

        monkeypatch.setitem(fense_mod._CACHE, "model", FakeSbert())

        def fluency_fn(sents):
            from conette_tpu.metrics.functional.fluency import ERROR_NAMES

            err = np.array([0.99 if "bad" in s else 0.01 for s in sents])
            return {f"{n}_prob": err for n in ERROR_NAMES}

        out = fense_mod.fense(
            ["a dog barks", "bad bad caption"],
            [["a dog barks"], ["a dog barks"]],
            fluency_fn=fluency_fn,
        )
        # fluent caption: sim 1.0, no penalty; disfluent: sim 0 x 0.1
        assert out["fense_sents"][0] == pytest.approx(1.0)
        assert out["fer_sents"] == [0.0, 1.0]
        assert out["sbert_sim_sents"][1] == pytest.approx(0.0, abs=1e-9)
        assert out["fense_sents"][1] == pytest.approx(0.0, abs=1e-9)
        assert "fer.add_tail_prob" in out

    def test_fense_without_echecker_warns_and_equals_sbert(
        self, monkeypatch, caplog
    ):
        import logging

        from conette_tpu.metrics.functional import fense as fense_mod
        from conette_tpu.metrics.functional import fluency as fluency_mod

        class FakeSbert:
            def encode(self, sents, show_progress_bar=False):
                return np.ones((len(sents), 4))

        monkeypatch.setitem(fense_mod._CACHE, "model", FakeSbert())
        monkeypatch.setitem(fluency_mod._CACHE, "echecker", None)
        with caplog.at_level(logging.WARNING):
            out = fense_mod.fense(["a"], [["b"]])
        assert out["fense"] == out["sbert_sim"]
        assert any("WITHOUT the fluency-error checker" in r.message
                   for r in caplog.records)

    def test_echecker_env_gating(self, monkeypatch):
        from conette_tpu.metrics.functional import fluency as fluency_mod

        monkeypatch.delitem(fluency_mod._CACHE, "echecker", raising=False)
        monkeypatch.delenv("CONETTE_ECHECKER_MODEL", raising=False)
        assert fluency_mod.load_echecker() is None
        assert not fluency_mod.echecker_available()


class TestBertScore:
    def test_greedy_matching_with_fake_embedder(self):
        from conette_tpu.metrics.functional.bert_score import bert_score

        vecs = {"a": [1.0, 0.0], "b": [0.0, 1.0], "c": [1.0, 1.0]}

        def embed_fn(sents):
            return [
                np.array([vecs[w] for w in s.split()], np.float64) for s in sents
            ]

        out = bert_score(["a b"], [["a b", "b b"]], embed_fn=embed_fn)
        # identical ref matches perfectly and wins the max-reduction
        assert out["bert_score.precision"] == pytest.approx(1.0)
        assert out["bert_score.recall"] == pytest.approx(1.0)
        assert out["bert_score.f1"] == pytest.approx(1.0)
        assert out["bert_score.f1_sents"] == [pytest.approx(1.0)]

    def test_partial_overlap(self):
        from conette_tpu.metrics.functional.bert_score import bert_score

        def embed_fn(sents):
            basis = {"a": [1.0, 0.0], "b": [0.0, 1.0]}
            return [
                np.array([basis[w] for w in s.split()], np.float64) for s in sents
            ]

        out = bert_score(["a b"], [["a a"]], embed_fn=embed_fn)
        # precision: cand tokens (a->1, b->0) = 0.5; recall: both ref a's -> 1
        assert out["bert_score.precision"] == pytest.approx(0.5)
        assert out["bert_score.recall"] == pytest.approx(1.0)


class TestSpiderFlWiring:
    def test_all_metrics_emits_spider_fl_with_fakes(self, monkeypatch):
        from conette_tpu.metrics import all_metrics as am_mod

        # fake java SPICE so spider exists
        monkeypatch.setattr(am_mod.java_metrics, "meteor_available", lambda: False)
        monkeypatch.setattr(am_mod.java_metrics, "spice_available", lambda: True)
        monkeypatch.setattr(
            am_mod.java_metrics,
            "spice",
            lambda cands, mrefs: {
                "spice": 0.2,
                "spice_sents": [0.2] * len(cands),
            },
        )
        # fake fense with an echecker flagging the second caption
        monkeypatch.setattr(am_mod.fense_mod, "is_available", lambda: True)

        def fake_fense(cands, mrefs):
            fer = [0.0] * len(cands)
            fer[-1] = 1.0
            return {
                "fense": 0.5,
                "fense_sents": [0.5] * len(cands),
                "sbert_sim": 0.5,
                "sbert_sim_sents": [0.5] * len(cands),
                "fer": sum(fer) / len(fer),
                "fer_sents": fer,
            }

        monkeypatch.setattr(am_mod.fense_mod, "fense", fake_fense)
        monkeypatch.setattr(
            am_mod.bert_score_mod, "is_available", lambda: False
        )

        am = AllMetrics(use_java=True, use_fense=True)
        corpus, sents = am(
            [" ".join(c) for c in CANDS],
            [[" ".join(r) for r in refs] for refs in REFS],
        )
        assert "spider" in corpus and "spider_fl" in corpus
        # flagged sentence: spider x (1 - 0.9)
        assert sents["spider_fl"][-1] == pytest.approx(sents["spider"][-1] * 0.1)
        assert sents["spider_fl"][0] == pytest.approx(sents["spider"][0])
        assert corpus["spider_fl"] == pytest.approx(
            sum(sents["spider_fl"]) / len(sents["spider_fl"])
        )


class TestCrossReferencing:
    def test_holds_out_refs(self):
        def metric(cands, refs):
            return rouge_l([c.split() for c in cands],
                           [[r.split() for r in rs] for rs in refs])

        refs = [[" ".join(r) for r in rr] for rr in REFS]
        out = compute_cross_referencing(metric, refs, n_rounds=2)
        assert "cross_ref_rouge_l" in out
        assert 0.0 <= out["cross_ref_rouge_l"] <= 1.0


class TestAugment:
    def test_spec_augment_zeroes_stripes(self):
        import jax
        from conette_tpu.train.augment import spec_augment, spec_augment_ratio

        x = np.ones((2, 64, 32), np.float32)
        y = np.asarray(spec_augment(jax.random.PRNGKey(0), x, 16, 2, 8, 2))
        assert y.shape == x.shape
        assert (y == 0).any() and (y == 1).any()
        y2 = np.asarray(spec_augment_ratio(jax.random.PRNGKey(1), x))
        assert (y2 == 0).any()

    def test_spec_augment_row_ids_batch_invariant(self):
        """A row's stripes depend only on (key, row_id): a process feeding
        rows [4..8) of the global batch with row_ids=[4..8) draws exactly
        the stripes those rows get in the full-batch call (multi-host
        equality precondition; see main.py to_train_batch)."""
        import jax
        import jax.numpy as jnp
        from conette_tpu.train.augment import spec_augment

        rng = np.random.default_rng(0)
        x = rng.standard_normal((8, 32, 16)).astype(np.float32)
        key = jax.random.PRNGKey(7)
        full = np.asarray(spec_augment(key, jnp.asarray(x), 8, 2, 4, 2))
        part = np.asarray(
            spec_augment(
                key, jnp.asarray(x[4:]), 8, 2, 4, 2,
                row_ids=jnp.arange(4, 8),
            )
        )
        np.testing.assert_array_equal(part, full[4:])

    def test_speed_perturb_shape_static(self):
        import jax
        from conette_tpu.train.augment import speed_perturb

        x = np.random.default_rng(0).standard_normal((2, 100)).astype(np.float32)
        y = np.asarray(speed_perturb(jax.random.PRNGKey(0), x, p=1.0))
        assert y.shape == x.shape

    def test_cutout_fills(self):
        import jax
        from conette_tpu.train.augment import cutout_spec

        x = np.zeros((1, 32, 32), np.float32)
        y = np.asarray(cutout_spec(jax.random.PRNGKey(2), x, fill_value=-1.0))
        assert (y == -1.0).any()

    def test_mixup_convexity(self):
        import jax
        from conette_tpu.train.augment import mixup

        x = np.stack([np.zeros((4,)), np.ones((4,))]).astype(np.float32)
        mixed, lbd, idx = mixup(jax.random.PRNGKey(0), x)
        lbd = float(lbd)
        assert 0.5 <= lbd <= 1.0
        assert np.all(np.asarray(mixed) >= 0) and np.all(np.asarray(mixed) <= 1)

    def test_pann_mixup_pairs(self):
        import jax.numpy as jnp
        from conette_tpu.train.augment import pann_mixup

        x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2))
        lam = jnp.asarray([0.7, 0.3, 0.5, 0.5])
        out = np.asarray(pann_mixup(x, lam))
        np.testing.assert_allclose(out[0], 0.7 * x[0] + 0.3 * x[1])
