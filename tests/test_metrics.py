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
        out = diversity([["a", "b", "c"]], max_n=1)
        np.testing.assert_allclose(out["sent_div1"], 1.0)

    def test_diversity_repeats(self):
        out = diversity([["a", "a", "a", "a"]], max_n=1)
        np.testing.assert_allclose(out["sent_div1"], 0.25)

    def test_text_stats(self):
        out = text_stats(CANDS, REFS)
        assert out["sent_len_mean"] == pytest.approx(
            (len(CANDS[0]) + len(CANDS[1]) + len(CANDS[2])) / 3
        )
        assert out["empty_rate"] == 0.0
        assert 0.0 < out["vocab_coverage"] <= 1.0

    def test_new_words(self):
        out = new_words([["a", "zebra"]], train_vocab=["a", "dog"])
        assert out["new_words_count"] == 1.0
        assert out["new_words"] == ["zebra"]


class TestAllMetrics:
    def test_computes_available_and_skips_gated(self):
        am = AllMetrics(train_vocab=["a", "dog", "rain"], use_java=False, use_fense=False)
        corpus, sents = am(
            [" ".join(c) for c in CANDS],
            [[" ".join(r) for r in refs] for refs in REFS],
        )
        for key in ("bleu_1", "bleu_4", "rouge_l", "cider_d", "vocab_size"):
            assert key in corpus, key
        assert "spice" not in corpus  # gated (no java jar)
        assert len(sents["cider_d"]) == 3


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
