"""Metric-functional parity vs the reference's ACTUAL
``metrics/functional/{diversity,text_stats,new_words}.py``.

The offline harness (``scripts/parity_report.py``) already proves these
columns on the RELEASED outputs; this file drives the reference's real
functions on randomized + adversarial corpora (varying ref counts, empty
candidates, unicode, repeated tokens, n up to 4, cumulative modes) where
the published data can't discriminate. Bit-match is expected: both sides
compute in float64 and our ``_subsample_indexes`` replays the reference's
``torch.Generator`` randint stream exactly.
"""

from __future__ import annotations

import importlib
import random
import sys
import types

import numpy as np
import pytest

from conette_tpu.metrics.functional.diversity import (
    diversity as our_diversity,
    new_words as our_new_words,
    text_stats as our_text_stats,
    vocab_size as our_vocab_size,
)

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def ref():
    prev = sys.dont_write_bytecode
    sys.dont_write_bytecode = True
    try:
        if "conette" not in sys.modules:
            pkg = types.ModuleType("conette")
            pkg.__path__ = [REF_SRC + "/conette"]
            sys.modules["conette"] = pkg
        div = importlib.import_module("conette.metrics.functional.diversity")
        ts = importlib.import_module("conette.metrics.functional.text_stats")
        nw = importlib.import_module("conette.metrics.functional.new_words")
    finally:
        sys.dont_write_bytecode = prev
    return types.SimpleNamespace(
        diversity=div.diversity,
        vocab_size=div.vocab_size,
        text_stats=ts.text_stats,
        new_words=nw.new_words,
    )


_WORDS = [
    "a", "dog", "barks", "rain", "falls", "wind", "blows", "éàü",
    "engine", "hums", "water", "flows", "bird", "sings", "man", "speaks",
]


def _corpus(seed: int, n: int, min_refs=3, max_refs=5, allow_empty=True):
    rng = random.Random(seed)

    def sent(lo=0 if allow_empty else 1, hi=12):
        return " ".join(
            rng.choice(_WORDS) for _ in range(rng.randint(lo, hi))
        )

    cands = [sent() for _ in range(n)]
    mrefs = [
        [sent(1, 14) for _ in range(rng.randint(min_refs, max_refs))]
        for _ in range(n)
    ]
    return cands, mrefs


def _to_float(d):
    out = {}
    for k, v in d.items():
        arr = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float64
        )
        out[k] = arr
    return out


def _assert_dicts_equal(ref_d, our_d, label, rtol=1e-12, atol=1e-12):
    # 1e-12: torch and numpy f64 reductions differ in summation order
    # (pairwise vs sequential) by ~1 ulp; everything else is exact
    ref_d, our_d = _to_float(ref_d), _to_float(our_d)
    assert set(ref_d) == set(our_d), (
        f"{label}: key mismatch {set(ref_d) ^ set(our_d)}"
    )
    for k in ref_d:
        np.testing.assert_allclose(
            our_d[k], ref_d[k], rtol=rtol, atol=atol,
            err_msg=f"{label}[{k}]", equal_nan=True,
        )


class TestDiversityParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("n_max", [1, 2, 4])
    @pytest.mark.parametrize("cumulative", [False, True])
    def test_bit_match(self, ref, seed, n_max, cumulative):
        cands, mrefs = _corpus(seed, 24)
        rc, rs = ref.diversity(cands, mrefs, n=n_max, cumulative=cumulative)
        oc, os_ = our_diversity(cands, mrefs, n_max=n_max, cumulative=cumulative)
        _assert_dicts_equal(rc, oc, f"corpus(n={n_max},{cumulative=})")
        _assert_dicts_equal(rs, os_, f"sents(n={n_max},{cumulative=})")

    def test_use_ngram_count_false(self, ref):
        cands, mrefs = _corpus(7, 16)
        rc, rs = ref.diversity(cands, mrefs, n=2, use_ngram_count=False)
        oc, os_ = our_diversity(cands, mrefs, n_max=2, use_ngram_count=False)
        _assert_dicts_equal(rc, oc, "corpus(use_ngram_count=False)")
        _assert_dicts_equal(rs, os_, "sents(use_ngram_count=False)")

    def test_vocab_size_keys(self, ref):
        cands, mrefs = _corpus(3, 12)
        rc, rs = ref.vocab_size(cands, mrefs)
        oc, os_ = our_vocab_size(cands, mrefs)
        _assert_dicts_equal(rc, oc, "vocab_size corpus")
        _assert_dicts_equal(rs, os_, "vocab_size sents")

    def test_empty_cands_rows(self, ref):
        cands = ["", "a dog", "", "rain falls rain falls"]
        mrefs = [["a dog barks", "rain"], ["a"], ["wind", "water flows"], ["a", "b c"]]
        rc, rs = ref.diversity(cands, mrefs, n=2)
        oc, os_ = our_diversity(cands, mrefs, n_max=2)
        _assert_dicts_equal(rc, oc, "corpus empty-rows")
        _assert_dicts_equal(rs, os_, "sents empty-rows")


class TestTextStatsParity:
    @pytest.mark.parametrize("seed", [0, 5])
    def test_bit_match(self, ref, seed):
        cands, mrefs = _corpus(seed, 24, allow_empty=False)
        rc, rs = ref.text_stats(cands, mrefs)
        oc, os_ = our_text_stats(cands, mrefs)
        _assert_dicts_equal(rc, oc, "text_stats corpus")
        _assert_dicts_equal(rs, os_, "text_stats sents")

    def test_with_empty_cands(self, ref):
        cands, mrefs = _corpus(9, 24, allow_empty=True)
        # guarantee at least one empty candidate
        cands[0] = ""
        rc, rs = ref.text_stats(cands, mrefs)
        oc, os_ = our_text_stats(cands, mrefs)
        _assert_dicts_equal(rc, oc, "text_stats corpus (empty cands)")
        _assert_dicts_equal(rs, os_, "text_stats sents (empty cands)")


class TestNewWordsParity:
    def test_bit_match(self, ref):
        cands, mrefs = _corpus(11, 20)
        train_vocab = _WORDS[:8]
        rc, rs = ref.new_words(cands, mrefs, train_vocab=train_vocab)
        oc, os_ = our_new_words(cands, mrefs, train_vocab=train_vocab)
        _assert_dicts_equal(rc, oc, "new_words corpus")
        _assert_dicts_equal(rs, os_, "new_words sents")

    def test_empty_train_vocab(self, ref):
        cands, mrefs = _corpus(13, 10)
        rc, rs = ref.new_words(cands, mrefs, train_vocab=())
        oc, os_ = our_new_words(cands, mrefs, train_vocab=())
        _assert_dicts_equal(rc, oc, "new_words corpus (empty vocab)")
        _assert_dicts_equal(rs, os_, "new_words sents (empty vocab)")
