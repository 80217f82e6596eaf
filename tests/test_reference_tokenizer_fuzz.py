"""Randomized-corpus fuzz of the tokenizer twin vs the reference's ACTUAL
``AACTokenizer`` (``tokenization/aac_tokenizer.py``).

The fixed-corpus parity test (``test_reference_plm_parity.py``) and the
7,828-beam released-data round-trip pin the production distribution; this
file drives both tokenizers over seeded random corpora that cover the
long tail — numerals, unicode letters, contraction clusters, hyphens,
punctuation runs the normalizers must strip, repeated whitespace,
sentences that normalize to empty — and asserts the full contract on each
draw: vocab/stoi identity, min/max sentence sizes, encode ids (padded +
ragged), decode round trip, and OOV handling under an explicit unk
default.

Word SPLITTING is shimmed to the regex twin on both sides (no spacy in
this image; see ``reference_shim._install_spacy_shim``), so what this
fuzz genuinely exercises is everything around it in real reference code:
the pre/post normalizer pipeline, vocab assembly order, bos/eos/pad
insertion, batch padding, size bookkeeping, and detokenization.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.reference_shim import load_reference_plm

from conette_tpu.tokenization import AACTokenizer

WORDS = (
    "a the an of in on at is are was birds water engine man woman child "
    "dog rain wind door metal glass music speaks chirping running loud "
    "soft distant nearby followed by while and then background foreground"
).split()
ODD = [
    "don't", "it's", "o'clock", "won't", "cannot", "gonna",
    "bird's", "children's", "high-pitched", "low-frequency", "mid-range",
    "3", "42", "1970s", "2nd", "café", "naïve", "über", "Ω",
    "...", "!!", "??", ";", ":", "--", "(quiet)", '"loud"', "[muffled]",
]
SEPS = [" ", "  ", " \t "]


def _sentence(rng: np.random.Generator) -> str:
    n = int(rng.integers(1, 14))
    toks = []
    for _ in range(n):
        pool = ODD if rng.random() < 0.25 else WORDS
        toks.append(pool[int(rng.integers(len(pool)))])
    sep = SEPS[int(rng.integers(len(SEPS)))]
    s = sep.join(toks)
    if rng.random() < 0.3:
        s = s.upper() if rng.random() < 0.5 else s.capitalize()
    if rng.random() < 0.2:
        s = " " + s + "  "
    return s


def _corpus(seed: int, n: int = 40) -> list[str]:
    rng = np.random.default_rng(seed)
    corpus = [_sentence(rng) for _ in range(n)]
    # one sentence that normalizes to (nearly) empty
    corpus[n // 2] = "... !!"
    return corpus


@pytest.fixture(scope="module")
def ref_ns():
    return load_reference_plm()


@pytest.mark.parametrize("seed", range(8))
def test_fit_encode_decode_parity_on_random_corpus(ref_ns, seed):
    corpus = _corpus(seed)
    ref_tok = ref_ns.AACTokenizer()
    ref_tok.fit(corpus)
    our_tok = AACTokenizer()
    our_tok.fit(corpus)

    # vocab assembly: identical token set, identical id order, counts
    assert dict(ref_tok.get_vocab()) == dict(our_tok.get_vocab())
    assert dict(ref_tok._stoi) == dict(our_tok._stoi)
    assert ref_tok.get_max_sentence_size() == our_tok.get_max_sentence_size()
    assert ref_tok.get_min_sentence_size() == our_tok.get_min_sentence_size()

    # batch-padded encode (ids + pad placement)
    ref_ids = ref_tok.encode_batch(corpus, add_bos_eos=True, padding="batch")
    our_ids = our_tok.encode_batch(corpus, add_bos_eos=True, padding="batch")
    np.testing.assert_array_equal(ref_ids.numpy(), np.asarray(our_ids))

    # ragged encode (no padding, python ids)
    ref_ragged = ref_tok.encode_batch(corpus, add_bos_eos=False, out_type="int")
    our_ragged = our_tok.encode_batch(corpus, add_bos_eos=False, out_type="int")
    assert ref_ragged == our_ragged

    # decode round trip through the padded ids
    assert ref_tok.decode_batch(ref_ids) == our_tok.decode_batch(
        np.asarray(our_ids)
    )


@pytest.mark.parametrize("seed", [101, 202])
def test_oov_unk_default_parity(ref_ns, seed):
    """Encode sentences holding words ABSENT from the fit corpus: both
    sides map them to <unk> under an explicit unk default, and both raise
    under the raising default (the reference signature's actual default,
    aac_tokenizer.py:395)."""
    corpus = _corpus(seed)
    ref_tok = ref_ns.AACTokenizer()
    ref_tok.fit(corpus)
    our_tok = AACTokenizer()
    our_tok.fit(corpus)

    oov = ["a zyzzyva klaxon hums", "the quokka's blorp"]
    ref_ids = ref_tok.encode_batch(
        oov, add_bos_eos=True, padding="batch", default=ref_tok.unk_token
    )
    our_ids = our_tok.encode_batch(
        oov, add_bos_eos=True, padding="batch", default=our_tok.unk_token
    )
    np.testing.assert_array_equal(ref_ids.numpy(), np.asarray(our_ids))
    assert (ref_ids.numpy() == ref_tok.unk_token_id).any()

    with pytest.raises(Exception):
        ref_tok.encode_batch(oov, add_bos_eos=True, padding="batch")
    with pytest.raises(Exception):
        our_tok.encode_batch(oov, add_bos_eos=True, padding="batch")
