"""Normalizer parity vs the reference's ACTUAL ``tokenization/normalizers.py``.

The 7,828-beam released-data round-trip (``tests/test_reference_parity.py``)
already proves the normalizer pipeline on real checkpoint outputs; this file
drives the reference's real classes on ADVERSARIAL strings (unicode
punctuation runs, special-token soup, hyphen/space pathologies, random
fuzz) where the released captions are too tame to discriminate.
"""

from __future__ import annotations

import importlib
import random
import string
import sys
import types

import pytest

from conette_tpu.tokenization import normalizers as ours

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def ref():
    sys.path_hooks  # noqa: B018 — keep flake quiet about the import dance
    prev = sys.dont_write_bytecode
    sys.dont_write_bytecode = True
    try:
        if "conette" not in sys.modules:
            pkg = types.ModuleType("conette")
            pkg.__path__ = [REF_SRC + "/conette"]
            sys.modules["conette"] = pkg
        mod = importlib.import_module("conette.tokenization.normalizers")
    finally:
        sys.dont_write_bytecode = prev
    return mod


# pairs of (reference class factory, ours factory) taking no args
_PAIRS = [
    ("Lowercase", lambda m: m.Lowercase(), lambda: ours.Lowercase()),
    ("Strip", lambda m: m.Strip(), lambda: ours.Strip()),
    (
        "CleanDoubleSpaces",
        lambda m: m.CleanDoubleSpaces(),
        lambda: ours.CleanDoubleSpaces(),
    ),
    (
        "ReplaceRarePuncChars",
        lambda m: m.ReplaceRarePuncChars(),
        lambda: ours.ReplaceRarePuncChars(),
    ),
    (
        "CleanPunctuation",
        lambda m: m.CleanPunctuation(),
        lambda: ours.CleanPunctuation(),
    ),
    (
        "CleanSpacesBeforePunctuation",
        lambda m: m.CleanSpacesBeforePunctuation(),
        lambda: ours.CleanSpacesBeforePunctuation(),
    ),
    (
        "CleanSpecialTokens",
        lambda m: m.CleanSpecialTokens(),
        lambda: ours.CleanSpecialTokens(),
    ),
    (
        "CleanHyphenSpaces",
        lambda m: m.CleanHyphenSpaces(),
        lambda: ours.CleanHyphenSpaces(),
    ),
]

_EDGE_STRINGS = [
    "",
    " ",
    "   ",
    "A Bird SINGS loudly!!!",
    "it’s a “quoted” phrase — with em-dash… and ‘single’ quotes",
    "rain  falls   on	tabs\nand newlines",
    "<bos> a dog <eos> barks <pad> <unk> <bos_clotho>",
    "high - pitched and low - energy whirring",
    "semi-permanent water-proof roof - top",
    "!!!???;;;:::...,,,///\\\\(((>)))[[[]]]{{}}",
    "don't can't won't it's o'clock",
    "a!b?c.d,e;f:g",
    "  leading and trailing  ",
    "mixed 123 numbers 4.5 and 6,7 ranges 8-9",
    "unicode éàü ñ 空 🌧 rain",
    "a - - b - c-- d --e",
    "words <eos> after eos are kept by replace-based cleaners",
    " nbsp spaces ",
    "tab\tseparated\twords",
    "'quoted' `backtick` \"double\"",
]


def _fuzz_strings(n=300, seed=0):
    rng = random.Random(seed)
    pool = (
        string.ascii_letters
        + string.digits
        + " .,!?;:-'\"()<>/"
        + "’‘“”—…«»"
        + "  "  # bias toward spaces
    )
    out = []
    for _ in range(n):
        ln = rng.randint(0, 60)
        out.append("".join(rng.choice(pool) for _ in range(ln)))
    return out


class TestNormalizerParity:
    @pytest.mark.parametrize("name,mk_ref,mk_ours", _PAIRS, ids=[p[0] for p in _PAIRS])
    def test_edge_strings(self, ref, name, mk_ref, mk_ours):
        r, o = mk_ref(ref), mk_ours()
        for s in _EDGE_STRINGS:
            assert o(s) == r(s), f"{name} diverges on {s!r}"

    @pytest.mark.parametrize("name,mk_ref,mk_ours", _PAIRS, ids=[p[0] for p in _PAIRS])
    def test_fuzz(self, ref, name, mk_ref, mk_ours):
        r, o = mk_ref(ref), mk_ours()
        for s in _fuzz_strings():
            assert o(s) == r(s), f"{name} diverges on {s!r}"

    def test_trunc_at_eos(self, ref):
        r = ref.TruncAtEos()
        o = ours.TruncAtEos()
        for s in _EDGE_STRINGS + _fuzz_strings(100, seed=1):
            assert o(s) == r(s), f"TruncAtEos diverges on {s!r}"

    @pytest.mark.parametrize("lowercase", [True, False])
    @pytest.mark.parametrize(
        "punctuation_mode",
        ["remove", "keep_comma", "keep_comma_dot", "keep_hyphen", "keep"],
    )
    def test_pre_encode_pipeline_actual_factory(
        self, lowercase, punctuation_mode
    ):
        """The reference's ACTUAL ``_get_pre_encoding_normalizers``
        (aac_tokenizer.py:908-950) vs our factory, every
        (lowercase, punctuation_mode) combination."""
        from tests.reference_shim import load_reference_plm

        ref_tok_mod = sys.modules[
            load_reference_plm().AACTokenizer.__module__
        ]
        ref_pipe = ref_tok_mod._get_pre_encoding_normalizers(
            lowercase, punctuation_mode
        )
        our_pipe = ours.get_pre_encoding_normalizers(
            lowercase, punctuation_mode
        )
        assert [type(n).__name__ for n in our_pipe] == [
            type(n).__name__ for n in ref_pipe
        ]
        for s in _EDGE_STRINGS + _fuzz_strings(200, seed=2):
            expected = s
            for n in ref_pipe:
                expected = n(expected)
            got = s
            for n in our_pipe:
                got = n(got)
            assert got == expected, (
                f"pre-encode({lowercase=}, {punctuation_mode=}) "
                f"diverges on {s!r}"
            )

    @pytest.mark.parametrize("lowercase", [True, False])
    def test_post_decode_pipeline_actual_factory(self, lowercase):
        """The reference's ACTUAL ``_get_post_decoding_normalizers``
        (aac_tokenizer.py:953-963) vs our factory."""
        from tests.reference_shim import load_reference_plm

        ref_tok_mod = sys.modules[
            load_reference_plm().AACTokenizer.__module__
        ]
        ref_pipe = ref_tok_mod._get_post_decoding_normalizers(lowercase)
        our_pipe = ours.get_post_decoding_normalizers(lowercase)
        assert [type(n).__name__ for n in our_pipe] == [
            type(n).__name__ for n in ref_pipe
        ]
        for s in _EDGE_STRINGS + _fuzz_strings(200, seed=3):
            expected = s
            for n in ref_pipe:
                expected = n(expected)
            got = s
            for n in our_pipe:
                got = n(got)
            assert got == expected, f"post-decode diverges on {s!r}"
