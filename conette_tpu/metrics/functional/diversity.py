"""Diversity, text-stats and new-words metrics.

Twins of the reference custom metrics:
- per-sentence & corpus n-gram diversity ratios vs references
  (``src/conette/metrics/functional/diversity.py:53-120``);
- sentence-length / vocab statistics (``metrics/functional/text_stats.py:17-120``);
- tokens outside the train vocabulary (``metrics/functional/new_words.py:16-42``).
"""

from __future__ import annotations

from typing import Iterable, Sequence


def _ngrams(tokens: Sequence[str], n: int) -> list[tuple]:
    return [tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def sentence_diversity(tokens: Sequence[str], n: int = 1) -> float:
    """unique n-grams / total n-grams in one sentence."""
    ngs = _ngrams(tokens, n)
    if not ngs:
        return 0.0
    return len(set(ngs)) / len(ngs)


def diversity(
    candidates: Sequence[Sequence[str]],
    mult_references: Sequence[Sequence[Sequence[str]]] | None = None,
    max_n: int = 1,
) -> dict[str, float]:
    """Per-sentence mean + corpus-level vocab diversity of candidates, and
    the ratios against references when provided."""
    out: dict[str, float] = {}
    for n in range(1, max_n + 1):
        sent_div = [sentence_diversity(c, n) for c in candidates]
        out[f"sent_div{n}"] = sum(sent_div) / max(len(sent_div), 1)
        all_ngs = [ng for c in candidates for ng in _ngrams(c, n)]
        out[f"corpus_div{n}"] = len(set(all_ngs)) / max(len(all_ngs), 1)

        if mult_references is not None:
            ref_sent_div = [
                sum(sentence_diversity(r, n) for r in refs) / max(len(refs), 1)
                for refs in mult_references
            ]
            mean_ref_sent = sum(ref_sent_div) / max(len(ref_sent_div), 1)
            ref_ngs = [
                ng for refs in mult_references for r in refs for ng in _ngrams(r, n)
            ]
            ref_corpus = len(set(ref_ngs)) / max(len(ref_ngs), 1)
            out[f"sent_div{n}_ratio"] = (
                out[f"sent_div{n}"] / mean_ref_sent if mean_ref_sent > 0 else 0.0
            )
            out[f"corpus_div{n}_ratio"] = (
                out[f"corpus_div{n}"] / ref_corpus if ref_corpus > 0 else 0.0
            )
    return out


def text_stats(
    candidates: Sequence[Sequence[str]],
    mult_references: Sequence[Sequence[Sequence[str]]] | None = None,
) -> dict[str, float]:
    lens = [len(c) for c in candidates]
    vocab = {tok for c in candidates for tok in c}
    out = {
        "sent_len_mean": sum(lens) / max(len(lens), 1),
        "sent_len_min": float(min(lens)) if lens else 0.0,
        "sent_len_max": float(max(lens)) if lens else 0.0,
        "vocab_size": float(len(vocab)),
        "empty_rate": sum(1 for c in candidates if len(c) == 0)
        / max(len(candidates), 1),
    }
    if mult_references is not None:
        ref_vocab = {tok for refs in mult_references for r in refs for tok in r}
        out["ref_vocab_size"] = float(len(ref_vocab))
        out["vocab_coverage"] = (
            len(vocab & ref_vocab) / len(ref_vocab) if ref_vocab else 0.0
        )
    return out


def new_words(
    candidates: Sequence[Sequence[str]],
    train_vocab: Iterable[str],
) -> dict[str, object]:
    train_vocab = set(train_vocab)
    new = sorted({tok for c in candidates for tok in c if tok not in train_vocab})
    return {"new_words_count": float(len(new)), "new_words": new}
