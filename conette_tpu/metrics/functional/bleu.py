"""Corpus BLEU-N (COCO-caption convention, as used by aac-metrics).

Twin of the BLEU1-4 metrics in the reference's ``AllMetrics``
(``src/conette/metrics/classes/all_metrics.py:155-171``): corpus-level
clipped n-gram precision with geometric mean and brevity penalty using the
*closest* reference length.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Sequence


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu(
    candidates: Sequence[Sequence[str]],
    mult_references: Sequence[Sequence[Sequence[str]]],
    max_n: int = 4,
) -> dict[str, float]:
    """:param candidates: tokenized candidates, one per example.
    :param mult_references: tokenized references per example.
    :returns: {"bleu_1": ..., ..., f"bleu_{max_n}": ...}
    """
    if len(candidates) != len(mult_references):
        raise ValueError(f"{len(candidates)=} != {len(mult_references)=}")

    clipped = [0] * max_n
    totals = [0] * max_n
    cand_len = 0
    ref_len = 0

    for cand, refs in zip(candidates, mult_references):
        cand = list(cand)
        cand_len += len(cand)
        # closest reference length (ties → shorter)
        lens = sorted(len(r) for r in refs)
        ref_len += min(lens, key=lambda rl: (abs(rl - len(cand)), rl))
        for n in range(1, max_n + 1):
            cand_ng = _ngrams(cand, n)
            max_ref = Counter()
            for ref in refs:
                for ng, c in _ngrams(list(ref), n).items():
                    if c > max_ref[ng]:
                        max_ref[ng] = c
            totals[n - 1] += max(len(cand) - n + 1, 0)
            clipped[n - 1] += sum(min(c, max_ref[ng]) for ng, c in cand_ng.items())

    bp = 1.0 if cand_len > ref_len else math.exp(1.0 - ref_len / max(cand_len, 1))
    out: dict[str, float] = {}
    log_sum = 0.0
    for n in range(1, max_n + 1):
        # tiny epsilon like coco to avoid log(0) on empty overlap
        p = (clipped[n - 1] + (1e-9 if clipped[n - 1] == 0 else 0)) / max(
            totals[n - 1], 1
        )
        log_sum += math.log(max(p, 1e-12))
        out[f"bleu_{n}"] = bp * math.exp(log_sum / n)
    return out
