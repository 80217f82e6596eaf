#!/usr/bin/env python
"""Print the offline parity report vs the reference's published outputs.

Usage: python scripts/parity_report.py [--outputs-dir DIR]

For each dataset (Clotho-eval, AudioCaps-test) reports:
- corpus BLEU1-4 / ROUGE-L / CIDEr-D computed by this package's metric stack
  vs the published scores of the released checkpoint (abs diff);
- per-sentence cider_d / rouge_l max abs diff vs the published CSV columns;
- id->token map reconstruction stats (vocab size, conflicts);
- byte-exact decode rate of all published beams through AACTokenizer.

Exit code 0 iff every check passes the same thresholds as
tests/test_reference_parity.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conette_tpu import parity  # noqa: E402


def main() -> int:
    args_parser = argparse.ArgumentParser(description=__doc__)
    args_parser.add_argument("--outputs-dir", default=None)
    args = args_parser.parse_args()

    dirpath = args.outputs_dir
    ok = True
    for dataset in sorted(parity.DATASETS):
        rows = parity.load_rows(dataset, dirpath)
        published = parity.load_corpus_scores(dataset, dirpath)
        got, sents = parity.compute_offline_corpus_scores(rows)

        print(f"\n== {dataset} ({len(rows)} clips) ==")
        print(f"{'metric':<22} {'ours':>14} {'published':>14} {'absdiff':>10}")
        for metric in parity.OFFLINE_CORPUS_METRICS:
            diff = abs(got[metric] - published[metric])
            ok &= diff <= 1e-6
            flag = "" if diff <= 1e-6 else "  <-- MISMATCH"
            print(
                f"{metric:<22} {got[metric]:>14.8f} "
                f"{published[metric]:>14.8f} {diff:>10.2e}{flag}"
            )

        for metric in parity.OFFLINE_SENT_METRICS:
            max_diff = max(
                abs(s - row.sent_scores[metric])
                for s, row in zip(sents[metric], rows)
            )
            ok &= max_diff <= 1e-6
            print(f"per-sentence {metric}: max absdiff {max_diff:.2e}")

        idmap, conflicts = parity.reconstruct_id_map(rows)
        pairs = list(parity.iter_pred_cand_pairs(rows))
        tokenizer = parity.tokenizer_from_id_map(idmap)
        decoded = tokenizer.decode_batch([preds for preds, _ in pairs])
        n_exact = sum(got == want for got, (_, want) in zip(decoded, pairs))
        ok &= not conflicts and n_exact == len(pairs)
        print(
            f"id map: {len(idmap)} tokens, {len(conflicts)} conflicts; "
            f"decode byte-exact {n_exact}/{len(pairs)}"
        )

    print("\nPARITY:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
