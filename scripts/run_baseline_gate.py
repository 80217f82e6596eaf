#!/usr/bin/env python
"""One-command BASELINE quality gate (VERDICT r1 #3).

Given a staged HF snapshot of ``Labbeti/conette`` and the Clotho-eval audio,
runs the full chain the day weights land:

    snapshot → convert (torch → JAX pytrees, tokenizer from _extra_state_)
             → beam-3 decode of every fixture clip
             → token bit-match vs results/detailed_outputs `preds`
             → corpus BLEU1-4 / ROUGE-L / CIDEr-D vs the published scores
             → (SPIDEr when the SPICE/METEOR jars are staged)

Usage:
    python scripts/run_baseline_gate.py --snapshot /path/Labbeti_conette \
        --audio-dir /path/CLOTHO_v2.1/clotho_audio_eval [--dataset clotho_eval]

    python scripts/run_baseline_gate.py --rehearse   # weight-free dry run

``--rehearse`` fabricates a tiny checkpoint + synthetic WAV corpus + a
fixture CSV from the model's own outputs and asserts the gate machinery
reports a 100% bit-match — so the real run is a one-command affair.

Exit code 0 iff every computed gate passes:
  - token bit-match rate == 100% (greedy-bit-match BASELINE goal proxy:
    the published preds are the beam-3 best sequence),
  - corpus metric absdiff <= 1e-3 vs published (SPIDEr within 0.1 pt when
    computable).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _honor_platform_env() -> None:
    """sitecustomize pins JAX_PLATFORMS=axon before any script code runs, so
    an operator's ``JAX_PLATFORMS=cpu`` env would silently be ignored (the
    config must be updated before the first device query) — honor it here.
    Called from ``main()`` after argparse, NOT at import time: ``--help``
    should not pay the jax import, and merely importing this module must not
    mutate global jax config."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def run_gate(model, fixture_rows, audio_dir: str, published: dict | None,
             batch_size: int = 16) -> dict:
    """Decode every fixture clip and compare against the fixture columns."""
    import numpy as np

    from conette_tpu.metrics.functional.bleu import bleu
    from conette_tpu.metrics.functional.cider_d import cider_d
    from conette_tpu.metrics.functional.rouge_l import rouge_l
    from conette_tpu.parity import EOS_ID, PAD_ID
    from conette_tpu.serving import caption_corpus

    paths, want_preds, want_cands, mrefs = [], [], [], []
    missing = []
    for row in fixture_rows:
        fpath = os.path.join(audio_dir, row.fname)
        if not os.path.isfile(fpath):
            missing.append(row.fname)
            continue
        paths.append(fpath)
        want_preds.append([t for t in row.preds if t not in (PAD_ID, EOS_ID)])
        want_cands.append(row.cands)
        mrefs.append(row.mrefs)
    if missing:
        print(f"WARNING: {len(missing)} fixture clips missing under {audio_dir} "
              f"(e.g. {missing[:3]})")
    if not paths:
        raise SystemExit(f"no fixture audio found under {audio_dir}")

    results = caption_corpus(model, paths, task="clotho", batch_size=batch_size)

    n_tok = n_str = 0
    for res, want_ids, want_text in zip(results, want_preds, want_cands):
        # default=unk: a trained checkpoint only emits in-vocab tokens, so
        # any unk simply registers as a mismatch instead of crashing
        got_ids = list(
            model.tokenizer.encode_single(
                res.caption, add_bos_eos=False, out_type="int", default=3
            )
        ) if res.caption else []
        n_tok += got_ids == want_ids
        n_str += res.caption == want_text
    report = {
        "clips": len(paths),
        "token_bitmatch": n_tok / len(paths),
        "string_match": n_str / len(paths),
    }

    cands_tok = [r.caption.split() for r in results]
    refs_tok = [[ref.split() for ref in refs] for refs in mrefs]
    scores = {
        k: v for k, v in bleu(cands_tok, refs_tok).items()
        if not k.endswith("_sents")
    }
    scores["rouge_l"] = rouge_l(cands_tok, refs_tok)["rouge_l"]
    scores["cider_d"] = cider_d(cands_tok, refs_tok)["cider_d"]
    report["scores"] = scores
    if published:
        report["published"] = {k: published[k] for k in scores if k in published}
        report["max_absdiff"] = max(
            abs(scores[k] - published[k]) for k in report["published"]
        )
    # SPIDEr needs SPICE (java); compute when available
    try:
        from conette_tpu.metrics.functional.java_metrics import spice

        sp = spice([r.caption for r in results], mrefs)
        report["scores"]["spice"] = sp["spice"]
        report["scores"]["spider"] = (sp["spice"] + scores["cider_d"]) / 2
    except Exception as err:
        report["spider_note"] = f"SPIDEr not computable offline ({err})"
    return report


def check_export(model, paths: list[str], batch_size: int,
                 clip_seconds: float,
                 sample_limit: int | None = None) -> dict:
    """AOT-export half of the gate (VERDICT r3 next #6): export the
    weights through ``conette_tpu/export.py`` (StableHLO, weights inlined),
    replay the fixture clips through ``ExportedCaptioner``, and compare
    against the LIVE model driven at the SAME padded shapes (the caption
    pipeline's ``frame_embs_lens`` uses the reference's pad-dependent
    ``reduction_factor = padded_len // n_out`` — reference
    ``convnext.py:309-315`` — so only same-shape comparisons isolate
    serialization fidelity from legitimate bucketing variance)."""
    import tempfile

    import jax
    import numpy as np

    from conette_tpu.export import (
        ExportedCaptioner,
        build_caption_fn,
        save_exported,
    )

    if sample_limit is not None:
        paths = paths[:sample_limit]
    live_fn = jax.jit(build_caption_fn(model)[0])
    with tempfile.TemporaryDirectory() as d:
        art = os.path.join(d, "artifact")
        save_exported(
            model, art, batch_size=batch_size, clip_seconds=clip_seconds
        )
        captioner = ExportedCaptioner(art)
        n_eq = 0
        for i in range(0, len(paths), batch_size):
            chunk = paths[i:i + batch_size]
            wavs = []
            for p in chunk:
                w, wl = model.preprocessor.load_resample(p)
                wavs.append(w[0, : int(wl[0])])
            got = captioner(wavs)
            batch, lens, bos = captioner.prepare_batch(wavs)
            live_preds = np.asarray(live_fn(batch, lens, bos)[0])[: len(wavs)]
            want = captioner.decode_tokens(live_preds)
            n_eq += sum(g == w_ for g, w_ in zip(got, want))
    return {"clips": len(paths), "export_match": n_eq / max(len(paths), 1)}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--snapshot", help="HF snapshot / native checkpoint dir")
    parser.add_argument("--audio-dir", help="directory with the fixture WAVs")
    parser.add_argument("--dataset", default="clotho_eval",
                        choices=["clotho_eval", "audiocaps_test"])
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--rehearse", action="store_true",
                        help="weight-free machinery dry run")
    parser.add_argument("--no-export-check", action="store_true",
                        help="skip the AOT-export replay half of the gate")
    parser.add_argument("--export-clips", type=int, default=64,
                        help="fixture clips replayed through the exported "
                             "artifact (the full corpus adds little: the "
                             "program is identical per clip)")
    args = parser.parse_args()
    _honor_platform_env()

    from conette_tpu.huggingface.model import CoNeTTEModel

    if args.rehearse:
        return _rehearse(args)

    if not args.snapshot or not args.audio_dir:
        parser.error("--snapshot and --audio-dir are required (or --rehearse)")

    from conette_tpu import parity

    model = CoNeTTEModel.from_pretrained(args.snapshot)
    rows = parity.load_rows(args.dataset)
    published = parity.load_corpus_scores(args.dataset)
    report = run_gate(model, rows, args.audio_dir, published, args.batch_size)
    _print_report(report)

    ok = report["token_bitmatch"] == 1.0
    if "max_absdiff" in report:
        ok &= report["max_absdiff"] <= 1e-3
    if "spider" in report["scores"] and "spider" in (report.get("published") or {}):
        ok &= abs(report["scores"]["spider"] - report["published"]["spider"]) <= 1e-3

    if not args.no_export_check:
        paths = [
            os.path.join(args.audio_dir, row.fname)
            for row in rows
            if os.path.isfile(os.path.join(args.audio_dir, row.fname))
        ]
        # clotho clips run up to 30 s — export the top serving bucket
        exp_report = check_export(
            model, paths, args.batch_size,
            clip_seconds=30.0, sample_limit=args.export_clips,
        )
        print(f"export replay match: {exp_report['export_match']:.2%} "
              f"({exp_report['clips']} clips)")
        ok &= exp_report["export_match"] == 1.0

    print("GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def _rehearse(args) -> int:
    """Build a tiny model + synthetic corpus, fabricate the fixture from the
    model's own outputs, and assert the gate passes at 100%."""
    import tempfile

    import numpy as np

    from conette_tpu.huggingface.config import CoNeTTEConfig
    from conette_tpu.huggingface.model import CoNeTTEModel
    from conette_tpu.parity import EOS_ID, ReferenceRow
    from conette_tpu.serving import caption_corpus
    from conette_tpu.tokenization import AACTokenizer
    from conette_tpu.utils.audio_io import save_wav

    tok = AACTokenizer()
    tok.fit(["a bird sings in the rain", "an engine hums loudly",
             "water drips on metal"])
    config = CoNeTTEConfig(
        d_model=32, nhead=2, num_decoder_layers=2, dim_feedforward=64,
        beam_size=3, min_pred_size=1, max_pred_size=6,
        tokenizer_state=tok.get_txt_state(),
    )
    model = CoNeTTEModel(config, seed=0)

    with tempfile.TemporaryDirectory() as d:
        # exercise convert/save/load too
        ck = os.path.join(d, "ckpt")
        model.save_pretrained(ck)
        model = CoNeTTEModel.from_pretrained(ck)

        rng = np.random.default_rng(0)
        paths = []
        for i in range(5):
            sig = rng.standard_normal(int(32_000 * (0.6 + 0.2 * i))).astype(
                np.float32) * 0.1
            p = os.path.join(d, f"clip_{i}.wav")
            save_wav(p, sig, 32_000)
            paths.append(p)

        # fabricate the fixture from a first decode pass
        first = caption_corpus(model, paths, task="clotho", batch_size=4)
        rows = []
        for p, res in zip(paths, first):
            ids = list(model.tokenizer.encode_single(
                res.caption, add_bos_eos=False, out_type="int", default=3
            )) if res.caption else []
            rows.append(ReferenceRow(
                fname=os.path.basename(p), preds=ids + [EOS_ID],
                cands=res.caption, mpreds=[], mcands=[],
                mrefs=["a bird sings in the rain", "water drips on metal"],
                lprobs=res.lprob,
            ))

        report = run_gate(model, rows, d, published=None, batch_size=4)
        _print_report(report)
        assert report["token_bitmatch"] == 1.0, report
        assert report["string_match"] == 1.0, report

        if not args.no_export_check:
            exp_report = check_export(
                model, paths, batch_size=5, clip_seconds=2.0,
            )
            print(f"export replay match: {exp_report['export_match']:.2%} "
                  f"({exp_report['clips']} clips)")
            assert exp_report["export_match"] == 1.0, exp_report
    print("REHEARSAL: PASS (gate machinery reproduces its own outputs 100%,"
          " incl. the AOT-export replay)")
    return 0


def _print_report(report: dict) -> None:
    print(f"\nclips decoded: {report['clips']}")
    print(f"token bit-match: {report['token_bitmatch']:.2%}")
    print(f"string match:    {report['string_match']:.2%}")
    for k, v in report["scores"].items():
        pub = (report.get("published") or {}).get(k)
        extra = f"  (published {pub:.5f}, diff {abs(v - pub):.2e})" if pub else ""
        print(f"{k:<10}{v:.5f}{extra}")
    if "spider_note" in report:
        print(report["spider_note"])


if __name__ == "__main__":
    sys.exit(main())
