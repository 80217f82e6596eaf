"""A run's OWN Evaluator CSV round-trips through the offline parity harness.

`conette_tpu/parity.py` was built to consume the reference's published
`detailed_outputs/outputs_*.csv` artifacts (aac_evaluator.py:466-497).
Since the Evaluator now writes that exact schema, the same tooling must
parse a fresh run's artifacts with zero special-casing: every field
round-trips, the id→token map reconstructs conflict-free from the
(preds, cands) pairs, the reconstructed tokenizer reproduces every
candidate string, and re-scoring the loaded rows offline reproduces the
corpus scores the Evaluator computed at export time."""

import os
import shutil

import pytest

from conette_tpu import parity
from conette_tpu.metrics import AllMetrics
from conette_tpu.tokenization import AACTokenizer
from conette_tpu.train.evaluation import Evaluator

# normalized (lowercase, punctuation-free) caption-domain sentences: the
# published CSVs hold post-normalizer text, where PTB tokenization ==
# whitespace split — same precondition here
CANDS = [
    "a dog barks loudly in the distance",
    "rain falls steadily on a tin roof",
    "a car engine revs and then fades away",
    "birds chirp while water flows over rocks",
]
ALT_BEAMS = [
    "a dog is barking in the distance",
    "heavy rain falls on a roof",
    "an engine revs and fades",
    "birds sing near flowing water",
]
MREFS = [
    ["a dog is barking far away", "the distant barking of a dog"],
    ["rain patters on a metal roof", "steady rain hits a tin roof"],
    ["a car engine revs then fades", "an engine roars and fades away"],
    ["birds chirp near a stream", "water flows over rocks as birds sing"],
]


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("run"))
    tok = AACTokenizer()
    corpus = CANDS + ALT_BEAMS + [r for refs in MREFS for r in refs]
    tok.fit(corpus)
    # the parity module's special-id constants are the tokenizer's layout
    assert tok.token_to_id("<pad>") == parity.PAD_ID
    assert tok.token_to_id("<eos>") == parity.EOS_ID

    def ids_of(sentences: list[str], pad_to: int) -> list[list[int]]:
        """Reference `preds` layout: content ids, EOS, PAD tail."""
        enc = tok.encode_batch(sentences, add_bos_eos=False, out_type="int")
        return [
            list(ids) + [parity.EOS_ID] + [parity.PAD_ID] * (pad_to - len(ids) - 1)
            for ids in enc
        ]

    L = 12
    preds = ids_of(CANDS, L)
    alt = ids_of(ALT_BEAMS, L)
    mpreds = [[p, a] for p, a in zip(preds, alt)]
    mcands = [[c, a] for c, a in zip(CANDS, ALT_BEAMS)]
    mlprobs = [[-0.5 - i * 0.1, -0.9 - i * 0.1] for i in range(len(CANDS))]
    losses = [[2.0 + i, 2.5 + i] for i in range(len(CANDS))]

    ev = Evaluator(
        out_dir,
        model_name="best_fense",
        metrics=AllMetrics(use_java=False, use_fense=False, use_bert_score=False),
    )
    ev.add_batch(
        CANDS,
        MREFS,
        fnames=[f"clip_{i}.wav" for i in range(len(CANDS))],
        dataset="clotho",
        subset="eval",
        lprobs=[row[0] for row in mlprobs],
        preds=preds,
        mpreds=mpreds,
        mlprobs=mlprobs,
        mcands=mcands,
        losses=losses,
    )
    scores = ev.compute_and_export()

    # stage under the filename the parity loader expects for this dataset
    shutil.copy(
        os.path.join(out_dir, "best_fense_outputs_clotho_eval.csv"),
        os.path.join(out_dir, "outputs_clotho_eval.csv"),
    )
    rows = parity.load_rows("clotho_eval", dirpath=out_dir)
    return scores, rows, (preds, mpreds, mcands, mlprobs)


def test_fields_roundtrip(exported):
    _, rows, (preds, mpreds, mcands, mlprobs) = exported
    assert len(rows) == len(CANDS)
    for i, row in enumerate(rows):
        assert row.fname == f"clip_{i}.wav"
        assert row.cands == CANDS[i]
        assert row.preds == preds[i]
        assert row.mpreds == mpreds[i]
        assert row.mcands == mcands[i]
        assert row.mrefs == MREFS[i]
        assert row.lprobs == pytest.approx(mlprobs[i][0])


def test_sent_scores_parse_with_reference_prefix(exported):
    """load_rows strips the published 'best_fense.cands.' column prefix —
    our model-name convention (best_{monitor}) makes them identical."""
    _, rows, _ = exported
    for row in rows:
        assert "cider_d" in row.sent_scores
        assert "bleu_4" in row.sent_scores
        assert "sents_div1.cands" in row.sent_scores


def test_id_map_reconstructs_and_decodes(exported):
    _, rows, _ = exported
    idmap, conflicts = parity.reconstruct_id_map(rows)
    assert conflicts == []
    tok = parity.tokenizer_from_id_map(idmap)
    decoded = tok.decode_batch([row.preds for row in rows])
    assert decoded == [row.cands for row in rows]


def test_offline_rescoring_matches_export_time_scores(exported):
    scores, rows, _ = exported
    corpus, sents = parity.compute_offline_corpus_scores(rows)
    exported_scores = scores["clotho_eval"]
    shared = (set(corpus) & set(exported_scores)) - {"new_words"}
    assert {"bleu_1", "bleu_4", "rouge_l", "cider_d"} <= shared
    for key in sorted(shared):
        assert corpus[key] == pytest.approx(exported_scores[key], abs=1e-9), key
    # per-sentence scores written to the CSV == offline recomputation
    for i, row in enumerate(rows):
        for key in ("cider_d", "rouge_l", "bleu_4"):
            assert row.sent_scores[key] == pytest.approx(sents[key][i], abs=1e-6)
