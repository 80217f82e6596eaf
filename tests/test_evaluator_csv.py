"""Evaluator outputs-CSV schema parity with the published detailed_outputs.

The reference's ``AACEvaluator`` writes per-clip CSVs with the column set
``losses, preds, lprobs, mpreds, mlprobs, cands, mcands, mrefs, fname,
index, dataset, subset, {model}.cands.{metric}...``
(``callbacks/aac_evaluator.py:466-497`` — the exact artifacts published
under ``results/detailed_outputs`` that our offline parity harness
consumes). Our ``Evaluator`` must emit the same schema so a run's own
outputs round-trip through the same tooling."""

import ast
import csv
import os

import numpy as np
import pytest

from conette_tpu.metrics import AllMetrics
from conette_tpu.train.evaluation import Evaluator

CANDS = ["a dog barks loudly", "rain falls on the roof"]
MREFS = [
    ["a dog is barking", "the dog barks outside"],
    ["rain falls on a tin roof", "heavy rain hits the roof"],
]


@pytest.fixture()
def exported(tmp_path):
    ev = Evaluator(
        str(tmp_path),
        model_name="best",
        metrics=AllMetrics(use_java=False, use_fense=False, use_bert_score=False),
        export_dcase=True,
    )
    preds = np.array([[4, 5, 6, 2, 0, 0], [7, 8, 9, 10, 2, 0]])
    mpreds = np.stack([np.stack([p, p]) for p in preds])  # (B, beam=2, L)
    mlprobs = np.array([[-1.2, -1.5], [-0.8, -1.1]])
    mcands = [[c, c.upper()] for c in CANDS]
    losses = [[2.5, 2.7], [3.0]]
    ev.add_batch(
        CANDS, MREFS,
        fnames=["a.wav", "b.wav"], dataset="clotho", subset="eval",
        lprobs=[-1.2, -0.8], preds=preds, mpreds=mpreds,
        mlprobs=mlprobs, mcands=mcands, losses=losses,
    )
    scores = ev.compute_and_export()
    path = os.path.join(str(tmp_path), "best_outputs_clotho_eval.csv")
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    return scores, rows


def test_reference_column_schema(exported):
    _, rows = exported
    lead = ["losses", "preds", "lprobs", "mpreds", "mlprobs", "cands",
            "mcands", "mrefs", "fname", "index", "dataset", "subset"]
    assert list(rows[0].keys())[: len(lead)] == lead
    # per-sentence metric columns carry the "{model}.cands." prefix
    assert "best.cands.cider_d" in rows[0]
    assert "best.cands.bleu_4" in rows[0]
    assert "best.cands.sents_div1.cands" in rows[0]


def test_columns_literal_eval_roundtrip(exported):
    _, rows = exported
    row = rows[0]
    assert ast.literal_eval(row["preds"]) == [4, 5, 6, 2, 0, 0]
    mpreds = ast.literal_eval(row["mpreds"])
    assert len(mpreds) == 2 and mpreds[0] == [4, 5, 6, 2, 0, 0]
    assert ast.literal_eval(row["mlprobs"]) == [-1.2, -1.5]
    assert ast.literal_eval(row["mcands"]) == [CANDS[0], CANDS[0].upper()]
    assert ast.literal_eval(row["mrefs"]) == MREFS[0]
    assert ast.literal_eval(row["losses"]) == [2.5, 2.7]
    assert row["cands"] == CANDS[0]
    assert float(row["lprobs"]) == -1.2
    assert (row["dataset"], row["subset"]) == ("clotho", "eval")
    assert [int(r["index"]) for r in rows] == [0, 1]


def test_corpus_scores_present(exported):
    scores, _ = exported
    assert "clotho_eval" in scores
    assert "cider_d" in scores["clotho_eval"]


def test_optional_fields_absent_still_export(tmp_path):
    ev = Evaluator(
        str(tmp_path),
        metrics=AllMetrics(use_java=False, use_fense=False, use_bert_score=False),
        export_dcase=False,
    )
    ev.add_batch(CANDS, MREFS, dataset="clotho", subset="eval")
    ev.compute_and_export()
    path = os.path.join(str(tmp_path), "model_outputs_clotho_eval.csv")
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["preds"] == ""  # None → empty cell, schema unchanged
    assert rows[0]["cands"] == CANDS[0]
