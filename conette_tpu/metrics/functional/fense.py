"""FENSE — Fluency ENhanced Sentence-bert Evaluation.

Twin of the reference's FENSE metric (via aac-metrics; monitored as
``val/fense`` for checkpoint selection, ``conf/ckpts/fense.yaml``):
Sentence-BERT cosine similarity between candidate and references (max or
mean over refs) with a fluency-error penalty (×(1−0.9) when the fluency
detector flags the sentence).

Model weights require a one-time download (or a local cache); on
egress-less hosts the metric degrades gracefully: ``is_available()`` is
False and callers skip it (the reference behaves the same way when its
model downloads fail).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Sequence

import numpy as np

pylog = logging.getLogger(__name__)

_SBERT_MODEL_NAME = "paraphrase-TinyBERT-L6-v2"
_CACHE: dict[str, Any] = {}


def _load_sbert() -> Any | None:
    if "model" in _CACHE:
        return _CACHE["model"]
    name = os.environ.get("CONETTE_SBERT_MODEL", _SBERT_MODEL_NAME)
    try:
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(name)
    except Exception as err:
        pylog.warning(f"FENSE unavailable (SBERT load failed: {err})")
        model = None
    _CACHE["model"] = model
    return model


def is_available() -> bool:
    return _load_sbert() is not None


def fense(
    candidates: Sequence[str],
    mult_references: Sequence[Sequence[str]],
    *,
    agg: str = "mean",
    penalty: float = 0.9,
    fluency_fn: Any = None,
) -> dict[str, object]:
    """Returns {"fense": corpus, "fense_sents": per-sentence, "sbert_sim": ...}.

    :param fluency_fn: optional callable(list[str]) -> list[bool] flagging
        disfluent candidates; when None no penalty is applied (the fluency
        detector is a separately-downloaded model).
    """
    model = _load_sbert()
    if model is None:
        raise RuntimeError(
            "FENSE requires a Sentence-BERT model; set CONETTE_SBERT_MODEL to "
            "a local model path or pre-populate the sentence-transformers cache."
        )
    flat_refs = [r for refs in mult_references for r in refs]
    counts = [len(refs) for refs in mult_references]
    cand_emb = np.asarray(model.encode(list(candidates), show_progress_bar=False))
    ref_emb = np.asarray(model.encode(flat_refs, show_progress_bar=False))

    def cos(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-9)
        b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-9)
        return a @ b.T

    sims: list[float] = []
    offset = 0
    for i, n in enumerate(counts):
        s = cos(cand_emb[i : i + 1], ref_emb[offset : offset + n])[0]
        sims.append(float(np.mean(s) if agg == "mean" else np.max(s)))
        offset += n

    if fluency_fn is not None:
        errors = fluency_fn(list(candidates))
        scores = [
            s * (1.0 - penalty) if e else s for s, e in zip(sims, errors)
        ]
    else:
        scores = sims
    return {
        "fense": sum(scores) / max(len(scores), 1),
        "fense_sents": scores,
        "sbert_sim": sum(sims) / max(len(sims), 1),
        "sbert_sim_sents": sims,
    }
