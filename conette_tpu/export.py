"""Ahead-of-time export of the caption pipeline (``jax.export`` / StableHLO).

Freezes the FULL waveform→tokens program — log-mel frontend + ConvNeXt
encoder + projection + task-conditioned beam decode, weights baked in as
constants — into a portable serialized StableHLO artifact. The artifact
replays without any of this package's model classes: deserialization
needs only ``jax`` (any backend the module was exported for), and
detokenization needs only the tokenizer state saved next to it.

This is a deployment surface the torch reference has no analogue for
(its serving path is the live ``CoNeTTEModel.forward``,
``huggingface/model.py:185-261`` — always Python + torch + the full
package). Artifact layout (``save_exported``)::

    <out_dir>/
      caption.stablehlo      # jax.export serialization (weights inlined)
      tokenizer.json         # AACTokenizer txt state
      meta.json              # shapes, decode config, task→BOS-id map

Shapes are static per artifact (batch, clip samples) — export one per
serving bucket, exactly like the live server's warmup buckets
(``serving.warmup``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import numpy as np

ARTIFACT_NAME = "caption.stablehlo"


def build_caption_fn(model: Any, beam_size: int | None = None,
                     min_pred_size: int | None = None,
                     max_pred_size: int | None = None):
    """The jittable waveform→tokens closure that gets exported:
    ``fn(wav (B,S) f32, lens (B,) i32, bos_ids (B,) i32) ->
    (preds, avg_lprobs, mult_preds, mult_lprobs, clip_probs)``.
    Weights (encoder + decoder + forbid mask) are closure constants."""
    import jax
    import jax.numpy as jnp

    from conette_tpu.models.conette import (
        encode_audio,
        forward_generate,
        forward_greedy,
    )
    from conette_tpu.models.convnext import convnext_apply

    cfg = model.model_cfg
    beam = beam_size if beam_size is not None else model.config.beam_size
    min_p = (
        min_pred_size if min_pred_size is not None
        else model.config.min_pred_size
    )
    max_p = (
        max_pred_size if max_pred_size is not None
        else model.config.max_pred_size
    )
    # a `from_pretrained` model may hold plain numpy leaves; as closure
    # CONSTANTS they must be jax arrays (a numpy array indexed by a tracer
    # inside the traced fn raises TracerArrayConversionError)
    enc_params = jax.tree.map(jnp.asarray, model.encoder_params)
    dec_params = jax.tree.map(jnp.asarray, model.params)
    forbid = model.forbid_rep_mask
    if forbid is None:
        forbid = jnp.zeros((cfg.vocab_size,), bool)
    else:
        forbid = jnp.asarray(forbid)
    compute_dtype = model.preprocessor.compute_dtype

    def fn(wav, lens, bos_ids):
        outs = convnext_apply(
            enc_params, wav, lens, deterministic=True,
            compute_dtype=compute_dtype,
        )
        audio = jnp.swapaxes(outs["frame_embs"], 1, 2)  # (B, T, 768)
        memory, pad_mask = encode_audio(
            dec_params, cfg, audio, outs["frame_embs_lens"]
        )
        if beam <= 1:
            # greedy fast path, same as the live model's _generate_fn
            g = forward_greedy(
                dec_params, cfg, memory, pad_mask, bos_ids,
                min_pred_size=min_p, max_pred_size=max_p,
                forbid_rep_mask=forbid,
            )
            lp = jax.nn.log_softmax(
                jnp.transpose(g.logits, (0, 2, 1)), axis=-1
            )
            sel = jnp.take_along_axis(lp, g.preds[..., None], axis=-1)[..., 0]
            valid = g.preds != cfg.pad_id
            avg = jnp.sum(jnp.where(valid, sel, 0.0), axis=1) / jnp.maximum(
                valid.sum(axis=1), 1
            )
            return (
                g.preds, avg, g.preds[:, None, :], avg[:, None],
                outs["clipwise_output"],
            )
        res = forward_generate(
            dec_params, cfg, memory, pad_mask, bos_ids,
            beam_size=beam, min_pred_size=min_p, max_pred_size=max_p,
            forbid_rep_mask=forbid,
        )
        return (
            res.best_preds,
            res.best_avg_lprobs,
            res.global_preds,
            res.global_avg_lprobs,
            outs["clipwise_output"],
        )

    return fn, {"beam_size": beam, "min_pred_size": min_p,
                "max_pred_size": max_p}


def _task_bos_map(model: Any) -> dict[str, int]:
    from conette_tpu.models.conette import tasks_to_bos_ids

    out: dict[str, int] = {}
    for task in model.config.task_names:
        ds = task.split("_")[0]
        src = "_".join(task.split("_")[1:]) or None
        if model.model_cfg.task_mode == "ds_src":
            ids = tasks_to_bos_ids(
                model.model_cfg, model.task_token_ids, [ds], [src]
            )
        elif model.model_cfg.task_mode == "ds":
            ids = tasks_to_bos_ids(model.model_cfg, model.task_token_ids, [ds])
        else:
            ids = np.full((1,), model.model_cfg.bos_id, np.int32)
        out[task] = int(ids[0])
    return out


def export_caption_program(
    model: Any,
    batch_size: int,
    clip_seconds: float,
    sample_rate: int = 32_000,
    platforms: Sequence[str] | None = None,
    **decode_kwargs: Any,
) -> tuple[bytes, dict[str, Any]]:
    """Serialize the caption pipeline at one (batch, clip-length) bucket.
    Returns ``(artifact_bytes, meta)``. ``platforms`` (e.g.
    ``["tpu", "cpu"]``) makes a cross-platform artifact — by default the
    module is lowered for the exporting host's backend only. Note: the
    fused Pallas encoder path is platform-specific; export the ``float32``
    XLA path (the default model dtype) for cross-platform artifacts."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    fn, decode_meta = build_caption_fn(model, **decode_kwargs)
    n_samples = int(round(clip_seconds * sample_rate))
    exp = jexport.export(jax.jit(fn), platforms=platforms)(
        jax.ShapeDtypeStruct((batch_size, n_samples), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    meta = {
        "batch_size": batch_size,
        "clip_seconds": clip_seconds,
        "sample_rate": sample_rate,
        "n_samples": n_samples,
        "eos_id": int(model.model_cfg.eos_id),
        "pad_id": int(model.model_cfg.pad_id),
        "default_task": model.default_task,
        "task_bos_ids": _task_bos_map(model),
        **decode_meta,
    }
    return exp.serialize(), meta


def save_exported(
    model: Any,
    out_dir: str,
    batch_size: int = 32,
    clip_seconds: float = 10.0,
    sample_rate: int = 32_000,
    platforms: Sequence[str] | None = None,
    **decode_kwargs: Any,
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    data, meta = export_caption_program(
        model, batch_size, clip_seconds, sample_rate,
        platforms=platforms, **decode_kwargs
    )
    with open(os.path.join(out_dir, ARTIFACT_NAME), "wb") as f:
        f.write(data)
    model.tokenizer.save_file(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ExportedCaptioner:
    """Replay a ``save_exported`` artifact: pads/crops float32 waveforms
    to the exported bucket, maps task names to BOS ids, runs the
    deserialized module, detokenizes. Needs only jax + the artifact."""

    def __init__(self, art_dir: str) -> None:
        from jax import export as jexport

        from conette_tpu.tokenization import AACTokenizer

        with open(os.path.join(art_dir, ARTIFACT_NAME), "rb") as f:
            self._exp = jexport.deserialize(f.read())
        with open(os.path.join(art_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.tokenizer = AACTokenizer.from_file(
            os.path.join(art_dir, "tokenizer.json")
        )

    def prepare_batch(
        self,
        wavs: Sequence[np.ndarray] | np.ndarray,
        task: str | Sequence[str] | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pad/crop float32 waveforms to the exported (batch, samples)
        bucket and map task names to BOS ids — the exact arrays the
        exported program consumes (also used by the baseline gate to drive
        the LIVE model at identical shapes)."""
        b, s = self.meta["batch_size"], self.meta["n_samples"]
        wav_list = [np.asarray(w, np.float32).reshape(-1) for w in wavs]
        if len(wav_list) > b:
            raise ValueError(
                f"{len(wav_list)} clips > exported batch size {b}"
            )
        if task is None:
            task = self.meta["default_task"]
        tasks = [task] * len(wav_list) if isinstance(task, str) else list(task)
        bos_map = self.meta["task_bos_ids"]
        for t in tasks:
            if t not in bos_map:
                raise ValueError(f"Invalid task {t!r} (not in {list(bos_map)})")

        batch = np.zeros((b, s), np.float32)
        lens = np.zeros((b,), np.int32)
        bos = np.full((b,), bos_map[tasks[0]], np.int32)
        for i, w in enumerate(wav_list):
            n = min(len(w), s)
            batch[i, :n] = w[:n]
            lens[i] = n
            bos[i] = bos_map[tasks[i]]
        return batch, lens, bos

    def decode_tokens(self, preds: np.ndarray) -> list[str]:
        """EOS-truncate + detokenize a (N, L) id matrix."""
        eos = self.meta["eos_id"]
        out = []
        for row in np.asarray(preds):
            toks = []
            for t in row.tolist():
                if t == eos:
                    break
                toks.append(t)
            out.append(self.tokenizer.decode_single(toks))
        return out

    def __call__(
        self,
        wavs: Sequence[np.ndarray] | np.ndarray,
        task: str | Sequence[str] | None = None,
    ) -> list[str]:
        import jax.numpy as jnp

        batch, lens, bos = self.prepare_batch(wavs, task)
        preds, _, _, _, _ = self._exp.call(
            jnp.asarray(batch), jnp.asarray(lens), jnp.asarray(bos)
        )
        return self.decode_tokens(np.asarray(preds)[: len(wavs)])
