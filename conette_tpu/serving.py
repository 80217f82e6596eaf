"""Bulk corpus captioning — the production serving path.

Covers BASELINE.json configs 3–5: whole eval splits / corpora are captioned
as a few compiled XLA programs by

1. grouping clips into **length buckets** (static shapes per bucket, one
   compile each — the TPU answer to the reference's per-batch dynamic
   padding);
2. filling fixed-size batches within each bucket (tail batches pad with
   silence rows and drop them after decode);
3. optionally sharding each batch over the ``data`` axis of a
   ``jax.sharding.Mesh`` (v5e-slice data parallelism; gradient-free, so the
   only collective is the implicit result gather).

Host-side decode (tokenizer) streams behind device dispatch.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from conette_tpu.huggingface.model import CoNeTTEModel
from conette_tpu.huggingface.preprocessor import bucket_length

pylog = logging.getLogger(__name__)


@dataclass
class CaptionResult:
    fname: str
    caption: str
    lprob: float
    task: str


def caption_corpus(
    model: CoNeTTEModel,
    paths: Sequence[str],
    *,
    task: str | Sequence[str] = "clotho",
    batch_size: int = 32,
    beam_size: int | None = None,
    mesh: Any | None = None,
) -> list[CaptionResult]:
    """Caption a corpus of audio files with bucketed static shapes.

    :param mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis; batch
        rows are sharded across it (batch_size must divide by the axis size).
    :returns: results in the input order.
    """
    n = len(paths)
    tasks = [task] * n if isinstance(task, str) else list(task)
    if len(tasks) != n:
        raise ValueError(f"{len(tasks)=} != {len(paths)=}")

    pre = model.preprocessor

    # --- bucket pass: resampled lengths only (WAV headers via the native
    # loader when built; waveforms stream lazily per batch, so RAM stays
    # O(batch) instead of O(corpus))
    def resampled_len(path: str) -> int:
        try:
            from conette_tpu.native import loader as native_loader
            from conette_tpu.ops.resample import resampled_length

            if native_loader.is_available():
                sr, _, frames = native_loader.wav_info(path)
                return (
                    frames if sr == pre.target_sr
                    else resampled_length(frames, sr, pre.target_sr)
                )
        except Exception:
            pass
        wav, lens = pre.load_resample(path)
        return int(lens[0])

    lengths = [resampled_len(p) for p in paths]
    buckets: dict[int, list[int]] = {}
    for i, ln in enumerate(lengths):
        buckets.setdefault(bucket_length(ln), []).append(i)
    pylog.info(
        f"{n} clips → {len(buckets)} length buckets "
        f"({sorted(b // 32000 for b in buckets)} s)"
    )

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("data"))
        data_size = mesh.shape["data"]
        if batch_size % data_size != 0:
            raise ValueError(f"{batch_size=} not divisible by mesh data={data_size}")

    # --- fused waveform→tokens program: ONE dispatch per batch (encoder +
    # projection + beam decode in a single XLA program; see PROFILE.md on
    # per-dispatch costs)
    from conette_tpu.models.conette import (
        encode_audio,
        forward_generate,
        tasks_to_bos_ids,
    )
    from conette_tpu.models.convnext import convnext_apply

    cfg = model.model_cfg
    beam = beam_size if beam_size is not None else cfg.beam_size
    forbid = model.forbid_rep_mask
    if forbid is None:
        forbid = jnp.zeros((cfg.vocab_size,), bool)

    @jax.jit
    def caption_batch(enc_params, params, wav, lens, bos_ids, forbid):
        outs = convnext_apply(enc_params, wav, lens, compute_dtype=jnp.bfloat16)
        audio = jnp.swapaxes(outs["frame_embs"], 1, 2)
        memory, mask = encode_audio(params, cfg, audio, outs["frame_embs_lens"])
        memory = memory.astype(jnp.bfloat16)
        res = forward_generate(
            params, cfg, memory, mask, bos_ids,
            beam_size=beam, forbid_rep_mask=forbid,
        )
        return res.best_preds, res.best_avg_lprobs

    def bos_for(idx_chunk: list[int], pad_to: int) -> np.ndarray:
        chunk_tasks = [tasks[i] for i in idx_chunk]
        chunk_tasks += [chunk_tasks[0]] * (pad_to - len(chunk_tasks))
        datasets = [t.split("_")[0] for t in chunk_tasks]
        sources = ["_".join(t.split("_")[1:]) or None for t in chunk_tasks]
        if cfg.task_mode == "ds_src":
            return tasks_to_bos_ids(cfg, model.task_token_ids, datasets, sources)
        if cfg.task_mode == "ds":
            return tasks_to_bos_ids(cfg, model.task_token_ids, datasets)
        return np.full((pad_to,), cfg.bos_id, np.int32)

    results: dict[int, CaptionResult] = {}
    pending: list[tuple[list[int], Any, Any]] = []

    def drain(item: tuple[list[int], Any, Any]) -> None:
        chunk, preds_d, lprobs_d = item
        preds = np.asarray(preds_d)
        lprobs = np.asarray(lprobs_d)
        cands = [model._decode_pred(preds[r]) for r in range(len(chunk))]
        for row, i in enumerate(chunk):
            results[i] = CaptionResult(
                fname=paths[i], caption=cands[row],
                lprob=float(lprobs[row]), task=tasks[i],
            )

    for blen, idxs in sorted(buckets.items()):
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            wav = np.zeros((batch_size, blen), np.float32)
            lens = np.full((batch_size,), blen, np.int64)
            for row, i in enumerate(chunk):
                w, wl = pre.load_resample(paths[i])
                m = min(int(wl[0]), blen)
                wav[row, :m] = w[0, :m]
                lens[row] = m

            wav_d = jnp.asarray(wav)
            lens_d = jnp.asarray(lens)
            bos_d = jnp.asarray(bos_for(chunk, batch_size))
            if sharding is not None:
                wav_d = jax.device_put(wav_d, sharding)
                lens_d = jax.device_put(lens_d, sharding)
                bos_d = jax.device_put(bos_d, sharding)

            preds_d, lprobs_d = caption_batch(
                model.encoder_params, model.params, wav_d, lens_d, bos_d, forbid
            )
            # decode the PREVIOUS batch's tokens while this one runs on
            # device (async dispatch): host detokenize overlaps compute
            pending.append((chunk, preds_d, lprobs_d))
            if len(pending) > 1:
                drain(pending.pop(0))
    for item in pending:
        drain(item)
    return [results[i] for i in range(n)]


def warmup(
    model: CoNeTTEModel,
    bucket_seconds: Sequence[int] = (1, 5, 10, 30),
    batch_size: int = 32,
    beam_size: int | None = None,
) -> None:
    """Pre-compile the captioning pipeline for the given length buckets so a
    serving process takes no compile hits on live traffic (pairs with the
    persistent jax compilation cache)."""
    rng = np.random.default_rng(0)
    for secs in bucket_seconds:
        n = secs * model.preprocessor.target_sr
        wav = rng.standard_normal((batch_size, n)).astype(np.float32) * 0.01
        model.forward(
            wav, sr=model.preprocessor.target_sr,
            task=model.default_task, beam_size=beam_size,
        )
        pylog.info(f"warmup: compiled {secs}s bucket (batch {batch_size})")


def make_sharded_caption_fn(model: CoNeTTEModel, mesh: Any, beam_size: int | None = None):
    """jit the full waveform→tokens pipeline with batch rows sharded over
    the mesh ``data`` axis (replicated params). Returns
    ``fn(waveform (B, T), lens (B,), bos_ids (B,)) → (preds, lprobs)``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from conette_tpu.models.conette import encode_audio, forward_generate
    from conette_tpu.models.convnext import convnext_apply

    cfg = model.model_cfg
    beam = beam_size if beam_size is not None else cfg.beam_size
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    forbid = model.forbid_rep_mask
    if forbid is None:
        forbid = jnp.zeros((cfg.vocab_size,), bool)

    @jax.jit
    def fn(enc_params, params, waveform, lens, bos_ids, forbid):
        outs = convnext_apply(
            enc_params, waveform, lens, compute_dtype=jnp.bfloat16,
            use_fused_frontend=False,
        )
        audio = jnp.swapaxes(outs["frame_embs"], 1, 2)
        memory, mask = encode_audio(params, cfg, audio, outs["frame_embs_lens"])
        res = forward_generate(
            params, cfg, memory, mask, bos_ids,
            beam_size=beam, forbid_rep_mask=forbid,
        )
        return res.best_preds, res.best_avg_lprobs

    enc_r = jax.device_put(model.encoder_params, repl)
    par_r = jax.device_put(model.params, repl)
    forbid_r = jax.device_put(forbid, repl)

    def run(waveform: np.ndarray, lens: np.ndarray, bos_ids: np.ndarray):
        w = jax.device_put(jnp.asarray(waveform), data)
        l = jax.device_put(jnp.asarray(lens), data)
        b = jax.device_put(jnp.asarray(bos_ids), data)
        return fn(enc_r, par_r, w, l, b, forbid_r)

    return run
