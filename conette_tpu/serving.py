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

    # --- host: load + resample everything (native loader when built),
    # then group by bucket
    pre = model.preprocessor
    waves: list[np.ndarray] = []
    for p in paths:
        wav, lens = pre.load_resample(p)
        waves.append(wav[0, : int(lens[0])])

    buckets: dict[int, list[int]] = {}
    for i, w in enumerate(waves):
        buckets.setdefault(bucket_length(len(w)), []).append(i)
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

    results: dict[int, CaptionResult] = {}
    for blen, idxs in sorted(buckets.items()):
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start : start + batch_size]
            b = len(chunk)
            wav = np.zeros((batch_size, blen), np.float32)
            lens = np.full((batch_size,), blen, np.int64)
            for row, i in enumerate(chunk):
                wav[row, : len(waves[i])] = waves[i]
                lens[row] = len(waves[i])

            wav_d = jnp.asarray(wav)
            lens_d = jnp.asarray(lens)
            if sharding is not None:
                wav_d = jax.device_put(wav_d, sharding)
                lens_d = jax.device_put(lens_d, sharding)

            batch = model.preprocessor._encode_fn(
                model.preprocessor.params, wav_d, lens_d
            )
            audio = jnp.swapaxes(batch["frame_embs"], 1, 2)
            out = model.forward(
                audio,
                preprocess=False,
                x_shapes=np.stack(
                    [np.full((batch_size,), 768), np.asarray(batch["frame_embs_lens"])],
                    axis=1,
                ),
                task=[tasks[i] for i in chunk]
                + [tasks[chunk[0]]] * (batch_size - b),
                beam_size=beam_size,
            )
            for row, i in enumerate(chunk):
                results[i] = CaptionResult(
                    fname=paths[i],
                    caption=out["cands"][row],
                    lprob=float(out["lprobs"][row]),
                    task=tasks[i],
                )
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
