"""CoNeTTE model assembly: projection + task-conditioned caption decoder.

Capability twin of the reference ``CoNeTTEPLM``
(``src/conette/pl_modules/conette.py:34-551``) re-designed as pure JAX
functions over a parameter pytree:

- the trainable model consumes precomputed 768-d frame embeddings (identity
  encoder — ``nn/encoders/ident.py:9-34``), projects 768→256 with
  Dropout+Linear+ReLU+Dropout (``pl_modules/common.py:59-78``), and decodes
  with the 6-layer transformer decoder;
- ``<bos_{task}>`` special tokens are appended to the vocab per task name
  and selected per example (``conette.py:99-129,486-525``);
- the forbid-repetition mask marks every non-stopword vocab entry
  (``pl_modules/common.py:222-299``), with the NLTK English stopword list
  vendored as data (utils/stopwords.py) so no runtime download is needed;
- decoding dispatches to teacher forcing / greedy / beam search compiled as
  single XLA programs.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from conette_tpu.decoding.beam import BeamResult, beam_search
from conette_tpu.decoding.greedy import GreedyResult, greedy_search
from conette_tpu.models.decoder import (
    DecoderConfig,
    Params,
    decoder_forward,
    decoder_init,
)
from conette_tpu.models.layers import dropout, embedding, linear, linear_init
from conette_tpu.tokenization import AACTokenizer
from conette_tpu.utils.stopwords import ENGLISH_STOPWORDS

DEFAULT_TASK_NAMES = (
    "clotho",
    "audiocaps",
    "macs",
    "wavcaps_audioset_sl",
    "wavcaps_bbc_sound_effects",
    "wavcaps_freesound",
    "wavcaps_soundbible",
)


class ConetteConfig(NamedTuple):
    """Model/decode hyperparameters (reference defaults:
    ``huggingface/config.py:13-88``)."""

    vocab_size: int
    task_mode: str = "ds_src"
    task_names: tuple[str, ...] = DEFAULT_TASK_NAMES
    label_smoothing: float = 0.2
    mixup_alpha: float = 0.4
    proj_in: int = 768
    proj_dropout_p: float = 0.5
    min_pred_size: int = 3
    max_pred_size: int = 20
    beam_size: int = 3
    nhead: int = 8
    d_model: int = 256
    num_decoder_layers: int = 6
    decoder_dropout_p: float = 0.2
    dim_feedforward: int = 2048
    bos_id: int = 1
    eos_id: int = 2
    pad_id: int = 0

    def decoder_config(self) -> DecoderConfig:
        return DecoderConfig(
            vocab_size=self.vocab_size,
            d_model=self.d_model,
            nhead=self.nhead,
            num_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward,
            dropout_p=self.decoder_dropout_p,
            bos_id=self.bos_id,
            eos_id=self.eos_id,
            pad_id=self.pad_id,
        )


def add_task_tokens(
    tokenizer: AACTokenizer,
    task_names: Sequence[str] = DEFAULT_TASK_NAMES,
    task_mode: str = "ds_src",
) -> dict[str, int]:
    """Append ``<bos_{task}>`` tokens; returns task_name → token id
    (parity: ``conette.py:99-129``)."""
    mapping: dict[str, int] = {}
    if task_mode == "none":
        return mapping
    for name in task_names:
        token = f"<bos_{name}>"
        if tokenizer.has(token):
            mapping[name] = tokenizer.token_to_id(token)
        else:
            mapping[name] = tokenizer.add_special_token(token)
    return mapping


def build_forbid_rep_mask(
    tokenizer: AACTokenizer, mode: str = "content_words"
) -> np.ndarray | None:
    """(vocab,) bool — True = token may not repeat
    (parity: ``pl_modules/common.py:222-299``)."""
    if mode == "none":
        return None
    vocab_size = tokenizer.get_vocab_size()
    if mode == "all":
        return np.ones((vocab_size,), bool)
    if mode == "content_words":
        mask = np.ones((vocab_size,), bool)
        for word in ENGLISH_STOPWORDS:
            if tokenizer.has(word):
                mask[tokenizer.token_to_id(word)] = False
        return mask
    raise ValueError(
        f"Invalid forbid_rep mode {mode!r}. "
        "(expected one of ('none', 'all', 'content_words'))"
    )


def conette_init(key: jax.Array, cfg: ConetteConfig) -> Params:
    """Initialize projection + decoder parameter pytree."""
    kp, kd = jax.random.split(key)
    return {
        "projection": linear_init(kp, cfg.proj_in, cfg.d_model, init="torch"),
        "decoder": decoder_init(kd, cfg.decoder_config()),
    }


def encode_audio(
    params: Params,
    cfg: ConetteConfig,
    audio: jax.Array,
    audio_lens: jax.Array,
    *,
    deterministic: bool = True,
    rng: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Project (B, T, 768) frame embeddings → (B, T, d_model) memory and a
    (B, T) pad mask (True = PAD).

    Parity: identity encoder + Dropout/Linear/ReLU/Dropout projection +
    ``lengths_to_pad_mask`` (``conette.py:452-467``).
    """
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    x = dropout(r1, audio, cfg.proj_dropout_p, deterministic)
    x = jax.nn.relu(linear(params["projection"], x))
    x = dropout(r2, x, cfg.proj_dropout_p, deterministic)
    t = x.shape[1]
    pad_mask = jnp.arange(t)[None, :] >= audio_lens[:, None]
    return x, pad_mask


def tasks_to_bos_ids(
    cfg: ConetteConfig,
    task_token_ids: dict[str, int],
    datasets: Sequence[str],
    sources: Sequence[str | None] | None = None,
) -> np.ndarray:
    """Map per-example dataset(+source) strings to ``<bos_task>`` ids
    (parity: ``conette.py:486-525``)."""
    n = len(datasets)
    if cfg.task_mode == "none":
        return np.full((n,), cfg.bos_id, np.int32)
    if cfg.task_mode == "ds":
        names = list(datasets)
    elif cfg.task_mode == "ds_src":
        if sources is None:
            sources = [None] * n
        names = [
            ds if src is None else f"{ds}_{src}".lower()
            for ds, src in zip(datasets, sources)
        ]
    else:
        raise ValueError(f"Invalid task mode {cfg.task_mode!r}.")
    return np.asarray([task_token_ids[name] for name in names], np.int32)


def forward_forcing(
    params: Params,
    cfg: ConetteConfig,
    memory: jax.Array,
    memory_pad_mask: jax.Array,
    caps_in: jax.Array,
    *,
    caps_in_pad_mask: jax.Array | None = None,
    deterministic: bool = True,
    rng: jax.Array | None = None,
    caps_in_embedded: bool = False,
) -> jax.Array:
    """Teacher forcing → (B, vocab, L) logits (reference output layout,
    ``nn/decoding/forcing.py:12-71``)."""
    if caps_in_pad_mask is None and not caps_in_embedded:
        caps_in_pad_mask = caps_in == cfg.pad_id
    logits = decoder_forward(
        params["decoder"],
        cfg.decoder_config(),
        memory,
        caps_in,
        memory_key_padding_mask=memory_pad_mask,
        caps_in_pad_mask=caps_in_pad_mask,
        deterministic=deterministic,
        rng=rng,
        caps_in_embedded=caps_in_embedded,
    )
    return jnp.transpose(logits, (0, 2, 1))


def forward_generate(
    params: Params,
    cfg: ConetteConfig,
    memory: jax.Array,
    memory_pad_mask: jax.Array,
    bos_ids: jax.Array,
    *,
    beam_size: int | None = None,
    min_pred_size: int | None = None,
    max_pred_size: int | None = None,
    forbid_rep_mask: jax.Array | None = None,
    kv_reorder: str | None = None,
    l_chunks: int | None = None,
    eos_bias_schedule: jax.Array | None = None,
) -> BeamResult:
    return beam_search(
        params["decoder"],
        cfg.decoder_config(),
        memory,
        memory_pad_mask,
        bos_ids,
        beam_size=beam_size if beam_size is not None else cfg.beam_size,
        min_pred_size=min_pred_size if min_pred_size is not None else cfg.min_pred_size,
        max_pred_size=max_pred_size if max_pred_size is not None else cfg.max_pred_size,
        forbid_rep_mask=forbid_rep_mask,
        kv_reorder=kv_reorder,
        l_chunks=l_chunks,
        eos_bias_schedule=eos_bias_schedule,
    )


def forward_greedy(
    params: Params,
    cfg: ConetteConfig,
    memory: jax.Array,
    memory_pad_mask: jax.Array,
    bos_ids: jax.Array,
    *,
    min_pred_size: int | None = None,
    max_pred_size: int | None = None,
    forbid_rep_mask: jax.Array | None = None,
) -> GreedyResult:
    return greedy_search(
        params["decoder"],
        cfg.decoder_config(),
        memory,
        memory_pad_mask,
        bos_ids,
        min_pred_size=min_pred_size if min_pred_size is not None else cfg.min_pred_size,
        max_pred_size=max_pred_size if max_pred_size is not None else cfg.max_pred_size,
        forbid_rep_mask=forbid_rep_mask,
    )


def embed_tokens(
    params: Params,
    ids: jax.Array,
    dtype: Any = jnp.float32,
    pad_id: int | None = None,
) -> jax.Array:
    """Token embedding lookup (pre-scale), used by the mixup training path
    (``conette.py:207-210``).

    :param pad_id: when given, the PAD row's gradient is frozen — torch
        ``nn.Embedding(padding_idx=pad)`` semantics. This matters under
        mixup: ``emb[pad]`` leaks into live positions of the mixing
        partner, so without the freeze the (zero-initialized) PAD row
        would drift during training (torch keeps it exactly zero).
    """
    emb = params["decoder"]["emb"]
    if pad_id is not None:
        weight = emb["weight"]
        weight = weight.at[pad_id].set(jax.lax.stop_gradient(weight[pad_id]))
        emb = {"weight": weight}
    return embedding(emb, ids, dtype=dtype)
