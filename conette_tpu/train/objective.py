"""Training objective: embedding-space mixup + label-smoothed CE.

Parity with the reference training step
(``src/conette/pl_modules/conette.py:187-231``):

- asymmetric mixup: λ ~ Beta(α, α) folded into [0.5, 1]
  (``transforms/mixup.py:14-56``), pairing by a derangement-ish random
  permutation (``randperm_diff``), applied to BOTH the audio frame
  embeddings and the input token embeddings, while targets stay unmixed;
- mixed audio lengths take the max of the pair (``conette.py:472-483``);
- CE with ``ignore_index=pad`` and label smoothing (torch semantics:
  mean over non-pad targets, smoothed target distribution ε/K).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from conette_tpu.models.conette import (
    ConetteConfig,
    embed_tokens,
    encode_audio,
    forward_forcing,
)

Params = dict[str, Any]


def sample_lambda(
    key: jax.Array, alpha: float, asymmetric: bool = True
) -> jax.Array:
    """λ ~ Beta(α, α); asymmetric folds to [0.5, 1] via max(λ, 1-λ)
    (parity: ``transforms/mixup.py:31-58``, incl. the α == 0 edge cases:
    asymmetric → constant 1.0, symmetric → fair coin in {0, 1})."""
    if alpha == 0.0:
        if asymmetric:
            return jnp.asarray(1.0, jnp.float32)
        return jax.random.bernoulli(key).astype(jnp.float32)
    lbd = jax.random.beta(key, alpha, alpha)
    if asymmetric:
        lbd = jnp.maximum(lbd, 1.0 - lbd)
    return lbd


def randperm_diff(key: jax.Array, n: int) -> jax.Array:
    """Random permutation with no fixed points for n>1 (cyclic shift of a
    random permutation — the reference resamples until derangement;
    a rotated permutation is an equivalent fixed-point-free pairing)."""
    perm = jax.random.permutation(key, n)
    inv = jnp.argsort(perm)
    return perm[(inv + 1) % n]


def label_smoothed_ce(
    logits: jax.Array,
    targets: jax.Array,
    pad_id: int,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """torch ``CrossEntropyLoss(ignore_index=pad, label_smoothing=ε)``:
    mean over non-pad positions of CE against the ε-smoothed target.

    :param logits: (B, vocab, L) (reference layout) or (B, L, vocab).
    :param targets: (B, L) token ids.
    """
    if logits.shape[1] != targets.shape[1]:
        logits = jnp.swapaxes(logits, 1, 2)  # → (B, L, vocab)
    vocab = logits.shape[-1]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(lp, axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    mask = targets != pad_id
    return jnp.sum(jnp.where(mask, loss, 0.0)) / jnp.maximum(mask.sum(), 1)


def per_caption_ce(
    logits: jax.Array, targets: jax.Array, pad_id: int
) -> jax.Array:
    """Per-example mean CE over non-pad tokens (reference
    ``CrossEntropyLossMean(dim=1)`` used as validation loss)."""
    if logits.shape[1] != targets.shape[1]:
        logits = jnp.swapaxes(logits, 1, 2)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    mask = targets != pad_id
    return jnp.sum(jnp.where(mask, nll, 0.0), axis=1) / jnp.maximum(mask.sum(axis=1), 1)


def training_loss(
    params: Params,
    cfg: ConetteConfig,
    batch: dict[str, jax.Array],
    rng: jax.Array,
    *,
    use_mixup: bool = True,
    mixup_override: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """One training-step loss on a batch with keys ``audio`` (B, T, 768),
    ``audio_lens`` (B,), ``captions`` (B, L) (first column already rewritten
    to the task token, parity with ``on_after_batch_transfer``,
    ``conette.py:527-550``).

    :param mixup_override: optional (λ, perm) replacing the sampled mixup
        randomness — used by the torch train-step golden to drive both
        frameworks with identical mixing."""
    audio = batch["audio"]
    audio_lens = batch["audio_lens"]
    captions = batch["captions"]
    b = captions.shape[0]

    k_perm, k_lbd, k_drop = jax.random.split(rng, 3)

    caps_in = captions[:, :-1]
    caps_out = captions[:, 1:]
    caps_in_pad_mask = caps_in == cfg.pad_id

    caps_emb = embed_tokens(params, caps_in, dtype=audio.dtype, pad_id=cfg.pad_id)

    if use_mixup:
        if mixup_override is not None:
            lbd, idx = mixup_override
        else:
            idx = randperm_diff(k_perm, b)
            lbd = sample_lambda(k_lbd, cfg.mixup_alpha, asymmetric=True)
        audio = audio * lbd + audio[idx] * (1.0 - lbd)
        audio_lens = jnp.maximum(audio_lens, audio_lens[idx])
        caps_emb = caps_emb * lbd + caps_emb[idx] * (1.0 - lbd)

    memory, memory_pad = encode_audio(
        params, cfg, audio, audio_lens, deterministic=False, rng=k_drop
    )
    logits = forward_forcing(
        params,
        cfg,
        memory,
        memory_pad,
        caps_emb,
        caps_in_pad_mask=caps_in_pad_mask,
        deterministic=False,
        rng=jax.random.fold_in(k_drop, 1),
        caps_in_embedded=True,
    )
    return label_smoothed_ce(logits, caps_out, cfg.pad_id, cfg.label_smoothing)


def per_ref_losses(
    params: Params,
    cfg: ConetteConfig,
    batch: dict[str, jax.Array],
) -> tuple[jax.Array, jax.Array]:
    """Per-(clip, reference) teacher-forced CE over ``mult_captions``
    (B, R, L) → (losses (B, R), valid (B, R)); all-pad reference rows are
    marked invalid. This is the reference's per-caption test/val ``losses``
    column (``conette.py:233-350``, the published CSVs' first column)."""
    audio = batch["audio"]
    audio_lens = batch["audio_lens"]
    mult_caps = batch["mult_captions"]

    memory, memory_pad = encode_audio(params, cfg, audio, audio_lens)

    def one_ref(caps: jax.Array) -> tuple[jax.Array, jax.Array]:
        caps_in, caps_out = caps[:, :-1], caps[:, 1:]
        logits = forward_forcing(
            params, cfg, memory, memory_pad, caps_in,
            caps_in_pad_mask=caps_in == cfg.pad_id,
        )
        losses = per_caption_ce(logits, caps_out, cfg.pad_id)
        # validity ignores column 0: the batch post-processor stamps the
        # task token into EVERY ref row's first slot — including pad rows
        # that only exist because items in the batch have fewer refs than
        # the batch max — so [task_id, pad, ...] must NOT count as a
        # caption (it would contribute a spurious 0.0 loss)
        nonempty = (caps[:, 1:] != cfg.pad_id).any(axis=1)
        return losses, nonempty

    return jax.vmap(one_ref, in_axes=1, out_axes=1)(mult_caps)


def validation_loss(
    params: Params,
    cfg: ConetteConfig,
    batch: dict[str, jax.Array],
) -> jax.Array:
    """Mean per-caption forced loss over all references
    (parity: ``conette.py:233-291`` validation_step). ``mult_captions``
    is (B, R, L); rows whose caption is all pad are skipped."""
    losses, valid = per_ref_losses(params, cfg, batch)
    total = jnp.sum(jnp.where(valid, losses, 0.0))
    return total / jnp.maximum(valid.sum(), 1)
