"""On-device data augmentations (pure JAX, usable inside the jitted step).

Capability twins of the reference augmentation set
(``src/conette/transforms/audio/spec_aug.py:19-262``,
``speed_perturb.py:14-92``, ``cutoutspec.py:15``, ``mixup.py:14-130``):

- ``spec_augment``          — PANN-style fixed-width time/freq stripes;
- ``spec_augment_ratio``    — stripe width as a ratio of the dim (the
  production train transform, ``conf/audio_t/spec_aug_ratio_emb.yaml``);
- ``speed_perturb``         — nearest-neighbour resample + pad/crop;
- ``cutout_spec``           — rectangular spectrogram cutout;
- ``mixup`` / ``pann_mixup`` — convex combinations along the batch.

All functions take an explicit PRNG key and keep static shapes (stripes are
masks, speed perturbation uses a gather with a static output length) so
they compile into the training program instead of running on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conette_tpu.train.objective import sample_lambda


def _stripe_mask(
    key: jax.Array,
    dim_size: int,
    width: jax.Array | int,
    n_stripes: int,
    valid: jax.Array | int | None = None,
) -> jax.Array:
    """(dim_size,) bool mask with ``n_stripes`` random stripes of random
    width in [0, width) (PANN DropStripes semantics).

    :param width: max stripe width — may be a traced per-row value.
    :param valid: true extent of the axis; stripes are placed within
        [0, valid) so padding never absorbs them (defaults to
        ``dim_size``)."""
    v = jnp.asarray(dim_size if valid is None else valid, jnp.int32)
    keys = jax.random.split(key, 2 * n_stripes)
    mask = jnp.zeros((dim_size,), bool)
    idx = jnp.arange(dim_size)
    for i in range(n_stripes):
        w = jax.random.randint(
            keys[2 * i], (), 0, jnp.maximum(jnp.asarray(width, jnp.int32), 1)
        )
        start = jax.random.randint(
            keys[2 * i + 1], (), 0, jnp.maximum(v - w, 1)
        )
        mask = mask | ((idx >= start) & (idx < start + w))
    return mask


def spec_augment(
    key: jax.Array,
    x: jax.Array,
    time_drop_width: jax.Array | int = 64,
    time_stripes_num: int = 2,
    freq_drop_width: int = 28,
    freq_stripes_num: int = 2,
    row_ids: jax.Array | None = None,
    time_valid: jax.Array | None = None,
) -> jax.Array:
    """(B, T, F) spectrogram/embedding SpecAugment (PANN-style; defaults are
    the reference ConvNeXt settings, ``convnext.py:184-191``).

    :param row_ids: per-row fold-in ids (default ``arange(B)``). Each row's
        stripes depend only on ``(key, row_id)``, not the batch size —
        multi-host training passes GLOBAL row ids so every process draws
        the stripes its rows would get in the single-process run.
    :param time_valid: (B,) true time lengths; when given, time stripes
        are placed within each row's real extent (and ``time_drop_width``
        may be per-row), so the augmentation is invariant to how far the
        batch is padded — unlike the reference, whose stripes can land
        entirely inside padding for short clips."""
    b, t, f = x.shape
    if row_ids is None:
        row_ids = jnp.arange(b)
    tv = (
        jnp.full((b,), t, jnp.int32)
        if time_valid is None
        else jnp.asarray(time_valid, jnp.int32)
    )
    tw = jnp.broadcast_to(jnp.asarray(time_drop_width, jnp.int32), (b,))

    def one(rid, xi, tvi, twi):
        kt, kf = jax.random.split(jax.random.fold_in(key, rid))
        tmask = _stripe_mask(kt, t, twi, time_stripes_num, valid=tvi)
        fmask = _stripe_mask(kf, f, freq_drop_width, freq_stripes_num)
        keep = ~(tmask[:, None] | fmask[None, :])
        return jnp.where(keep, xi, 0.0)

    return jax.vmap(one)(row_ids, x, tv, tw)


def spec_augment_ratio(
    key: jax.Array,
    x: jax.Array,
    time_drop_ratio: float = 0.5,
    time_stripes_num: int = 2,
    freq_drop_ratio: float = 0.125,
    freq_stripes_num: int = 2,
    row_ids: jax.Array | None = None,
    time_valid: jax.Array | None = None,
) -> jax.Array:
    """SpecAugment with stripe width as a ratio of the dimension — the
    production train-time transform applied to frame embeddings
    (``spec_aug.py:153-262``, ``conf/audio_t/spec_aug_ratio_emb.yaml``).
    With ``time_valid`` the time ratio applies to each row's REAL length,
    so stripes neither shrink nor drift into padding however far the batch
    is padded (e.g. under multi-host fixed shapes)."""
    b, t, f = x.shape
    if time_valid is None:
        time_w: jax.Array | int = max(int(t * time_drop_ratio), 1)
    else:
        time_w = jnp.maximum(
            (jnp.asarray(time_valid, jnp.float32) * time_drop_ratio).astype(
                jnp.int32
            ),
            1,
        )
    return spec_augment(
        key,
        x,
        time_drop_width=time_w,
        time_stripes_num=time_stripes_num,
        freq_drop_width=max(int(f * freq_drop_ratio), 1),
        freq_stripes_num=freq_stripes_num,
        row_ids=row_ids,
        time_valid=time_valid,
    )


def speed_perturb(
    key: jax.Array,
    x: jax.Array,
    rates: tuple[float, float] = (0.5, 1.5),
    p: float = 0.5,
    time_axis: int = -1,
) -> jax.Array:
    """Nearest-neighbour speed perturbation with pad/crop back to the input
    length (``transforms/audio/speed_perturb.py:14-92``). Static output
    shape: the time axis is index-remapped by a random rate; slowed signals
    are zero-padded at the tail, sped-up signals crop naturally."""
    k_apply, k_rate = jax.random.split(key)
    t = x.shape[time_axis]
    rate = jax.random.uniform(k_rate, (), minval=rates[0], maxval=rates[1])
    src_idx = jnp.floor(jnp.arange(t) * rate).astype(jnp.int32)
    valid = src_idx < t
    src_idx = jnp.clip(src_idx, 0, t - 1)
    perturbed = jnp.take(x, src_idx, axis=time_axis)
    mask_shape = [1] * x.ndim
    mask_shape[time_axis] = t
    perturbed = perturbed * valid.reshape(mask_shape)
    apply = jax.random.bernoulli(k_apply, p)
    return jnp.where(apply, perturbed, x)


def cutout_spec(
    key: jax.Array,
    x: jax.Array,
    time_ratio: tuple[float, float] = (0.1, 0.5),
    freq_ratio: tuple[float, float] = (0.1, 0.5),
    fill_value: float = -100.0,
) -> jax.Array:
    """Rectangular cutout on (B, T, F) spectrograms
    (``transforms/audio/cutoutspec.py:15``)."""
    b, t, f = x.shape

    def one(key, xi):
        kt1, kt2, kf1, kf2 = jax.random.split(key, 4)
        tw = jax.random.uniform(kt1, (), minval=time_ratio[0], maxval=time_ratio[1])
        fw = jax.random.uniform(kf1, (), minval=freq_ratio[0], maxval=freq_ratio[1])
        tw = (tw * t).astype(jnp.int32)
        fw = (fw * f).astype(jnp.int32)
        t0 = jax.random.randint(kt2, (), 0, jnp.maximum(t - tw, 1))
        f0 = jax.random.randint(kf2, (), 0, jnp.maximum(f - fw, 1))
        ti = jnp.arange(t)[:, None]
        fi = jnp.arange(f)[None, :]
        inside = (ti >= t0) & (ti < t0 + tw) & (fi >= f0) & (fi < f0 + fw)
        return jnp.where(inside, fill_value, xi)

    return jax.vmap(one)(jax.random.split(key, b), x)


def mixup(
    key: jax.Array,
    x: jax.Array,
    alpha: float = 0.4,
    asymmetric: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batch mixup with a random pairing permutation; returns
    (mixed, lambda, permutation) (``transforms/mixup.py:58-96``)."""
    from conette_tpu.train.objective import randperm_diff

    k_perm, k_lbd = jax.random.split(key)
    idx = randperm_diff(k_perm, x.shape[0])
    lbd = sample_lambda(k_lbd, alpha, asymmetric)
    return x * lbd + x[idx] * (1.0 - lbd), lbd, idx


def pann_mixup(x: jax.Array, lam: jax.Array) -> jax.Array:
    """PANN-style mixup of adjacent pairs: (2N, ...) → (N, ...) with per-pair
    weights ``lam`` (``transforms/mixup.py:99-130``)."""
    even = x[0::2]
    odd = x[1::2]
    shape = (-1,) + (1,) * (x.ndim - 1)
    lam = lam.reshape(-1)
    return even * lam[0::2].reshape(shape) + odd * lam[1::2].reshape(shape)
