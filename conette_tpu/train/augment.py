"""On-device data augmentations (pure JAX, usable inside the jitted step).

Semantics twins of the reference augmentation set, validated against the
reference's ACTUAL transform code in
``tests/test_reference_transforms_parity.py``
(``src/conette/transforms/audio/spec_aug.py:19-262``,
``speed_perturb.py:14-109``, ``resample.py:15-75``, ``cutoutspec.py:15-211``,
``mixup.py:14-130``):

- ``spec_augment``          — PANN-style fixed-width time/freq stripes;
- ``spec_augment_ratio``    — stripe width drawn from ``randint(round(dim*r0),
  round(dim*r1))`` (the production train transform,
  ``conf/audio_t/spec_aug_ratio_emb.yaml`` with ratios ``[0.0, 0.1]``);
- ``speed_perturb``         — nearest-neighbour resample (round-half-even
  index map, ``resample.py:65-75``) + pad/crop back to the input length with
  left/right/center/random alignment (``speed_perturb.py:79-92``);
- ``cutout_spec``           — rectangular cutout, sizes from
  ``randint(ceil(dim*s0), max(ceil(dim*s1), min+1))`` (``cutoutspec.py:176-211``);
- ``mixup`` / ``pann_mixup`` — convex combinations along the batch.

All functions take an explicit PRNG key and keep static shapes (stripes are
masks, speed perturbation is an index remap at the target length) so they
compile into the training program instead of running on host.

Documented divergences from the reference (deliberate):

- stripes/cutouts are drawn PER ROW (``jax.vmap`` + per-row fold-in) whereas
  the reference's modules share one draw across every leading dim of the
  tensor they see — equivalent in production, where transforms run per-item
  in the dataloader before collation (``datamodules/common.py:99-109``);
- with ``time_valid`` given, stripes/ratio-bounds use each row's REAL length
  instead of the padded size, so augmentation is invariant to batch padding
  (the reference can land stripes entirely inside padding for short clips);
- ``speed_perturb``/``resample`` apply with probability ``p``; the
  reference's ``forward`` applies with probability ``1 - (p - floor(p))``
  for fractional ``p`` (``speed_perturb.py:66-73``, ``resample.py:43-52``:
  ``rest < random.random()`` inverts the test) — we do not mirror that bug;
- ``spec_augment_ratio`` guards the ``width == dim`` corner (full-width
  stripe) that makes the reference raise in ``torch.randint(0, 0)``
  (``spec_aug.py:204-206``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from conette_tpu.train.objective import sample_lambda


# ---------------------------------------------------------------------------
# deterministic cores (shared by the drawing paths and the parity tests)
# ---------------------------------------------------------------------------


def stripes_mask(
    dim_size: int, starts: jax.Array, widths: jax.Array
) -> jax.Array:
    """(dim_size,) bool mask, True inside any stripe [start, start+width)
    — the slicing core of the reference ``DropStripes.forward``
    (``spec_aug.py:84-88``). ``starts``/``widths`` are (n_stripes,)."""
    idx = jnp.arange(dim_size)
    starts = jnp.asarray(starts, jnp.int32).reshape(-1, 1)
    widths = jnp.asarray(widths, jnp.int32).reshape(-1, 1)
    return jnp.any((idx >= starts) & (idx < starts + widths), axis=0)


def apply_stripes(
    x: jax.Array,
    starts: jax.Array,
    widths: jax.Array,
    axis: int,
    fill_value: float = 0.0,
) -> jax.Array:
    """Fill ``[start, start+width)`` slices along ``axis`` with
    ``fill_value`` (reference ``DropStripes.forward`` given its draws,
    ``spec_aug.py:84-88``)."""
    axis = axis % x.ndim
    mask = stripes_mask(x.shape[axis], starts, widths)
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    return jnp.where(mask.reshape(shape), fill_value, x)


def ratio_width_bounds(
    dim: jax.Array | int, ratios: tuple[float, float]
) -> tuple[jax.Array, jax.Array]:
    """``(imin, imax)`` stripe-width bounds of the reference
    ``DropStripesRatio.forward`` (``spec_aug.py:190-199``):
    ``round(dim * r)`` with round-half-even (Python ``round`` == ``jnp.round``).
    Widths are then ``randint(imin, imax)`` (exactly ``imin`` if
    imin == imax)."""
    d = jnp.asarray(dim, jnp.float32)
    imin = jnp.round(d * ratios[0]).astype(jnp.int32)
    imax = jnp.round(d * ratios[1]).astype(jnp.int32)
    return imin, imax


def resample_nearest(
    x: jax.Array, rate: float, time_axis: int = -1
) -> jax.Array:
    """Reference ``ResampleNearest._resample_nearest`` (``resample.py:65-75``)
    for a CONCRETE rate: output length ``ceil(t * rate)``,
    ``out[i] = x[clamp(round_half_even(i / rate), max=t-1)]``.

    Static-shape helper (rate must be a Python float); ``speed_perturb``
    inlines the same index map for traced rates."""
    t = x.shape[time_axis]
    t_out = math.ceil(t * rate)
    src = jnp.round(jnp.arange(t_out, dtype=jnp.float32) / rate)
    src = jnp.clip(src.astype(jnp.int32), 0, t - 1)
    return jnp.take(x, src, axis=time_axis)


# ---------------------------------------------------------------------------
# stripe draws (reference RNG semantics, JAX keys)
# ---------------------------------------------------------------------------


def _draw_stripes(
    key: jax.Array,
    max_width: jax.Array | int,
    n_stripes: int,
    valid: jax.Array | int,
) -> tuple[jax.Array, jax.Array]:
    """Fixed-width draws (``DropStripes.forward``, ``spec_aug.py:63-82``):
    clip ``max_width`` to the extent, ``width ~ randint(0, max_width)``,
    ``start ~ randint(0, extent - width)``."""
    v = jnp.asarray(valid, jnp.int32)
    mw = jnp.maximum(jnp.minimum(jnp.asarray(max_width, jnp.int32), v), 1)
    keys = jax.random.split(key, 2 * n_stripes)
    widths, starts = [], []
    for i in range(n_stripes):
        w = jax.random.randint(keys[2 * i], (), 0, mw)
        s = jax.random.randint(keys[2 * i + 1], (), 0, jnp.maximum(v - w, 1))
        widths.append(w)
        starts.append(s)
    return jnp.stack(starts), jnp.stack(widths)


def _draw_stripes_ratio(
    key: jax.Array,
    ratios: tuple[float, float],
    n_stripes: int,
    valid: jax.Array | int,
) -> tuple[jax.Array, jax.Array]:
    """Ratio draws (``DropStripesRatio.forward``, ``spec_aug.py:190-211``):
    ``width ~ randint(round(v*r0), round(v*r1))``; equal bounds give
    exactly ``imin``. (imin > imax is unreachable — the reference
    validates r0 <= r1 at init, ``spec_aug.py:162-165`` — but kept as a
    safe no-op for traced per-row extents.)"""
    v = jnp.asarray(valid, jnp.int32)
    imin, imax = ratio_width_bounds(v, ratios)
    keys = jax.random.split(key, 2 * n_stripes)
    widths, starts = [], []
    for i in range(n_stripes):
        drawn = jax.random.randint(
            keys[2 * i], (), imin, jnp.maximum(imax, imin + 1)
        )
        w = jnp.where(imin >= imax, imin, drawn)
        w = jnp.where(imin > imax, 0, w)  # reference: no-op when imin > imax
        w = jnp.minimum(w, v)  # guard the randint(0, 0) crash corner
        s = jax.random.randint(keys[2 * i + 1], (), 0, jnp.maximum(v - w, 1))
        widths.append(w)
        starts.append(s)
    return jnp.stack(starts), jnp.stack(widths)


# ---------------------------------------------------------------------------
# public transforms
# ---------------------------------------------------------------------------


def spec_augment(
    key: jax.Array,
    x: jax.Array,
    time_drop_width: jax.Array | int = 64,
    time_stripes_num: int = 2,
    freq_drop_width: int = 28,
    freq_stripes_num: int = 2,
    row_ids: jax.Array | None = None,
    time_valid: jax.Array | None = None,
    fill_value: float = 0.0,
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
        ts, tws = _draw_stripes(kt, twi, time_stripes_num, tvi)
        fs, fws = _draw_stripes(kf, freq_drop_width, freq_stripes_num, f)
        drop = (
            stripes_mask(t, ts, tws)[:, None]
            | stripes_mask(f, fs, fws)[None, :]
        )
        return jnp.where(drop, fill_value, xi)

    return jax.vmap(one)(row_ids, x, tv, tw)


def spec_augment_ratio(
    key: jax.Array,
    x: jax.Array,
    time_ratios: tuple[float, float] = (0.0, 0.1),
    time_stripes_num: int = 2,
    freq_ratios: tuple[float, float] = (0.0, 0.1),
    freq_stripes_num: int = 2,
    row_ids: jax.Array | None = None,
    time_valid: jax.Array | None = None,
    fill_value: float = 0.0,
) -> jax.Array:
    """SpecAugment with stripe widths drawn from ratio bounds of the dim —
    the production train-time transform applied to frame embeddings
    (``spec_aug.py:153-262``; defaults are
    ``conf/audio_t/spec_aug_ratio_emb.yaml``: ratios [0.0, 0.1], 2+2
    stripes). Width ~ ``randint(round(dim*r0), round(dim*r1))``, matching
    the reference's bounds exactly (NOT ``int(dim*r)`` truncation).

    With ``time_valid`` the bounds apply to each row's REAL length, so
    stripes neither shrink nor drift into padding however far the batch is
    padded (e.g. under multi-host fixed shapes)."""
    b, t, f = x.shape
    if row_ids is None:
        row_ids = jnp.arange(b)
    tv = (
        jnp.full((b,), t, jnp.int32)
        if time_valid is None
        else jnp.asarray(time_valid, jnp.int32)
    )

    def one(rid, xi, tvi):
        kt, kf = jax.random.split(jax.random.fold_in(key, rid))
        ts, tws = _draw_stripes_ratio(kt, time_ratios, time_stripes_num, tvi)
        fs, fws = _draw_stripes_ratio(kf, freq_ratios, freq_stripes_num, f)
        drop = (
            stripes_mask(t, ts, tws)[:, None]
            | stripes_mask(f, fs, fws)[None, :]
        )
        return jnp.where(drop, fill_value, xi)

    return jax.vmap(one)(row_ids, x, tv)


def speed_perturb(
    key: jax.Array,
    x: jax.Array,
    rates: tuple[float, float] = (0.9, 1.1),
    p: float = 1.0,
    align: str = "random",
    fill_value: float = 0.0,
    time_axis: int = -1,
) -> jax.Array:
    """Reference ``SpeedPerturbation`` (``speed_perturb.py:14-109``) with
    static shapes: nearest-neighbour resample by ``rate ~ U(rates)``
    (round-half-even index map, length ``L = ceil(t*rate)``), then pad
    (slowed) or crop (sped-up) back to the input length with ``align``
    placement (left/right/center/random). Defaults mirror the reference
    class (rates (0.9, 1.1), align random, constant 0 fill).

    Instead of materializing the length-L intermediate (data-dependent
    shape), the output is computed directly as
    ``y[j] = x[clamp(round((j - off)/rate))]`` masked to the resampled
    extent — identical values, one static gather."""
    if align not in ("left", "right", "center", "random"):
        raise ValueError(f"invalid {align=}")
    k_apply, k_rate, k_align = jax.random.split(key, 3)
    t = x.shape[time_axis]
    if rates[0] == rates[1]:
        rate = jnp.asarray(rates[0], jnp.float32)
    else:
        rate = jax.random.uniform(
            k_rate, (), minval=rates[0], maxval=rates[1]
        )
    # L = ceil(t * rate), computed in f32 like torch's arange length
    L = jnp.ceil(t * rate).astype(jnp.int32)
    if align == "left":
        off = jnp.zeros((), jnp.int32)
    elif align == "right":
        off = t - L
    elif align == "center":
        off = jnp.where(L >= t, -((L - t) // 2), (t - L) // 2)
    else:  # random
        u = jax.random.randint(k_align, (), 0, jnp.abs(L - t) + 1)
        off = jnp.where(L >= t, -u, u)

    idx = jnp.arange(t, dtype=jnp.int32)
    rel = idx - off
    src = jnp.round(rel.astype(jnp.float32) / rate).astype(jnp.int32)
    src = jnp.clip(src, 0, t - 1)
    perturbed = jnp.take(x, src, axis=time_axis)
    in_range = (rel >= 0) & (rel < L)
    mask_shape = [1] * x.ndim
    mask_shape[time_axis % x.ndim] = t
    perturbed = jnp.where(
        in_range.reshape(mask_shape), perturbed, fill_value
    )
    if p >= 1.0:
        return perturbed
    apply = jax.random.bernoulli(k_apply, p)
    return jnp.where(apply, perturbed, x)


def cutout_spec(
    key: jax.Array,
    x: jax.Array,
    time_size_range: tuple[float, float] = (0.1, 0.5),
    freq_size_range: tuple[float, float] = (0.1, 0.5),
    fill_value: float = -100.0,
) -> jax.Array:
    """Rectangular cutout on (B, T, F) spectrograms — reference
    ``CutOutSpec`` with constant fill (``cutoutspec.py:15-124``). Rectangle
    sides follow ``gen_range`` (``cutoutspec.py:156-211``):
    ``size ~ randint(ceil(dim*s0), max(ceil(dim*s1), min+1))`` and
    ``start ~ randint(0, max(dim - size + 1, 1))`` — so ``(0.5, 0.5)``
    gives exactly ``ceil(dim/2)``. One rectangle per batch row (the
    reference shares one across whatever leading dims it sees; per-item in
    production)."""
    b, t, f = x.shape

    def side(k, n, scales):
        smin = math.ceil(scales[0] * n)
        smax = max(math.ceil(scales[1] * n), smin + 1)
        k1, k2 = jax.random.split(k)
        size = jax.random.randint(k1, (), smin, smax)
        start = jax.random.randint(k2, (), 0, jnp.maximum(n - size + 1, 1))
        return start, size

    def one(key, xi):
        kf, kt = jax.random.split(key)
        # reference order: freq slice drawn first (cutoutspec.py:91-96)
        f0, fw = side(kf, f, freq_size_range)
        t0, tw = side(kt, t, time_size_range)
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
    allow_self_pairing: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batch mixup with a random pairing permutation; returns
    (mixed, lambda, permutation).

    ``allow_self_pairing=True`` mirrors the reference ``Mixup`` module's
    plain ``torch.randperm`` (``transforms/mixup.py:125-130``, fixed points
    possible); the default derangement pairing is what the production
    training step uses (``pl_modules/conette.py:195`` via
    ``randperm_diff``)."""
    from conette_tpu.train.objective import randperm_diff

    k_perm, k_lbd = jax.random.split(key)
    if allow_self_pairing:
        idx = jax.random.permutation(k_perm, x.shape[0])
    else:
        idx = randperm_diff(k_perm, x.shape[0])
    lbd = sample_lambda(k_lbd, alpha, asymmetric)
    return x * lbd + x[idx] * (1.0 - lbd), lbd, idx


def pann_mixup(x: jax.Array, lam: jax.Array) -> jax.Array:
    """PANN-style mixup of adjacent pairs: (2N, ...) → (N, ...) with per-pair
    weights ``lam`` (``transforms/mixup.py:14-28``)."""
    even = x[0::2]
    odd = x[1::2]
    shape = (-1,) + (1,) * (x.ndim - 1)
    lam = lam.reshape(-1)
    return even * lam[0::2].reshape(shape) + odd * lam[1::2].reshape(shape)
