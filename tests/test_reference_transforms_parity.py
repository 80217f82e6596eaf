"""Augmentation parity vs the reference's ACTUAL transform code.

Drives the real ``conette.transforms.audio.{spec_aug,speed_perturb,
resample,cutoutspec}`` and ``conette.transforms.mixup`` modules (imported
from ``/root/reference`` via ``tests/reference_shim.py``) as oracles for
``conette_tpu/train/augment.py``.

Randomness bridging: the reference draws from torch RNG, ours from JAX
keys, so draws can never bit-match. Instead each transform is split into
(a) a DETERMINISTIC CORE — tested by replaying the reference's exact RNG
call sequence under a known seed to record its draws, then injecting those
draws into our core and asserting exact equality with the reference
output — and (b) a DRAW DISTRIBUTION — tested by comparing the support
(min/max/feasible widths) of both samplers, which is where the round()/
int() and bound divergences caught by this file used to live.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.reference_shim import load_reference_transforms

from conette_tpu.train.augment import (
    apply_stripes,
    cutout_spec,
    pann_mixup,
    ratio_width_bounds,
    resample_nearest,
    spec_augment,
    spec_augment_ratio,
    speed_perturb,
)
from conette_tpu.train.objective import sample_lambda


@pytest.fixture(scope="module")
def ref():
    return load_reference_transforms()


def _replay_drop_stripes(max_width: int, n: int, total: int):
    """Reproduce the RNG calls of ``DropStripes.forward``
    (``spec_aug.py:63-82``) and return (widths, starts)."""
    mw = min(max_width, total)
    widths = torch.randint(low=0, high=mw, size=(n,)).tolist()
    starts = [
        int(torch.randint(low=0, high=total - size, size=()))
        for size in widths
    ]
    return widths, starts


def _replay_drop_stripes_ratio(ratios, n: int, total: int):
    """Reproduce the RNG calls of ``DropStripesRatio.forward``
    (``spec_aug.py:190-211``)."""
    imin = round(total * ratios[0])
    imax = round(total * ratios[1])
    if imin > imax:
        return [], []
    if imin == imax:
        widths = torch.full((n,), imin)
    else:
        widths = torch.randint(imin, imax, (n,))
    starts = [
        int(torch.randint(low=0, high=total - size, size=()))
        for size in widths
    ]
    return [int(w) for w in widths], starts


class TestDropStripesCore:
    @pytest.mark.parametrize("dim,seed", [(-2, 0), (-1, 1), (-2, 7)])
    def test_core_matches_reference(self, ref, dim, seed):
        t, f = 31, 24
        x = torch.randn(t, f)
        drop = ref.DropStripes(max_width=8, stripes_num=3, dim=dim)
        torch.manual_seed(seed)
        y_ref = drop(x.clone())
        torch.manual_seed(seed)
        widths, starts = _replay_drop_stripes(8, 3, x.shape[dim])
        y_jax = apply_stripes(jnp.asarray(x.numpy()), starts, widths, dim)
        np.testing.assert_array_equal(np.asarray(y_jax), y_ref.numpy())

    def test_core_fill_value(self, ref):
        x = torch.randn(16, 8)
        drop = ref.DropStripes(
            max_width=5, stripes_num=2, dim=-2, fill_value=-3.5
        )
        torch.manual_seed(3)
        y_ref = drop(x.clone())
        torch.manual_seed(3)
        widths, starts = _replay_drop_stripes(5, 2, 16)
        y_jax = apply_stripes(
            jnp.asarray(x.numpy()), starts, widths, -2, fill_value=-3.5
        )
        np.testing.assert_array_equal(np.asarray(y_jax), y_ref.numpy())

    def test_width_clipped_to_extent(self, ref):
        # reference clips max_width to the dim size (spec_aug.py:70-72)
        x = torch.randn(5, 8)
        drop = ref.DropStripes(max_width=64, stripes_num=2, dim=-2)
        torch.manual_seed(11)
        y_ref = drop(x.clone())
        torch.manual_seed(11)
        widths, starts = _replay_drop_stripes(64, 2, 5)
        assert all(w < 5 for w in widths)
        y_jax = apply_stripes(jnp.asarray(x.numpy()), starts, widths, -2)
        np.testing.assert_array_equal(np.asarray(y_jax), y_ref.numpy())


class TestSpecAugmentFull:
    @pytest.mark.parametrize("seed", [0, 5, 13])
    def test_recorded_draws_match(self, ref, seed):
        """Full SpecAugment (time then freq dropper, spec_aug.py:146-149)
        under a seeded global RNG vs our core given the recorded draws."""
        t, f = 31, 64
        x = torch.randn(1, t, f)
        sa = ref.SpecAugment(
            time_max_width=8,
            time_stripes_num=2,
            freq_max_width=4,
            freq_stripes_num=2,
        )
        torch.manual_seed(seed)
        y_ref = sa(x.clone())
        torch.manual_seed(seed)
        tw, ts = _replay_drop_stripes(8, 2, t)
        fw, fs = _replay_drop_stripes(4, 2, f)
        y = apply_stripes(jnp.asarray(x.numpy()), ts, tw, -2)
        y = apply_stripes(y, fs, fw, -1)
        np.testing.assert_array_equal(np.asarray(y), y_ref.numpy())

    @pytest.mark.parametrize(
        "t,ratios,seed",
        [
            (31, (0.0, 0.1), 0),  # production config (spec_aug_ratio_emb)
            (26, (0.0, 0.1), 1),  # round(2.6)=3 vs int(2.6)=2 divergence
            (15, (0.0, 0.1), 2),  # round(1.5)=2 (half-even) vs int=1
            (31, (0.3, 0.7), 3),  # nonzero lower bound
            (20, (0.5, 0.5), 4),  # imin == imax -> constant width
            (3, (0.0, 0.1), 5),  # imax rounds to 0 -> zero-width stripes
        ],
    )
    def test_ratio_recorded_draws_match(self, ref, t, ratios, seed):
        f = 16
        x = torch.randn(1, t, f)
        sa = ref.SpecAugmentRatio(
            time_ratios=ratios,
            time_stripes_num=2,
            freq_ratios=(0.0, 0.1),
            freq_stripes_num=2,
        )
        torch.manual_seed(seed)
        y_ref = sa(x.clone())
        torch.manual_seed(seed)
        tw, ts = _replay_drop_stripes_ratio(ratios, 2, t)
        fw, fs = _replay_drop_stripes_ratio((0.0, 0.1), 2, f)
        y = jnp.asarray(x.numpy())
        if tw:
            y = apply_stripes(y, ts, tw, -2)
        if fw:
            y = apply_stripes(y, fs, fw, -1)
        np.testing.assert_array_equal(np.asarray(y), y_ref.numpy())


class TestRatioWidthBounds:
    @pytest.mark.parametrize(
        "t,ratios",
        [
            (31, (0.0, 0.1)),
            (26, (0.0, 0.1)),
            (15, (0.0, 0.1)),
            (100, (0.0, 0.5)),
            (31, (0.3, 0.7)),
            (20, (0.5, 0.5)),
            (7, (0.0, 1.0)),
        ],
    )
    def test_bounds_match_reference_formula(self, t, ratios):
        """The reference computes imin/imax with Python round()
        (half-even, spec_aug.py:190-192); jnp.round matches."""
        imin, imax = ratio_width_bounds(t, ratios)
        assert int(imin) == round(t * ratios[0])
        assert int(imax) == round(t * ratios[1])

    def test_drawn_width_support_matches(self, ref):
        """Sample widths from BOTH samplers; supports must coincide.
        t=26, ratios (0, 0.1): imax = round(2.6) = 3 so widths in
        {0, 1, 2} — int() truncation would cap at 1."""
        t, ratios, n_draw = 26, (0.0, 0.1), 400
        torch.manual_seed(0)
        ref_widths = set()
        for _ in range(n_draw):
            w, _s = _replay_drop_stripes_ratio(ratios, 2, t)
            ref_widths.update(w)
        x = jnp.zeros((1, t, 8))
        ours = set()
        for i in range(n_draw):
            y = spec_augment_ratio(
                jax.random.PRNGKey(i),
                x - 1.0,
                time_ratios=ratios,
                freq_ratios=(0.0, 0.0),
            )
            # recover time stripe widths from the zeroed mask
            m = np.asarray(y[0, :, 0] == 0.0)
            edges = np.flatnonzero(np.diff(np.concatenate(([0], m, [0]))))
            for a, b in zip(edges[::2], edges[1::2]):
                ours.add(int(b - a))
        ours.add(0)  # zero-width stripes leave no mask
        ref_widths.add(0)
        # overlapping stripes can merge (sum up to 4); restrict to
        # single-stripe-feasible widths
        assert {w for w in ours if w <= 2} == {0, 1, 2}
        assert ref_widths == {0, 1, 2}


class TestResampleNearest:
    @pytest.mark.parametrize("rate", [0.5, 0.8, 0.9, 1.1, 1.23, 1.5, 2.0])
    def test_exact(self, ref, rate):
        x = torch.randn(2, 160)
        rn = ref.ResampleNearest(rates=(rate, rate))
        y_ref = rn.apply_transform(x)
        y_jax = resample_nearest(jnp.asarray(x.numpy()), rate)
        assert y_jax.shape == tuple(y_ref.shape)
        np.testing.assert_array_equal(np.asarray(y_jax), y_ref.numpy())

    def test_output_length_is_ceil(self, ref):
        x = torch.randn(1, 101)
        for rate in (0.73, 1.31):
            y_ref = ref.ResampleNearest(rates=(rate, rate)).apply_transform(x)
            assert y_ref.shape[-1] == math.ceil(101 * rate)


class TestSpeedPerturbation:
    @pytest.mark.parametrize("rate", [0.8, 0.9, 1.1, 1.37])
    @pytest.mark.parametrize("align", ["left", "right", "center"])
    def test_deterministic_aligns_exact(self, ref, rate, align):
        x = torch.randn(3, 96)
        sp = ref.SpeedPerturbation(
            rates=(rate, rate), target_length="same", align=align, p=1.0
        )
        y_ref = sp.apply_transform(x)
        y_jax = speed_perturb(
            jax.random.PRNGKey(0),
            jnp.asarray(x.numpy()),
            rates=(rate, rate),
            align=align,
        )
        assert y_jax.shape == tuple(y_ref.shape)
        np.testing.assert_array_equal(np.asarray(y_jax), y_ref.numpy())

    def test_random_align_is_shifted_window(self):
        """With align=random the output must equal one of the possible
        deterministic offsets."""
        x = jnp.asarray(np.random.RandomState(0).randn(64).astype("f4"))
        rate = 1.25
        L = math.ceil(64 * rate)
        r = resample_nearest(x, rate)
        candidates = {
            c: np.asarray(r[c : c + 64]) for c in range(L - 64 + 1)
        }
        for i in range(8):
            y = np.asarray(
                speed_perturb(
                    jax.random.PRNGKey(i), x, rates=(rate, rate),
                    align="random",
                )
            )
            assert any(
                np.array_equal(y, cand) for cand in candidates.values()
            )


class TestCutOutSpec:
    @pytest.mark.parametrize("seed", [0, 4, 9])
    def test_recorded_draws_match(self, ref, seed):
        t, f = 40, 32
        x = torch.randn(1, t, f)
        co = ref.CutOutSpec(
            freq_size_range=(0.1, 0.5),
            time_size_range=(0.1, 0.5),
            fill_value=-100.0,
            p=1.0,
        )
        torch.manual_seed(seed)
        y_ref = co(x.clone())
        # replay gen_range: freq slice first (cutoutspec.py:91-96), each
        # drawing size then start (cutoutspec.py:199-206)
        torch.manual_seed(seed)

        def replay(n, scales):
            smin = math.ceil(scales[0] * n)
            smax = max(math.ceil(scales[1] * n), smin + 1)
            size = int(torch.randint(smin, smax, ()).item())
            start = int(torch.randint(0, max(n - size + 1, 1), ()))
            return start, size

        f0, fw = replay(f, (0.1, 0.5))
        t0, tw = replay(t, (0.1, 0.5))
        ti = np.arange(t)[:, None]
        fi = np.arange(f)[None, :]
        inside = (ti >= t0) & (ti < t0 + tw) & (fi >= f0) & (fi < f0 + fw)
        expected = np.where(inside[None], -100.0, x.numpy())
        np.testing.assert_array_equal(expected, y_ref.numpy())

    def test_half_half_gives_exact_ceil(self, ref):
        """(0.5, 0.5) must cut exactly ceil(dim/2) — the reference's own
        gen_range docstring example (cutoutspec.py:163-166)."""
        t, f = 21, 10
        y = cutout_spec(
            jax.random.PRNGKey(0),
            jnp.zeros((4, t, f)) + 1.0,
            time_size_range=(0.5, 0.5),
            freq_size_range=(0.5, 0.5),
            fill_value=0.0,
        )
        cut = np.asarray(y == 0.0)
        for b in range(4):
            tb = cut[b].any(axis=1).sum()
            fb = cut[b].any(axis=0).sum()
            assert tb == math.ceil(t / 2) and fb == math.ceil(f / 2)
        # same property on the reference
        torch.manual_seed(0)
        co = ref.CutOutSpec(
            freq_size_range=(0.5, 0.5), time_size_range=(0.5, 0.5),
            fill_value=0.0,
        )
        yr = co(torch.ones(1, t, f))
        cutr = (yr == 0.0).numpy()[0]
        assert cutr.any(axis=1).sum() == math.ceil(t / 2)
        assert cutr.any(axis=0).sum() == math.ceil(f / 2)


class TestMixup:
    def test_pann_mixup_exact(self, ref):
        x = torch.randn(8, 5, 3)
        lam = torch.rand(8)
        y_ref = ref.pann_mixup(x, lam)
        y_jax = pann_mixup(jnp.asarray(x.numpy()), jnp.asarray(lam.numpy()))
        np.testing.assert_allclose(
            np.asarray(y_jax), y_ref.numpy(), rtol=1e-6, atol=1e-6
        )

    def test_sample_lambda_alpha_zero(self, ref):
        # reference mixup.py:46-50
        assert float(ref.sample_lambda(0.0, asymmetric=True)) == 1.0
        assert float(sample_lambda(jax.random.PRNGKey(0), 0.0, True)) == 1.0
        vals_ref = {
            float(ref.sample_lambda(0.0, asymmetric=False)) for _ in range(20)
        }
        vals_jax = {
            float(sample_lambda(jax.random.PRNGKey(i), 0.0, False))
            for i in range(20)
        }
        assert vals_ref <= {0.0, 1.0} and vals_jax <= {0.0, 1.0}
        assert len(vals_jax) == 2  # both outcomes occur

    def test_sample_lambda_asymmetric_range(self, ref):
        torch.manual_seed(0)
        for i in range(50):
            assert float(ref.sample_lambda(0.4, asymmetric=True)) >= 0.5
            assert (
                float(sample_lambda(jax.random.PRNGKey(i), 0.4, True)) >= 0.5
            )

    def test_mixup_class_formula(self, ref):
        """Replay the reference Mixup's draws (Beta sample + randperm,
        mixup.py:125-130) and check the mixing formula against them."""
        from torch.distributions.beta import Beta

        x = torch.randn(6, 4)
        y = torch.randn(6, 3)
        m = ref.Mixup(alpha=0.4, asymmetric=True, p=1.0)
        torch.manual_seed(2)
        xm, ym = m(x.clone(), y.clone())
        torch.manual_seed(2)
        lbd = Beta(torch.tensor(0.4), torch.tensor(0.4)).sample(())
        lbd = torch.max(lbd, 1.0 - lbd)
        idx = torch.randperm(6)
        np.testing.assert_allclose(
            xm.numpy(),
            (x * lbd + x[idx] * (1.0 - lbd)).numpy(),
            rtol=1e-6,
        )
        # our formula, same draws
        xj = jnp.asarray(x.numpy())
        ours = xj * float(lbd) + xj[jnp.asarray(idx.numpy())] * (
            1.0 - float(lbd)
        )
        np.testing.assert_allclose(
            np.asarray(ours), xm.numpy(), rtol=1e-5, atol=1e-6
        )
