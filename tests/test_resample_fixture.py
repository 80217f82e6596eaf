"""Resample goldens: recorded-torchaudio fixture (gated) + independent
float64 direct-sum oracle (always runs).

The reference resamples with ``torchaudio.functional.resample`` (default
``sinc_interp_hann``; ``/root/reference/src/conette/huggingface/
preprocessor.py:134-141``). The repo's ``ops/resample.py`` reimplements that
math as a polyphase MXU conv, and ``tests/reference_shim.py`` substitutes it
on the *reference* side of HF-parity tests too — so this file is the only
place a divergence from real torchaudio can surface:

* when ``tests/data/resample/resample_fixtures.npz`` exists (recorded once
  on a connected host via ``scripts/gen_resample_fixture.py``), every
  (signal × rate pair) is asserted ≤1e-4 vs the real torchaudio output;
* always: a brute-force float64 direct-sum sinc oracle — independent of the
  polyphase restructuring, padding, and striding — pins both the numpy and
  the JAX resampler on every rate pair.
"""

import math
import os
import sys

import numpy as np
import pytest

from conette_tpu.ops.resample import resample, resample_numpy, resampled_length

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from gen_resample_fixture import RATE_PAIRS, SIGNAL_SPECS, make_signals  # noqa: E402

FIXTURE = os.path.join(
    os.path.dirname(__file__), "data", "resample", "resample_fixtures.npz"
)


def _direct_resample(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Brute-force float64 windowed-sinc resample (torchaudio's published
    sinc_interp_hann math, lowpass_filter_width=6, rolloff=0.99) — one
    explicit sum per output sample, no polyphase/stride/pad tricks."""
    L, rolloff = 6, 0.99
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    base = min(orig, new) * rolloff  # cutoff in units of input rate / orig
    n = len(x)
    m = np.arange(n, dtype=np.float64)
    out = np.empty(resampled_length(n, orig_freq, new_freq), np.float64)
    xf = x.astype(np.float64)
    for j in range(len(out)):
        tau = (m - j * orig / new) * (base / orig)  # in lobe units / L
        keep = np.abs(tau) < L
        t = tau[keep]
        window = np.cos(t * np.pi / (2.0 * L)) ** 2
        tp = t * np.pi
        sinc = np.where(tp == 0.0, 1.0, np.sin(tp) / np.where(tp == 0.0, 1.0, tp))
        out[j] = float(np.dot(xf[keep], sinc * window)) * (base / orig)
    return out


@pytest.mark.parametrize("orig,new", RATE_PAIRS)
def test_polyphase_matches_direct_sum_oracle(orig, new):
    rng = np.random.default_rng(orig + new)
    x = (rng.standard_normal(4_001) * 0.4).astype(np.float32)
    want = _direct_resample(x, orig, new)
    got_np = resample_numpy(x[None], orig, new)[0]
    assert got_np.shape == want.shape
    np.testing.assert_allclose(got_np, want, atol=2e-5)
    got_jax = np.asarray(resample(x[None], orig, new))[0]
    np.testing.assert_allclose(got_jax, want, atol=2e-5)


def test_direct_sum_oracle_identity_when_rates_equal():
    x = np.sin(np.linspace(0, 20, 500)).astype(np.float32)
    assert (resample_numpy(x[None], 32_000, 32_000) == x[None]).all()


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="torchaudio fixture not staged (scripts/gen_resample_fixture.py)")
@pytest.mark.parametrize("orig,new", RATE_PAIRS)
@pytest.mark.parametrize("name", [s[0] for s in SIGNAL_SPECS])
def test_matches_recorded_torchaudio(name, orig, new):
    z = np.load(FIXTURE)
    x = z[f"in_{name}"]
    want = z[f"out_{name}_{orig}_{new}"]
    got = resample_numpy(x[None], orig, new)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)
    got_jax = np.asarray(resample(x[None], orig, new))[0]
    np.testing.assert_allclose(got_jax, want, atol=1e-4)


def test_fixture_inputs_are_reproducible():
    """The generator's signals must never drift, or a re-recorded fixture
    would silently test different inputs."""
    sigs = make_signals()
    assert [k for k in sigs] == [s[0] for s in SIGNAL_SPECS]
    # pin a few values so a generator edit is loud
    np.testing.assert_allclose(float(sigs["impulse"][500]), 1.0)
    assert abs(float(sigs["noise"][:100].sum())) > 0.0
    digest = float(np.abs(sigs["noise"]).sum()) + float(np.abs(sigs["tones"]).sum())
    assert digest == pytest.approx(digest)  # finite
    if os.path.exists(FIXTURE):
        z = np.load(FIXTURE)
        for name, x in sigs.items():
            np.testing.assert_array_equal(z[f"in_{name}"], x)
