"""Fused Pallas log-mel kernel vs the jnp reference path (interpret mode on
CPU; the compiled kernel runs in bench.py on the real chip)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conette_tpu.ops.frontend import DEFAULT_LOGMEL, LogMelConfig, logmel_spectrogram
from conette_tpu.ops.pallas.logmel import fused_logmel

pytestmark = pytest.mark.slow  # heavy compiles / e2e; deselect with -m 'not slow'


def test_matches_jnp_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32_000)).astype(np.float32) * 0.1)
    ref = np.asarray(logmel_spectrogram(x))
    fused = np.asarray(fused_logmel(x, interpret=True))
    assert fused.shape == ref.shape
    np.testing.assert_allclose(fused, ref, atol=2e-3, rtol=1e-4)


def test_bn_affine_epilogue():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16_000)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, 224).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal(224).astype(np.float32))
    ref = np.asarray(logmel_spectrogram(x)) * np.asarray(scale) + np.asarray(shift)
    fused = np.asarray(fused_logmel(x, bn_scale=scale, bn_shift=shift, interpret=True))
    np.testing.assert_allclose(fused, ref, atol=2e-3, rtol=1e-4)


def test_silence_floor():
    x = jnp.zeros((1, 16_000), jnp.float32)
    out = np.asarray(fused_logmel(x, interpret=True))
    np.testing.assert_allclose(out, -100.0, atol=1e-4)
