"""Fused dwconv7x7+LayerNorm Pallas kernel vs the unfused XLA path.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel is
compiled for real on TPU (opt-in via convnext_apply(use_fused_dwconv_ln=
True); see PROFILE.md for the perf story)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conette_tpu.models.layers import (
    conv2d,
    conv2d_init,
    layer_norm,
    layer_norm_init,
)
from conette_tpu.ops.pallas.dwconv_ln import fused_dwconv7x7_ln

pytestmark = pytest.mark.slow


@pytest.mark.parametrize(
    "t,f,c",
    [(16, 14, 96), (14, 7, 384)],  # unaligned F + C-padding and aligned-C cases
)
def test_fused_matches_unfused(t, f, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, f, c)).astype(np.float32) * 0.5)
    p = conv2d_init(jax.random.PRNGKey(1), c, c, (7, 7), groups=c, init="torch")
    ln = layer_norm_init(c)

    want = layer_norm(
        ln, conv2d(p, x, padding=((3, 3), (3, 3)), groups=c), eps=1e-6
    )
    got = fused_dwconv7x7_ln(
        x, p["weight"], p["bias"], ln["weight"], ln["bias"],
        eps=1e-6, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )
