"""Golden tests for the fused downsample-seam Pallas kernel (interpret
mode — runs on CPU): LN + Conv2d(k=2,s=2) vs the unfused XLA ops, on all
three ConvNeXt-Tiny seam geometries including odd T and padded F/C."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conette_tpu.models.layers import (
    conv2d,
    conv2d_init,
    layer_norm,
    layer_norm_init,
)
from conette_tpu.ops.pallas.convnext_block import pad_fc
from conette_tpu.ops.pallas.downsample import fused_downsample_padded


def _rel_err(want, got):
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    return np.max(np.abs(w - g)) / (np.max(np.abs(w)) + 1e-9)


# (T, f_real, C) per seam for a 10 s clip: s1->s2, s2->s3, s3->s4 (odd T)
SEAMS = [(20, 56, 96), (16, 28, 192), (15, 14, 384)]


@pytest.mark.parametrize("t,f,c", SEAMS)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_downsample_interpret(t, f, c, dtype):
    key = jax.random.PRNGKey(t + c)
    ln = layer_norm_init(c)
    # non-trivial affine so LN params matter
    ln = {
        "weight": ln["weight"] + 0.1 * jax.random.normal(key, (c,)),
        "bias": 0.05 * jax.random.normal(jax.random.fold_in(key, 1), (c,)),
    }
    conv = conv2d_init(jax.random.fold_in(key, 2), c, 2 * c, (2, 2), init="torch")

    x = (
        jax.random.normal(jax.random.fold_in(key, 3), (2, t, f, c)) * 0.5
    ).astype(dtype)

    want = conv2d(conv, layer_norm(ln, x, eps=1e-6), stride=(2, 2))

    got_padded = fused_downsample_padded(
        pad_fc(x), f, c,
        ln["weight"], ln["bias"], conv["weight"], conv["bias"],
        eps=1e-6, interpret=True,
    )
    f2, c2 = f // 2, 2 * c
    got = got_padded[:, :, :f2, :c2]
    assert got_padded.shape[1] == t // 2
    assert want.shape == got.shape
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    assert _rel_err(want, got) < tol
    # padded freq columns and channel lanes must be exactly zero so the
    # next stage's fused blocks can chain on the padded layout
    if got_padded.shape[2] > f2:
        assert float(jnp.max(jnp.abs(got_padded[:, :, f2:, :]))) == 0.0
    if got_padded.shape[3] > c2:
        assert float(jnp.max(jnp.abs(got_padded[:, :, :, c2:]))) == 0.0


def test_fused_downsample_rejects_bad_layout():
    x = jnp.zeros((1, 8, 30, 128), jnp.float32)  # F not 8-aligned
    with pytest.raises(ValueError, match="stage-padded"):
        fused_downsample_padded(
            x, 30, 96,
            jnp.ones((96,)), jnp.zeros((96,)),
            jnp.zeros((2, 2, 96, 192)), jnp.zeros((192,)),
            interpret=True,
        )
