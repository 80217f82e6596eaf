"""On-device (Mosaic-compiled) Pallas kernel goldens — VERDICT r2 weak #4.

The interpret-mode suites (``test_pallas_convnext_block.py`` etc.) prove
the kernel MATH; these re-run the same comparisons with the kernels
actually LOWERED THROUGH MOSAIC on a real TPU, so lowering regressions
(layout, DMA alignment, VMEM acceptance) are caught by
``CONETTE_TESTS_TPU=1 python -m pytest -m tpu`` instead of only the manual
verify recipe / driver bench.

Auto-skipped off-TPU (see ``conftest.pytest_collection_modifyitems``).
First compile per geometry is 1-6 min cold; the persistent compilation
cache (``.jax_cache``) makes re-runs fast — it is enabled here exactly as
in the CLI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.tpu, pytest.mark.slow]


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() not in ("tpu",):
        pytest.skip(f"needs a TPU backend, have {jax.default_backend()!r}")
    from conette_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 24, 56, 96),   # stage-1 geometry
        (2, 12, 28, 192),  # stage-2
        (1, 30, 14, 384),  # stage-3
        (1, 17, 7, 768),   # stage-4 (MLP row chunking)
        (2, 126, 8, 128),  # multi-tile time path (edge shifts)
    ],
)
def test_fused_block_compiled_matches_unfused(shape):
    from conette_tpu.models.convnext import LN_EPS, convnext_block
    from test_pallas_convnext_block import make_block, run_fused

    b, t, f, c = shape
    key = jax.random.PRNGKey(c + t)
    p = make_block(key, c)
    x = (jax.random.normal(jax.random.fold_in(key, 1), shape) * 0.5).astype(
        jnp.bfloat16
    )
    got = run_fused(x, p, interpret=False)
    want = convnext_block(p, x)
    assert _rel_err(want, got) < 0.02


@pytest.mark.parametrize("t,f,c", [(20, 56, 96), (16, 28, 192), (15, 14, 384)])
def test_fused_downsample_compiled(t, f, c):
    """Mosaic-lowered LN+conv2x2s2 seam kernel vs the unfused XLA ops (the
    interpret twin lives in test_pallas_downsample.py)."""
    from conette_tpu.models.layers import (
        conv2d,
        conv2d_init,
        layer_norm,
        layer_norm_init,
    )
    from conette_tpu.ops.pallas.convnext_block import pad_fc
    from conette_tpu.ops.pallas.downsample import fused_downsample_padded

    key = jax.random.PRNGKey(t + c)
    ln = layer_norm_init(c)
    conv = conv2d_init(jax.random.fold_in(key, 2), c, 2 * c, (2, 2), init="torch")
    x = (
        jax.random.normal(jax.random.fold_in(key, 3), (2, t, f, c)) * 0.5
    ).astype(jnp.bfloat16)
    want = conv2d(conv, layer_norm(ln, x, eps=1e-6), stride=(2, 2))
    got = fused_downsample_padded(
        pad_fc(x), f, c,
        ln["weight"], ln["bias"], conv["weight"], conv["bias"],
        eps=1e-6, interpret=False,
    )[:, :, : f // 2, : 2 * c]
    assert _rel_err(want, got) < 2e-2


def test_fused_logmel_compiled():
    from conette_tpu.ops.frontend import logmel_spectrogram
    from conette_tpu.ops.pallas.logmel import fused_logmel

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
    got = np.asarray(fused_logmel(x))
    want = np.asarray(logmel_spectrogram(x))
    assert np.abs(got - want).max() < 5e-3
