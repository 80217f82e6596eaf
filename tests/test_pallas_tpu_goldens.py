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


def test_fused_dwconv_ln_compiled():
    from conette_tpu.models.layers import (
        conv2d,
        conv2d_init,
        layer_norm,
        layer_norm_init,
    )
    from conette_tpu.ops.pallas.dwconv_ln import fused_dwconv7x7_ln

    rng = np.random.default_rng(0)
    t, f, c = 16, 14, 96
    x = jnp.asarray(rng.standard_normal((2, t, f, c)).astype(np.float32) * 0.5)
    p = conv2d_init(jax.random.PRNGKey(1), c, c, (7, 7), groups=c, init="torch")
    ln = layer_norm_init(c)
    want = layer_norm(
        ln, conv2d(p, x, padding=((3, 3), (3, 3)), groups=c), eps=1e-6
    )
    got = fused_dwconv7x7_ln(
        x, p["weight"], p["bias"], ln["weight"], ln["bias"], eps=1e-6
    )
    assert _rel_err(want, got) < 5e-3


def test_fused_logmel_compiled():
    from conette_tpu.ops.frontend import logmel_spectrogram
    from conette_tpu.ops.pallas.logmel import fused_logmel

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
    got = np.asarray(fused_logmel(x))
    want = np.asarray(logmel_spectrogram(x))
    assert np.abs(got - want).max() < 5e-3
