"""Numerical torch goldens for the round-2 zoo building blocks.

Independent torch twins (built from the reference structure descriptions,
``nn/pann_utils/models.py``) are fed converted weights and compared against
the JAX blocks — the same methodology as the round-1 ConvBlock/decoder
goldens, extended to the ResNet 2d basic block, the Res1dNet wav1d block,
and the wavegram ConvPreWavBlock."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from conette_tpu.models.pann_zoo import (
    _basic_block,
    _basic_block_init,
    _pre_wav_block,
    _pre_wav_block_init,
    _wav1d_block,
    _wav1d_block_init,
)

pytestmark = pytest.mark.slow


def _copy_bn(bn: tnn.Module, p: dict) -> None:
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(p["weight"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(p["running_mean"])))
        bn.running_var.copy_(torch.from_numpy(np.asarray(p["running_var"])))


def _conv2d_from(p: dict, stride=1, padding=0, bias=False) -> tnn.Conv2d:
    w = np.asarray(p["weight"])  # HWIO
    o, i = w.shape[3], w.shape[2]
    conv = tnn.Conv2d(i, o, w.shape[0], stride=stride, padding=padding, bias=bias)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w).permute(3, 2, 0, 1))
        if bias:
            conv.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    return conv


def _conv1d_from(p: dict, padding=0, dilation=1) -> tnn.Conv1d:
    w = np.asarray(p["weight"])  # WIO (k, in, out)
    k, i, o = w.shape
    conv = tnn.Conv1d(i, o, k, padding=padding, dilation=dilation, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w).permute(2, 1, 0))
    return conv


def test_resnet_basic_block_matches_torch():
    """PANN _ResnetBasicBlock (models.py:736-805): pre-avgpool stride 2,
    two 3x3 convs, zero-init residual BN, avgpool+conv+bn downsample."""
    rng = np.random.default_rng(0)
    p = _basic_block_init(jax.random.PRNGKey(0), 32, 64, stride=2)
    # randomize BN stats so inference BN is non-trivial
    for bn_key in ("bn1", "bn2"):
        p[bn_key]["running_mean"] = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
        p[bn_key]["running_var"] = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    p["downsample"]["bn"]["running_mean"] = jnp.asarray(
        rng.standard_normal(64).astype(np.float32) * 0.1
    )
    x = rng.standard_normal((2, 16, 12, 32)).astype(np.float32)

    got = np.asarray(_basic_block(p, jnp.asarray(x), deterministic=True))

    conv1 = _conv2d_from(p["conv1"], padding=1, bias=True)
    conv2 = _conv2d_from(p["conv2"], padding=1, bias=True)
    bn1, bn2, bnd = tnn.BatchNorm2d(64), tnn.BatchNorm2d(64), tnn.BatchNorm2d(64)
    _copy_bn(bn1, p["bn1"]); _copy_bn(bn2, p["bn2"]); _copy_bn(bnd, p["downsample"]["bn"])
    convd = _conv2d_from(p["downsample"]["conv"], bias=True)
    for m in (conv1, conv2, convd, bn1, bn2, bnd):
        m.eval()
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        out = torch.nn.functional.avg_pool2d(xt, 2)
        out = torch.relu(bn1(conv1(out)))
        out = bn2(conv2(out))
        identity = bnd(convd(torch.nn.functional.avg_pool2d(xt, 2)))
        want = torch.relu(out + identity).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_wav1d_block_matches_torch():
    """_ResnetBasicBlockWav1d (models.py:2404-2470): maxpool stride, conv k3
    d1 then k3 d2, zero-init bn2, avgpool+conv1x1+bn downsample."""
    rng = np.random.default_rng(1)
    p = _wav1d_block_init(jax.random.PRNGKey(1), 16, 32, stride=4)
    p["bn1"]["running_mean"] = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.1)
    p["bn2"]["weight"] = jnp.asarray(rng.uniform(0.5, 1.5, 32).astype(np.float32))
    x = rng.standard_normal((2, 64, 16)).astype(np.float32)

    got = np.asarray(_wav1d_block(p, jnp.asarray(x), deterministic=True))

    conv1 = _conv1d_from(p["conv1"], padding=1)
    conv2 = _conv1d_from(p["conv2"], padding=2, dilation=2)
    convd = _conv1d_from(p["downsample"]["conv"])
    bn1, bn2, bnd = tnn.BatchNorm1d(32), tnn.BatchNorm1d(32), tnn.BatchNorm1d(32)
    _copy_bn(bn1, p["bn1"]); _copy_bn(bn2, p["bn2"]); _copy_bn(bnd, p["downsample"]["bn"])
    for m in (conv1, conv2, convd, bn1, bn2, bnd):
        m.eval()
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 2, 1)  # NCW
        out = torch.nn.functional.max_pool1d(xt, kernel_size=4)
        out = torch.relu(bn1(conv1(out)))
        out = bn2(conv2(out))
        identity = bnd(convd(torch.nn.functional.avg_pool1d(xt, kernel_size=4)))
        want = torch.relu(out + identity).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pre_wav_block_matches_torch():
    """ConvPreWavBlock (models.py:2700-2740): conv k3 p1 -> bn -> relu ->
    conv k3 d2 p2 -> bn -> relu -> maxpool."""
    rng = np.random.default_rng(2)
    p = _pre_wav_block_init(jax.random.PRNGKey(2), 8, 16)
    p["bn1"]["running_var"] = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    x = rng.standard_normal((2, 64, 8)).astype(np.float32)

    got = np.asarray(_pre_wav_block(p, jnp.asarray(x), pool=4, deterministic=True))

    conv1 = _conv1d_from(p["conv1"], padding=1)
    conv2 = _conv1d_from(p["conv2"], padding=2, dilation=2)
    bn1, bn2 = tnn.BatchNorm1d(16), tnn.BatchNorm1d(16)
    _copy_bn(bn1, p["bn1"]); _copy_bn(bn2, p["bn2"])
    for m in (conv1, conv2, bn1, bn2):
        m.eval()
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 2, 1)
        y = torch.relu(bn1(conv1(xt)))
        y = torch.relu(bn2(conv2(y)))
        want = torch.nn.functional.max_pool1d(y, 4).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
