"""ConvNeXt encoder golden tests vs a weight-matched torch twin.

The torch twin reproduces the reference architecture
(convnext.py:61-74,203-236,302-334) directly from torch primitives; our
NHWC JAX encoder must match it numerically with transferred weights.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from conette_tpu.models.convnext import (
    convnext_apply,
    convnext_block,
    convnext_init,
    frame_reduction_factor,
)
from conette_tpu.ops.frontend import LogMelConfig


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


class TorchBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.pw1 = tnn.Linear(dim, 4 * dim)
        self.pw2 = tnn.Linear(4 * dim, dim)
        self.scale = tnn.Parameter(torch.ones(dim))

    def forward(self, x):  # NCHW
        inp = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pw2(tF.gelu(self.pw1(x)))
        x = self.scale * x
        return inp + x.permute(0, 3, 1, 2)


def copy_block(tb: TorchBlock, bp):
    with torch.no_grad():
        tb.dwconv.weight.copy_(_t(bp["dwconv"]["weight"]).permute(3, 2, 0, 1))
        tb.dwconv.bias.copy_(_t(bp["dwconv"]["bias"]))
        tb.norm.weight.copy_(_t(bp["norm"]["weight"]))
        tb.norm.bias.copy_(_t(bp["norm"]["bias"]))
        tb.pw1.weight.copy_(_t(bp["pwconv1"]["weight"]).T)
        tb.pw1.bias.copy_(_t(bp["pwconv1"]["bias"]))
        tb.pw2.weight.copy_(_t(bp["pwconv2"]["weight"]).T)
        tb.pw2.bias.copy_(_t(bp["pwconv2"]["bias"]))
        tb.scale.copy_(_t(bp["scale"]))


@pytest.fixture(scope="module")
def small_params():
    # Tiny config for fast tests: depths (1,1,2,1), dims (8,16,32,64), 16 mels
    return convnext_init(
        jax.random.PRNGKey(0), depths=(1, 1, 2, 1), dims=(8, 16, 32, 64),
        num_classes=10, n_mels=32,
    )


def test_block_matches_torch(small_params):
    bp = small_params["stages"][2][0]
    dim = 32
    tb = TorchBlock(dim)
    copy_block(tb, bp)
    tb.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 4, dim)).astype(np.float32)  # NHWC
    ours = np.asarray(convnext_block(bp, jnp.asarray(x)))
    with torch.no_grad():
        ref = tb(_t(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_full_encoder_matches_torch_twin(small_params):
    """End-to-end (precomputed-mel input): bn0 → stem → stages → heads."""
    p = small_params
    dims = (8, 16, 32, 64)
    depths = (1, 1, 2, 1)
    n_mels = 32

    # --- torch twin
    bn0 = tnn.BatchNorm2d(n_mels)
    stem = tnn.Conv2d(1, dims[0], (4, 4), (4, 4), padding=(4, 0))
    stem_norm = tnn.LayerNorm(dims[0], eps=1e-6)
    downs = [
        (tnn.LayerNorm(dims[i], eps=1e-6), tnn.Conv2d(dims[i], dims[i + 1], 2, 2))
        for i in range(3)
    ]
    blocks = [[TorchBlock(dims[i]) for _ in range(depths[i])] for i in range(4)]
    final_norm = tnn.LayerNorm(dims[-1], eps=1e-6)
    head = tnn.Linear(dims[-1], 10)

    with torch.no_grad():
        rngs = np.random.default_rng(42)
        rm = rngs.standard_normal(n_mels).astype(np.float32)
        rv = rngs.uniform(0.5, 2.0, n_mels).astype(np.float32)
        bn0.running_mean.copy_(_t(rm))
        bn0.running_var.copy_(_t(rv))
        bn0.weight.copy_(_t(p["bn0"]["weight"]))
        bn0.bias.copy_(_t(p["bn0"]["bias"]))
        stem.weight.copy_(_t(p["stem"]["conv"]["weight"]).permute(3, 2, 0, 1))
        stem.bias.copy_(_t(p["stem"]["conv"]["bias"]))
        stem_norm.weight.copy_(_t(p["stem"]["norm"]["weight"]))
        stem_norm.bias.copy_(_t(p["stem"]["norm"]["bias"]))
        for i, (ln, cv) in enumerate(downs):
            ln.weight.copy_(_t(p["downsample"][i]["norm"]["weight"]))
            ln.bias.copy_(_t(p["downsample"][i]["norm"]["bias"]))
            cv.weight.copy_(_t(p["downsample"][i]["conv"]["weight"]).permute(3, 2, 0, 1))
            cv.bias.copy_(_t(p["downsample"][i]["conv"]["bias"]))
        for i in range(4):
            for j in range(depths[i]):
                copy_block(blocks[i][j], p["stages"][i][j])
        final_norm.weight.copy_(_t(p["norm"]["weight"]))
        final_norm.bias.copy_(_t(p["norm"]["bias"]))
        head.weight.copy_(_t(p["head_audioset"]["weight"]).T)
        head.bias.copy_(_t(p["head_audioset"]["bias"]))
    bn0.eval()

    # our params need the same bn0 running stats
    p = dict(p)
    p["bn0"] = dict(p["bn0"], running_mean=jnp.asarray(rm), running_var=jnp.asarray(rv))

    # --- inputs: (B, T=40, F=16) "mel"
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 40, n_mels)).astype(np.float32)
    lens = np.array([40, 28], np.int32)

    outs = convnext_apply(
        p,
        jnp.asarray(mel),
        jnp.asarray(lens),
        waveform_input=False,
    )

    with torch.no_grad():
        # reference pipeline: x (B,1,T,F) → transpose(1,3) bn0 transpose back
        x = _t(mel)[:, None]  # (B,1,T,F)
        x = bn0(x.transpose(1, 3)).transpose(1, 3)
        x = stem(x)
        x = stem_norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for i in range(4):
            if i > 0:
                ln, cv = downs[i - 1]
                x = ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = cv(x)
            for j in range(depths[i]):
                x = blocks[i][j](x)
        x = x.mean(dim=3)  # (B, C, T')
        frame_ref = x.numpy()
        x1 = x.max(dim=2).values
        x2 = x.mean(dim=2)
        clip = torch.sigmoid(head(final_norm(x1 + x2))).numpy()

    np.testing.assert_allclose(
        np.asarray(outs["frame_embs"]), frame_ref, atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs["clipwise_output"]), clip, atol=1e-5, rtol=1e-4
    )
    # frame lens: reduction = 40 // T'; T' = (40+8)//4 //2//2//2 = 12//8 = 1
    n_out = frame_ref.shape[-1]
    red = 40 // n_out
    np.testing.assert_array_equal(
        np.asarray(outs["frame_embs_lens"]), np.round(lens / red).astype(np.int32)
    )


def test_waveform_path_shapes():
    cfg = LogMelConfig()
    params = convnext_init(jax.random.PRNGKey(1))
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 320_000)), jnp.float32)
    outs = convnext_apply(params, wav, logmel_cfg=cfg)
    # 10 s @ 32 kHz → 1001 mel frames → stem (1001+8)//4=252 → 126 → 63 → 31
    assert outs["frame_embs"].shape == (1, 768, 31)
    assert outs["clipwise_output"].shape == (1, 527)
    assert int(outs["frame_embs_lens"][0]) == 31


def test_frame_reduction_factor_matches_forward():
    assert frame_reduction_factor(320_000) == 320_000 // 31
