"""PANN torch->JAX converter tests.

Synthetic torch state dicts with the reference's exact key naming
(``nn/pann_utils/models.py``) are converted and shape-audited against the
matching ``*_init`` pytrees; the Cnn14 conversion is additionally
golden-tested numerically against an independently-built torch twin of the
post-frontend body (``nn/encoders/cnn14.py:92-216`` structure).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax

from conette_tpu.huggingface.convert_pann import convert_pann
from conette_tpu.models.pann import apply_pann_model, pann_apply

pytestmark = pytest.mark.slow  # heavy compiles / e2e; deselect with -m 'not slow'


def _bn_sd(prefix, dim, rng):
    return {
        f"{prefix}.weight": rng.uniform(0.5, 1.5, dim).astype(np.float32),
        f"{prefix}.bias": rng.standard_normal(dim).astype(np.float32) * 0.1,
        f"{prefix}.running_mean": rng.standard_normal(dim).astype(np.float32) * 0.1,
        f"{prefix}.running_var": rng.uniform(0.5, 1.5, dim).astype(np.float32),
        f"{prefix}.num_batches_tracked": np.asarray(100),
    }


def _conv2d_sd(prefix, i, o, k, rng):
    return {f"{prefix}.weight": rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05}


def _conv1d_sd(prefix, i, o, k, rng):
    return {f"{prefix}.weight": rng.standard_normal((o, i, k)).astype(np.float32) * 0.05}


def _linear_sd(prefix, i, o, rng):
    return {
        f"{prefix}.weight": rng.standard_normal((o, i)).astype(np.float32) * 0.05,
        f"{prefix}.bias": rng.standard_normal(o).astype(np.float32) * 0.05,
    }


def _conv_block_sd(prefix, i, o, rng):
    sd = _conv2d_sd(f"{prefix}.conv1", i, o, 3, rng)
    sd |= _bn_sd(f"{prefix}.bn1", o, rng)
    sd |= _conv2d_sd(f"{prefix}.conv2", o, o, 3, rng)
    sd |= _bn_sd(f"{prefix}.bn2", o, rng)
    return sd


def _pre_wav_block_sd(prefix, i, o, rng):
    sd = _conv1d_sd(f"{prefix}.conv1", i, o, 3, rng)
    sd |= _bn_sd(f"{prefix}.bn1", o, rng)
    sd |= _conv1d_sd(f"{prefix}.conv2", o, o, 3, rng)
    sd |= _bn_sd(f"{prefix}.bn2", o, rng)
    return sd


def _cnn14_sd(rng, att=False):
    sd = _bn_sd("bn0", 64, rng)
    chans = [(1, 64), (64, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
    for bi, (i, o) in enumerate(chans, 1):
        sd |= _conv_block_sd(f"conv_block{bi}", i, o, rng)
    sd |= _linear_sd("fc1", 2048, 2048, rng)
    if att:
        sd |= _conv1d_sd("att_block.att", 2048, 527, 1, rng)
        sd["att_block.att.bias"] = rng.standard_normal(527).astype(np.float32) * 0.05
        sd |= _conv1d_sd("att_block.cla", 2048, 527, 1, rng)
        sd["att_block.cla.bias"] = rng.standard_normal(527).astype(np.float32) * 0.05
        sd |= _bn_sd("att_block.bn_att", 527, rng)
    else:
        sd |= _linear_sd("fc_audioset", 2048, 527, rng)
    # frontend buffers the converter must skip
    sd["spectrogram_extractor.stft.conv_real.weight"] = rng.standard_normal(
        (513, 1, 1024)
    ).astype(np.float32)
    sd["logmel_extractor.melW"] = rng.standard_normal((513, 64)).astype(np.float32)
    return sd


def _cnn10_sd(rng):
    sd = _bn_sd("bn0", 64, rng)
    for bi, (i, o) in enumerate([(1, 64), (64, 128), (128, 256), (256, 512)], 1):
        sd |= _conv_block_sd(f"conv_block{bi}", i, o, rng)
    sd |= _linear_sd("fc1", 512, 512, rng)
    sd |= _linear_sd("fc_audioset", 512, 527, rng)
    return sd


def _cnn6_sd(rng):
    sd = _bn_sd("bn0", 64, rng)
    for bi, (i, o) in enumerate([(1, 64), (64, 128), (128, 256), (256, 512)], 1):
        sd |= _conv2d_sd(f"conv_block{bi}.conv1", i, o, 5, rng)
        sd |= _bn_sd(f"conv_block{bi}.bn1", o, rng)
    sd |= _linear_sd("fc1", 512, 512, rng)
    sd |= _linear_sd("fc_audioset", 512, 527, rng)
    return sd


def _resnet_sd(rng, depths, bottleneck):
    sd = _bn_sd("bn0", 64, rng)
    sd |= _conv_block_sd("conv_block1", 1, 64, rng)
    inplanes = 64
    expansion = 4 if bottleneck else 1
    for li, (blocks, stride) in enumerate(zip(depths, (1, 2, 2, 2)), 1):
        planes = (64, 128, 256, 512)[li - 1]
        for bi in range(blocks):
            p = f"resnet.layer{li}.{bi}"
            s = stride if bi == 0 else 1
            if bottleneck:
                sd |= _conv2d_sd(f"{p}.conv1", inplanes, planes, 1, rng)
                sd |= _bn_sd(f"{p}.bn1", planes, rng)
                sd |= _conv2d_sd(f"{p}.conv2", planes, planes, 3, rng)
                sd |= _bn_sd(f"{p}.bn2", planes, rng)
                sd |= _conv2d_sd(f"{p}.conv3", planes, planes * 4, 1, rng)
                sd |= _bn_sd(f"{p}.bn3", planes * 4, rng)
            else:
                sd |= _conv2d_sd(f"{p}.conv1", inplanes, planes, 3, rng)
                sd |= _bn_sd(f"{p}.bn1", planes, rng)
                sd |= _conv2d_sd(f"{p}.conv2", planes, planes, 3, rng)
                sd |= _bn_sd(f"{p}.bn2", planes, rng)
            if bi == 0 and (s != 1 or inplanes != planes * expansion):
                if s == 1:
                    sd |= _conv2d_sd(f"{p}.downsample.0", inplanes, planes * expansion, 1, rng)
                    sd |= _bn_sd(f"{p}.downsample.1", planes * expansion, rng)
                else:
                    sd |= _conv2d_sd(f"{p}.downsample.1", inplanes, planes * expansion, 1, rng)
                    sd |= _bn_sd(f"{p}.downsample.2", planes * expansion, rng)
            inplanes = planes * expansion
    # every reference ResNet has conv_block_after1 after the resnet stages
    # (2048-in for the bottleneck ResNet54, 512-in for ResNet22/38)
    sd |= _conv_block_sd("conv_block_after1", 2048 if bottleneck else 512, 2048, rng)
    sd |= _linear_sd("fc1", 2048, 2048, rng)
    sd |= _linear_sd("fc_audioset", 2048, 527, rng)
    return sd


def _wavegram_sd(rng, logmel):
    sd = _conv1d_sd("pre_conv0", 1, 64, 11, rng)
    sd |= _bn_sd("pre_bn0", 64, rng)
    sd |= _pre_wav_block_sd("pre_block1", 64, 64, rng)
    sd |= _pre_wav_block_sd("pre_block2", 64, 128, rng)
    sd |= _pre_wav_block_sd("pre_block3", 128, 128, rng)
    sd |= _conv_block_sd("pre_block4", 4, 64, rng)
    sd |= _bn_sd("bn0", 64, rng)
    if logmel:
        chans = [(1, 64), (128, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
    else:
        chans = [(1, 64), (64, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
    for bi, (i, o) in enumerate(chans, 1):
        sd |= _conv_block_sd(f"conv_block{bi}", i, o, rng)
    sd |= _linear_sd("fc1", 2048, 2048, rng)
    sd |= _linear_sd("fc_audioset", 2048, 527, rng)
    return sd


def _mobilenetv1_sd(rng):
    sd = _bn_sd("bn0", 64, rng)
    spec = [("bn", 1, 32), ("dw", 32, 64), ("dw", 64, 128), ("dw", 128, 128),
            ("dw", 128, 256), ("dw", 256, 256), ("dw", 256, 512),
            ("dw", 512, 512), ("dw", 512, 512), ("dw", 512, 512),
            ("dw", 512, 512), ("dw", 512, 512), ("dw", 512, 1024),
            ("dw", 1024, 1024)]
    for fi, (kind, i, o) in enumerate(spec):
        if kind == "bn":
            sd |= _conv2d_sd(f"features.{fi}.0", i, o, 3, rng)
            sd |= _bn_sd(f"features.{fi}.2", o, rng)
        else:
            sd[f"features.{fi}.0.weight"] = rng.standard_normal(
                (i, 1, 3, 3)
            ).astype(np.float32) * 0.05  # depthwise: groups=i
            sd |= _bn_sd(f"features.{fi}.2", i, rng)
            sd |= _conv2d_sd(f"features.{fi}.4", i, o, 1, rng)
            sd |= _bn_sd(f"features.{fi}.5", o, rng)
    sd |= _linear_sd("fc1", 1024, 1024, rng)
    sd |= _linear_sd("fc_audioset", 1024, 527, rng)
    return sd


def _mobilenetv2_sd(rng):
    from conette_tpu.models.pann_zoo import _MBV2_SETTING

    sd = _bn_sd("bn0", 64, rng)
    sd |= _conv2d_sd("features.0.0", 1, 32, 3, rng)
    sd |= _bn_sd("features.0.2", 32, rng)
    inp, idx = 32, 1
    for t, c, n, s in _MBV2_SETTING:
        for i in range(n):
            base = f"features.{idx}.conv"
            hidden = round(inp * t)
            if t == 1:
                sd[f"{base}.0.weight"] = rng.standard_normal(
                    (hidden, 1, 3, 3)
                ).astype(np.float32) * 0.05
                sd |= _bn_sd(f"{base}.2", hidden, rng)
                sd |= _conv2d_sd(f"{base}.4", hidden, c, 1, rng)
                sd |= _bn_sd(f"{base}.5", c, rng)
            else:
                sd |= _conv2d_sd(f"{base}.0", inp, hidden, 1, rng)
                sd |= _bn_sd(f"{base}.1", hidden, rng)
                sd[f"{base}.3.weight"] = rng.standard_normal(
                    (hidden, 1, 3, 3)
                ).astype(np.float32) * 0.05
                sd |= _bn_sd(f"{base}.5", hidden, rng)
                sd |= _conv2d_sd(f"{base}.7", hidden, c, 1, rng)
                sd |= _bn_sd(f"{base}.8", c, rng)
            inp = c
            idx += 1
    sd |= _conv2d_sd(f"features.{idx}.0", 320, 1280, 1, rng)
    sd |= _bn_sd(f"features.{idx}.1", 1280, rng)
    sd |= _linear_sd("fc1", 1280, 1024, rng)
    sd |= _linear_sd("fc_audioset", 1024, 527, rng)
    return sd


_GENERATORS = {
    "cnn10": _cnn10_sd,
    "cnn14": _cnn14_sd,
    "cnn14_decisionlevelatt": lambda rng: _cnn14_sd(rng, att=True),
    "cnn6": _cnn6_sd,
    "resnet22": lambda rng: _resnet_sd(rng, (2, 2, 2, 2), False),
    "resnet38": lambda rng: _resnet_sd(rng, (3, 4, 6, 3), False),
    "resnet54": lambda rng: _resnet_sd(rng, (3, 4, 6, 3), True),
    "wavegram_cnn14": lambda rng: _wavegram_sd(rng, False),
    "wavegram_logmel_cnn14": lambda rng: _wavegram_sd(rng, True),
    "mobilenetv1": _mobilenetv1_sd,
    "mobilenetv2": _mobilenetv2_sd,
}


@pytest.mark.parametrize("arch", sorted(_GENERATORS))
def test_convert_and_apply(arch):
    """Reference-named synthetic state dict → convert (internal shape audit
    vs the init pytree) → forward runs finite."""
    rng = np.random.default_rng(0)
    sd = _GENERATORS[arch](rng)
    params = convert_pann(sd, arch)
    wav = np.random.default_rng(1).standard_normal((1, 32000)).astype(np.float32) * 0.1
    out = apply_pann_model(arch, params, wav)
    assert np.isfinite(np.asarray(out["clipwise_output"])).all()
    assert np.isfinite(np.asarray(out["frame_embs"])).all()


def test_convert_unknown_arch_raises():
    with pytest.raises(ValueError, match="No PANN converter"):
        convert_pann({}, "NotAModel")


def test_convert_shape_drift_raises():
    """A state dict with wrong tensor shapes must fail the shape audit."""
    rng = np.random.default_rng(0)
    sd = _cnn10_sd(rng)
    sd["fc1.weight"] = rng.standard_normal((7, 512)).astype(np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_pann(sd, "cnn10")


class _TorchCnn14Body(tnn.Module):
    """Independent torch twin of the Cnn14 post-frontend body
    (structure per nn/encoders/cnn14.py:92-216) used as the numerical
    oracle for the converted weights."""

    def __init__(self, sd):
        super().__init__()
        chans = [(1, 64), (64, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
        self.bn0 = tnn.BatchNorm2d(64)
        self.blocks = tnn.ModuleList()
        for bi, (i, o) in enumerate(chans, 1):
            conv1 = tnn.Conv2d(i, o, 3, padding=1, bias=False)
            conv2 = tnn.Conv2d(o, o, 3, padding=1, bias=False)
            bn1, bn2 = tnn.BatchNorm2d(o), tnn.BatchNorm2d(o)
            with torch.no_grad():
                conv1.weight.copy_(torch.from_numpy(sd[f"conv_block{bi}.conv1.weight"]))
                conv2.weight.copy_(torch.from_numpy(sd[f"conv_block{bi}.conv2.weight"]))
                for bn, p in ((bn1, f"conv_block{bi}.bn1"), (bn2, f"conv_block{bi}.bn2")):
                    bn.weight.copy_(torch.from_numpy(sd[f"{p}.weight"]))
                    bn.bias.copy_(torch.from_numpy(sd[f"{p}.bias"]))
                    bn.running_mean.copy_(torch.from_numpy(sd[f"{p}.running_mean"]))
                    bn.running_var.copy_(torch.from_numpy(sd[f"{p}.running_var"]))
            self.blocks.append(tnn.ModuleDict(
                {"conv1": conv1, "bn1": bn1, "conv2": conv2, "bn2": bn2}
            ))
        self.fc1 = tnn.Linear(2048, 2048)
        self.fc_audioset = tnn.Linear(2048, 527)
        with torch.no_grad():
            self.bn0.weight.copy_(torch.from_numpy(sd["bn0.weight"]))
            self.bn0.bias.copy_(torch.from_numpy(sd["bn0.bias"]))
            self.bn0.running_mean.copy_(torch.from_numpy(sd["bn0.running_mean"]))
            self.bn0.running_var.copy_(torch.from_numpy(sd["bn0.running_var"]))
            self.fc1.weight.copy_(torch.from_numpy(sd["fc1.weight"]))
            self.fc1.bias.copy_(torch.from_numpy(sd["fc1.bias"]))
            self.fc_audioset.weight.copy_(torch.from_numpy(sd["fc_audioset.weight"]))
            self.fc_audioset.bias.copy_(torch.from_numpy(sd["fc_audioset.bias"]))
        self.eval()

    def forward(self, mel):  # mel: (B, T, 64)
        x = mel[:, None]  # (B, 1, T, F)
        x = x.transpose(1, 3)
        x = self.bn0(x)
        x = x.transpose(1, 3)
        for bi, blk in enumerate(self.blocks):
            x = torch.relu(blk["bn1"](blk["conv1"](x)))
            x = torch.relu(blk["bn2"](blk["conv2"](x)))
            pool = (1, 1) if bi == len(self.blocks) - 1 else (2, 2)
            if pool != (1, 1):
                x = torch.nn.functional.avg_pool2d(x, pool)
        x = torch.mean(x, dim=3)  # mean over mel -> (B, C, T')
        h = torch.amax(x, dim=2) + torch.mean(x, dim=2)
        h = torch.relu(self.fc1(h))
        clip = torch.sigmoid(self.fc_audioset(h))
        return x, clip


def test_cnn14_converted_matches_torch_golden():
    """Converted Cnn14 weights produce the same post-frontend outputs as the
    torch oracle (frontend bypassed via waveform_input=False)."""
    rng = np.random.default_rng(3)
    sd = _cnn14_sd(rng)
    # keep fc logits out of sigmoid saturation so the comparison is sharp
    for k in ("fc1.weight", "fc1.bias", "fc_audioset.weight", "fc_audioset.bias"):
        sd[k] = sd[k] * 0.02
    params = convert_pann(sd, "cnn14")
    mel = rng.standard_normal((2, 64, 64)).astype(np.float32)  # (B, T, F)

    with torch.no_grad():
        frames_t, clip_t = _TorchCnn14Body(sd)(torch.from_numpy(mel))

    out = pann_apply(params, mel, waveform_input=False)
    np.testing.assert_allclose(
        np.asarray(out["frame_embs"]), frames_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["clipwise_output"]), clip_t.numpy(), atol=2e-5, rtol=1e-4
    )
