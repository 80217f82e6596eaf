"""Extended PANN zoo: ResNet22 and MobileNetV1 encoders (NHWC JAX).

Capability twins of the reference's vendored PANN zoo members
(``src/conette/nn/pann_utils/models.py:736-1088`` ResNet22 with
pre-avgpool-strided basic blocks and zero-init residual BN;
``models.py:1663-1805`` MobileNetV1 with avg-pool-strided depthwise
separable convs). Both share the 64-mel frontend + bn0 and the clip-head
contract of the Cnn familie(s); frame embeddings are the frequency-mean
of the last feature map (same contract as models/pann.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conette_tpu.models.layers import (
    Params,
    batch_norm_inference,
    batch_norm_init,
    batch_norm_train,
    conv2d,
    conv2d_init,
    linear,
    linear_init,
)
from conette_tpu.models.pann import PANN_LOGMEL, conv_block, conv_block_init
from conette_tpu.ops.frontend import LogMelConfig, logmel_spectrogram

NUM_CLASSES = 527


def _avg_pool(x: jax.Array, k: int = 2) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _bn(params: Params, x: jax.Array, deterministic: bool) -> jax.Array:
    if deterministic:
        return batch_norm_inference(params, x, axis=-1)
    out, _ = batch_norm_train(params, x, axis=-1)
    return out


# ------------------------------------------------------------------ ResNet22
def _basic_block_init(key: jax.Array, inplanes: int, planes: int, stride: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p: Params = {
        "conv1": conv2d_init(k1, inplanes, planes, (3, 3), init="torch"),
        "bn1": batch_norm_init(planes),
        "conv2": conv2d_init(k2, planes, planes, (3, 3), init="torch"),
        # zero-init residual BN weight (models.py:778)
        "bn2": dict(batch_norm_init(planes), weight=jnp.zeros((planes,), jnp.float32)),
        "stride": stride,
    }
    if stride != 1 or inplanes != planes:
        p["downsample"] = {
            "conv": conv2d_init(k3, inplanes, planes, (1, 1), init="torch"),
            "bn": batch_norm_init(planes),
        }
    return p


def _basic_block(p: Params, x: jax.Array, deterministic: bool) -> jax.Array:
    identity = x
    out = _avg_pool(x) if p["stride"] == 2 else x
    out = conv2d(p["conv1"], out, padding=((1, 1), (1, 1)))
    out = jax.nn.relu(_bn(p["bn1"], out, deterministic))
    out = conv2d(p["conv2"], out, padding=((1, 1), (1, 1)))
    out = _bn(p["bn2"], out, deterministic)
    if "downsample" in p:
        if p["stride"] == 2:
            identity = _avg_pool(identity)
        identity = _bn(
            p["downsample"]["bn"],
            conv2d(p["downsample"]["conv"], identity),
            deterministic,
        )
    return jax.nn.relu(out + identity)


def resnet22_init(
    key: jax.Array,
    num_classes: int = NUM_CLASSES,
    n_mels: int = 64,
    depths: tuple[int, int, int, int] = (2, 2, 2, 2),
) -> Params:
    """ResNet22 by default; ``depths=(3, 4, 6, 3)`` gives the ResNet38
    layout (models.py:1089-1200) — same basic blocks, deeper stages."""
    keys = iter(jax.random.split(key, 8 + 2 * sum(depths)))
    params: Params = {
        "bn0": batch_norm_init(n_mels),
        "conv_block1": conv_block_init(next(keys), 1, 64),
        "layers": [],
        "conv_block_after1": conv_block_init(next(keys), 512, 2048),
        "fc1": linear_init(next(keys), 2048, 2048, init="torch"),
        "fc_audioset": linear_init(next(keys), 2048, num_classes, init="torch"),
    }
    inplanes = 64
    strides = (1, 2, 2, 2)
    for (planes, stride), blocks in zip(
        zip((64, 128, 256, 512), strides), depths
    ):
        stage = [_basic_block_init(next(keys), inplanes, planes, stride)]
        inplanes = planes
        for _ in range(1, blocks):
            stage.append(_basic_block_init(next(keys), inplanes, planes, 1))
        params["layers"].append(stage)
    return params


def resnet38_init(key: jax.Array, **kw) -> Params:
    return resnet22_init(key, depths=(3, 4, 6, 3), **kw)


# --------------------------------------------------------------- MobileNetV1
def mobilenetv1_init(key: jax.Array, num_classes: int = NUM_CLASSES, n_mels: int = 64) -> Params:
    spec = [  # (type, in, out, pool_stride) — models.py:1745-1760
        ("bn", 1, 32, 2),
        ("dw", 32, 64, 1), ("dw", 64, 128, 2), ("dw", 128, 128, 1),
        ("dw", 128, 256, 2), ("dw", 256, 256, 1), ("dw", 256, 512, 2),
        ("dw", 512, 512, 1), ("dw", 512, 512, 1), ("dw", 512, 512, 1),
        ("dw", 512, 512, 1), ("dw", 512, 512, 1), ("dw", 512, 1024, 2),
        ("dw", 1024, 1024, 1),
    ]
    keys = iter(jax.random.split(key, len(spec) * 2 + 4))
    params: Params = {"bn0": batch_norm_init(n_mels), "features": []}
    for kind, inp, oup, stride in spec:
        if kind == "bn":
            params["features"].append(
                {
                    "kind": "bn",
                    "stride": stride,
                    "conv": conv2d_init(next(keys), inp, oup, (3, 3), init="torch"),
                    "bn": batch_norm_init(oup),
                }
            )
        else:
            params["features"].append(
                {
                    "kind": "dw",
                    "stride": stride,
                    "dwconv": conv2d_init(next(keys), inp, inp, (3, 3), groups=inp, init="torch"),
                    "bn1": batch_norm_init(inp),
                    "pwconv": conv2d_init(next(keys), inp, oup, (1, 1), init="torch"),
                    "bn2": batch_norm_init(oup),
                }
            )
    params["fc1"] = linear_init(next(keys), 1024, 1024, init="torch")
    params["fc_audioset"] = linear_init(next(keys), 1024, num_classes, init="torch")
    return params


# ------------------------------------------------------------------- forward
def pann_zoo_apply(
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    arch: str,
    logmel_cfg: LogMelConfig = PANN_LOGMEL,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    mel = logmel_spectrogram(waveform, logmel_cfg, compute_dtype=compute_dtype)
    input_time_len = waveform.shape[-1]
    mel = _bn(params["bn0"], mel, deterministic)
    x = mel[..., None].astype(compute_dtype)

    if arch == "resnet22":
        x, _ = conv_block(params["conv_block1"], x, deterministic=deterministic)
        for stage in params["layers"]:
            for block in stage:
                x = _basic_block(block, x, deterministic)
        x = _avg_pool(x)
        x, _ = conv_block(
            params["conv_block_after1"], x, pool_size=(1, 1),
            deterministic=deterministic,
        )
        feat = 2048
    elif arch == "mobilenetv1":
        for layer in params["features"]:
            if layer["kind"] == "bn":
                x = conv2d(layer["conv"], x, padding=((1, 1), (1, 1)))
                if layer["stride"] > 1:
                    x = _avg_pool(x, layer["stride"])
                x = jax.nn.relu(_bn(layer["bn"], x, deterministic))
            else:
                inp = x.shape[-1]
                x = conv2d(layer["dwconv"], x, padding=((1, 1), (1, 1)), groups=inp)
                if layer["stride"] > 1:
                    x = _avg_pool(x, layer["stride"])
                x = jax.nn.relu(_bn(layer["bn1"], x, deterministic))
                x = conv2d(layer["pwconv"], x)
                x = jax.nn.relu(_bn(layer["bn2"], x, deterministic))
        feat = 1024
    else:
        raise ValueError(f"Unknown arch {arch!r}")

    frames = jnp.mean(x.astype(jnp.float32), axis=2)  # (B, T', C)
    n_out = frames.shape[1]
    reduction = max(input_time_len // max(n_out, 1), 1)
    if waveform_lens is None:
        lens = jnp.full((frames.shape[0],), n_out, jnp.int32)
    else:
        lens = jnp.round(waveform_lens.astype(jnp.float32) / reduction).astype(jnp.int32)

    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    clip = jax.nn.sigmoid(linear(params["fc_audioset"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": lens,
        "clipwise_output": clip,
        "embedding": h,
    }


# ----------------------------------------------------------------- Cnn6
def conv_block5x5_init(key: jax.Array, in_ch: int, out_ch: int) -> Params:
    """PANN ``ConvBlock5x5``: ONE 5×5 conv + BN (models.py:83-120)."""
    return {
        "conv1": conv2d_init(key, in_ch, out_ch, (5, 5), init="torch"),
        "bn1": batch_norm_init(out_ch),
    }


def conv_block5x5(p: Params, x: jax.Array, deterministic: bool) -> jax.Array:
    y = conv2d(p["conv1"], x, padding=((2, 2), (2, 2)))
    y = jax.nn.relu(_bn(p["bn1"], y, deterministic))
    return _avg_pool(y)


def cnn6_init(key: jax.Array, num_classes: int = NUM_CLASSES, n_mels: int = 64) -> Params:
    keys = iter(jax.random.split(key, 8))
    channels = [(1, 64), (64, 128), (128, 256), (256, 512)]
    return {
        "bn0": batch_norm_init(n_mels),
        "blocks": [conv_block5x5_init(next(keys), i, o) for i, o in channels],
        "fc1": linear_init(next(keys), 512, 512, init="torch"),
        "fc_audioset": linear_init(next(keys), 512, num_classes, init="torch"),
    }


# ---------------------------------------------------- Wavegram_Logmel_Cnn14
def _conv1d_init(key: jax.Array, in_ch: int, out_ch: int, k: int) -> Params:
    import math as _math

    fan_in = in_ch * k
    bound = 1.0 / _math.sqrt(fan_in)
    w = jax.random.uniform(key, (k, in_ch, out_ch), jnp.float32, -bound, bound)
    return {"weight": w}


def _conv1d(p: Params, x: jax.Array, stride: int = 1, padding: int = 0,
            dilation: int = 1) -> jax.Array:
    """NWC conv1d with WIO kernel, no bias (PANN wavegram convs are
    bias-free)."""
    return jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride,), [(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _max_pool1d(x: jax.Array, k: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, 1), (1, k, 1), "VALID"
    )


def _pre_wav_block_init(key: jax.Array, in_ch: int, out_ch: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _conv1d_init(k1, in_ch, out_ch, 3),
        "bn1": batch_norm_init(out_ch),
        "conv2": _conv1d_init(k2, out_ch, out_ch, 3),
        "bn2": batch_norm_init(out_ch),
    }


def _pre_wav_block(p: Params, x: jax.Array, pool: int, deterministic: bool) -> jax.Array:
    """ConvPreWavBlock twin (models.py:2700-2740): conv1d k3 → BN → ReLU →
    dilated conv1d k3 d2 → BN → ReLU → maxpool."""
    y = jax.nn.relu(_bn(p["bn1"], _conv1d(p["conv1"], x, padding=1), deterministic))
    y = jax.nn.relu(
        _bn(p["bn2"], _conv1d(p["conv2"], y, padding=2, dilation=2), deterministic)
    )
    return _max_pool1d(y, pool)


def wavegram_logmel_cnn14_init(
    key: jax.Array, num_classes: int = NUM_CLASSES, n_mels: int = 64
) -> Params:
    keys = iter(jax.random.split(key, 16))
    channels = [(1, 64), (128, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
    return {
        "pre_conv0": _conv1d_init(next(keys), 1, 64, 11),
        "pre_bn0": batch_norm_init(64),
        "pre_block1": _pre_wav_block_init(next(keys), 64, 64),
        "pre_block2": _pre_wav_block_init(next(keys), 64, 128),
        "pre_block3": _pre_wav_block_init(next(keys), 128, 128),
        "pre_block4": conv_block_init(next(keys), 4, 64),
        "bn0": batch_norm_init(n_mels),
        "blocks": [conv_block_init(next(keys), i, o) for i, o in channels],
        "fc1": linear_init(next(keys), 2048, 2048, init="torch"),
        "fc_audioset": linear_init(next(keys), 2048, num_classes, init="torch"),
    }


def wavegram_logmel_cnn14_apply(
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    logmel_cfg: LogMelConfig = PANN_LOGMEL,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    """Wavegram + log-mel dual-branch Cnn14 (models.py:2842-2990): the raw
    waveform passes a strided conv1d front (stride 5 · 3×pool4 = /320,
    aligning with the hop-320 spectrogram frames), reshapes into a
    (T, 32)-"frequency" map, and concatenates with the log-mel branch after
    its first conv block."""
    b = waveform.shape[0]
    # --- wavegram branch (NWC)
    a = waveform[:, :, None].astype(compute_dtype)
    a = jax.nn.relu(
        _bn(params["pre_bn0"], _conv1d(params["pre_conv0"], a, stride=5, padding=5),
            deterministic)
    )
    a = _pre_wav_block(params["pre_block1"], a, 4, deterministic)
    a = _pre_wav_block(params["pre_block2"], a, 4, deterministic)
    a = _pre_wav_block(params["pre_block3"], a, 4, deterministic)
    # (B, T, 128) → (B, T, 32, 4) NHWC: 128 channels → 4 groups × 32 "freqs"
    t = a.shape[1]
    a = a.reshape(b, t, 4, 32).transpose(0, 1, 3, 2)  # (B, T, 32, 4)
    a, _ = conv_block(params["pre_block4"], a, pool_size=(2, 1),
                      deterministic=deterministic)  # (B, T/2, 32, 64)

    # --- log-mel branch
    mel = logmel_spectrogram(waveform, logmel_cfg, compute_dtype=compute_dtype)
    mel = _bn(params["bn0"], mel, deterministic)
    x = mel[..., None].astype(compute_dtype)
    x, _ = conv_block(params["blocks"][0], x, deterministic=deterministic)

    # align time lengths then concat channels
    t_min = min(x.shape[1], a.shape[1])
    x = jnp.concatenate([x[:, :t_min], a[:, :t_min]], axis=-1)  # (B,T,32,128)

    for block in params["blocks"][1:-1]:
        x, _ = conv_block(block, x, deterministic=deterministic)
    x, _ = conv_block(params["blocks"][-1], x, pool_size=(1, 1),
                      deterministic=deterministic)

    frames = jnp.mean(x.astype(jnp.float32), axis=2)
    n_out = frames.shape[1]
    reduction = max(waveform.shape[-1] // max(n_out, 1), 1)
    if waveform_lens is None:
        lens = jnp.full((b,), n_out, jnp.int32)
    else:
        lens = jnp.round(waveform_lens.astype(jnp.float32) / reduction).astype(jnp.int32)
    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": lens,
        "clipwise_output": jax.nn.sigmoid(linear(params["fc_audioset"], h)),
        "embedding": h,
    }


def cnn6_apply(
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    logmel_cfg: LogMelConfig = PANN_LOGMEL,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    """Cnn6 forward (models.py:497-605): 4 ConvBlock5x5 stages."""
    mel = logmel_spectrogram(waveform, logmel_cfg, compute_dtype=compute_dtype)
    input_time_len = waveform.shape[-1]
    mel = _bn(params["bn0"], mel, deterministic)
    x = mel[..., None].astype(compute_dtype)
    for block in params["blocks"]:
        x = conv_block5x5(block, x, deterministic)
    frames = jnp.mean(x.astype(jnp.float32), axis=2)
    n_out = frames.shape[1]
    reduction = max(input_time_len // max(n_out, 1), 1)
    if waveform_lens is None:
        lens = jnp.full((frames.shape[0],), n_out, jnp.int32)
    else:
        lens = jnp.round(waveform_lens.astype(jnp.float32) / reduction).astype(jnp.int32)
    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": lens,
        "clipwise_output": jax.nn.sigmoid(linear(params["fc_audioset"], h)),
        "embedding": h,
    }


# --------------------------------------------------------------- MobileNetV2
_MBV2_SETTING = [  # t (expand), c (out), n (repeats), s (stride) — models.py:1921-1930
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 2), (6, 160, 3, 1), (6, 320, 1, 1),
]


def _inverted_residual_init(key: jax.Array, inp: int, oup: int, stride: int,
                            expand: int) -> Params:
    hidden = round(inp * expand)
    keys = iter(jax.random.split(key, 4))
    p: Params = {"stride": stride, "use_res": stride == 1 and inp == oup,
                 "expand": expand}
    if expand != 1:
        p["expand_conv"] = conv2d_init(next(keys), inp, hidden, (1, 1), init="torch")
        p["expand_bn"] = batch_norm_init(hidden)
    p["dwconv"] = conv2d_init(next(keys), hidden, hidden, (3, 3), groups=hidden, init="torch")
    p["dw_bn"] = batch_norm_init(hidden)
    p["project_conv"] = conv2d_init(next(keys), hidden, oup, (1, 1), init="torch")
    p["project_bn"] = batch_norm_init(oup)
    return p


def _inverted_residual(p: Params, x: jax.Array, deterministic: bool) -> jax.Array:
    """PANN InvertedResidual (models.py:1807-1862): stride via avg-pool
    after the depthwise conv; ReLU6 activations; linear projection."""
    y = x
    if p["expand"] != 1:
        y = conv2d(p["expand_conv"], y)
        y = jnp.clip(jax.nn.relu(_bn(p["expand_bn"], y, deterministic)), 0, 6)
    hidden = y.shape[-1]
    y = conv2d(p["dwconv"], y, padding=((1, 1), (1, 1)), groups=hidden)
    if p["stride"] == 2:
        y = _avg_pool(y)
    y = jnp.clip(jax.nn.relu(_bn(p["dw_bn"], y, deterministic)), 0, 6)
    y = conv2d(p["project_conv"], y)
    y = _bn(p["project_bn"], y, deterministic)
    return x + y if p["use_res"] else y


def mobilenetv2_init(key: jax.Array, num_classes: int = NUM_CLASSES, n_mels: int = 64) -> Params:
    keys = iter(jax.random.split(key, 64))
    params: Params = {
        "bn0": batch_norm_init(n_mels),
        "stem_conv": conv2d_init(next(keys), 1, 32, (3, 3), init="torch"),
        "stem_bn": batch_norm_init(32),
        "blocks": [],
        "head_conv": conv2d_init(next(keys), 320, 1280, (1, 1), init="torch"),
        "head_bn": batch_norm_init(1280),
        "fc1": linear_init(next(keys), 1280, 1024, init="torch"),
        "fc_audioset": linear_init(next(keys), 1024, num_classes, init="torch"),
    }
    inp = 32
    for t, c, n, s in _MBV2_SETTING:
        for i in range(n):
            params["blocks"].append(
                _inverted_residual_init(next(keys), inp, c, s if i == 0 else 1, t)
            )
            inp = c
    return params


def mobilenetv2_apply(
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    logmel_cfg: LogMelConfig = PANN_LOGMEL,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    """MobileNetV2 forward (models.py:1863-2020)."""
    mel = logmel_spectrogram(waveform, logmel_cfg, compute_dtype=compute_dtype)
    input_time_len = waveform.shape[-1]
    mel = _bn(params["bn0"], mel, deterministic)
    x = mel[..., None].astype(compute_dtype)
    x = conv2d(params["stem_conv"], x, padding=((1, 1), (1, 1)))
    x = _avg_pool(x)
    x = jnp.clip(jax.nn.relu(_bn(params["stem_bn"], x, deterministic)), 0, 6)
    for block in params["blocks"]:
        x = _inverted_residual(block, x, deterministic)
    x = conv2d(params["head_conv"], x)
    x = jnp.clip(jax.nn.relu(_bn(params["head_bn"], x, deterministic)), 0, 6)
    frames = jnp.mean(x.astype(jnp.float32), axis=2)
    n_out = frames.shape[1]
    reduction = max(input_time_len // max(n_out, 1), 1)
    if waveform_lens is None:
        lens = jnp.full((frames.shape[0],), n_out, jnp.int32)
    else:
        lens = jnp.round(waveform_lens.astype(jnp.float32) / reduction).astype(jnp.int32)
    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": lens,
        "clipwise_output": jax.nn.sigmoid(linear(params["fc_audioset"], h)),
        "embedding": h,
    }


# ------------------------------------------------------- LeeNet11 / LeeNet24
def _max_pool1d_pad(x: jax.Array, k: int) -> jax.Array:
    """max_pool1d with padding=k//2 (torch F.max_pool1d semantics)."""
    pad = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, 1), (1, k, 1),
        [(0, 0), (pad, pad), (0, 0)],
    )


def _leenet_block_init(key: jax.Array, in_ch: int, out_ch: int, double: bool) -> Params:
    k1, k2 = jax.random.split(key)
    p: Params = {
        "conv1": _conv1d_init(k1, in_ch, out_ch, 3),
        "bn1": batch_norm_init(out_ch),
    }
    if double:  # LeeNetConvBlock2 (models.py:2116-2155)
        p["conv2"] = _conv1d_init(k2, out_ch, out_ch, 3)
        p["bn2"] = batch_norm_init(out_ch)
    return p


def _leenet_block(p: Params, x: jax.Array, stride: int, pool: int,
                  deterministic: bool) -> jax.Array:
    y = jax.nn.relu(
        _bn(p["bn1"], _conv1d(p["conv1"], x, stride=stride, padding=1), deterministic)
    )
    if "conv2" in p:
        y = jax.nn.relu(_bn(p["bn2"], _conv1d(p["conv2"], y, padding=1), deterministic))
    if pool != 1:
        y = _max_pool1d_pad(y, pool)
    return y


_LEENET11 = [(1, 64), (64, 64), (64, 64), (64, 128), (128, 128), (128, 128),
             (128, 128), (128, 128), (128, 256)]
_LEENET24 = [(1, 64), (64, 96), (96, 128), (128, 128), (128, 256), (256, 256),
             (256, 512), (512, 512), (512, 1024)]


def leenet_init(key: jax.Array, variant: str = "leenet11",
                num_classes: int = NUM_CLASSES) -> Params:
    """Raw-waveform LeeNet (models.py:2051-2110 LeeNet11 with single-conv
    blocks / 2157-2230 LeeNet24 with double-conv blocks)."""
    double = variant == "leenet24"
    spec = _LEENET24 if double else _LEENET11
    keys = iter(jax.random.split(key, len(spec) + 4))
    emb = spec[-1][1]
    fc1_out = 512 if not double else 1024
    return {
        "blocks": [_leenet_block_init(next(keys), i, o, double) for i, o in spec],
        "fc1": linear_init(next(keys), emb, fc1_out, init="torch"),
        "fc_audioset": linear_init(next(keys), fc1_out, num_classes, init="torch"),
        "double": double,
    }


def leenet_apply(
    params: Params,
    waveform: jax.Array,
    *,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    x = waveform[:, :, None].astype(compute_dtype)  # (B, T, 1) NWC
    n = len(params["blocks"])
    for i, block in enumerate(params["blocks"]):
        stride = 3 if i == 0 else 1
        # LeeNet24's final block is called with pool_size=1 (models.py:2230);
        # LeeNet11 pools every block but the first (models.py:2098-2106)
        pool = 1 if i == 0 or (params.get("double") and i == n - 1) else 3
        x = _leenet_block(block, x, stride, pool, deterministic)
    frames = x.astype(jnp.float32)  # (B, T', C)
    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": jnp.full((x.shape[0],), frames.shape[1], jnp.int32),
        "clipwise_output": jax.nn.sigmoid(linear(params["fc_audioset"], h)),
        "embedding": h,
    }


# ------------------------------------------------------------------ DaiNet19
def _dainet_res_block_init(key: jax.Array, in_ch: int, out_ch: int) -> Params:
    keys = iter(jax.random.split(key, 6))
    p: Params = {}
    ch = in_ch
    for i in range(1, 5):
        p[f"conv{i}"] = _conv1d_init(next(keys), ch, out_ch, 3)
        p[f"bn{i}"] = batch_norm_init(out_ch)
        ch = out_ch
    if in_ch != out_ch:
        p["downsample"] = _conv1d_init(next(keys), in_ch, out_ch, 1)
        p["bn_downsample"] = batch_norm_init(out_ch)
    return p


def _dainet_res_block(p: Params, x: jax.Array, pool: int, deterministic: bool) -> jax.Array:
    """DaiNetResBlock (models.py:2230-2300): 4 conv1d-BN with residual."""
    y = x
    for i in range(1, 4):
        y = jax.nn.relu(_bn(p[f"bn{i}"], _conv1d(p[f"conv{i}"], y, padding=1), deterministic))
    y = _bn(p["bn4"], _conv1d(p["conv4"], y, padding=1), deterministic)
    if "downsample" in p:
        idn = _bn(p["bn_downsample"], _conv1d(p["downsample"], x), deterministic)
        y = jax.nn.relu(y + idn)
    else:
        y = jax.nn.relu(y + x)
    if pool != 1:
        # DaiNet19.forward pools OUTSIDE the block: F.max_pool1d(x, 4) with
        # default padding=0 (models.py:2363-2369) — unpadded, unlike LeeNet
        y = _max_pool1d(y, pool)
    return y


def dainet_init(key: jax.Array, num_classes: int = NUM_CLASSES) -> Params:
    keys = iter(jax.random.split(key, 10))
    return {
        "conv0": _conv1d_init(next(keys), 1, 64, 80),
        "bn0": batch_norm_init(64),
        "blocks": [
            _dainet_res_block_init(next(keys), 64, 64),
            _dainet_res_block_init(next(keys), 64, 128),
            _dainet_res_block_init(next(keys), 128, 256),
            _dainet_res_block_init(next(keys), 256, 512),
        ],
        "fc1": linear_init(next(keys), 512, 512, init="torch"),
        "fc_audioset": linear_init(next(keys), 512, num_classes, init="torch"),
    }


def dainet_apply(
    params: Params,
    waveform: jax.Array,
    *,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    """DaiNet19 (models.py: conv0 k80 s4 → 4 res blocks with maxpool4
    between the first three)."""
    x = waveform[:, :, None].astype(compute_dtype)
    # reference: x = self.bn0(self.conv0(x)) — NO relu (models.py:2361-2363)
    x = _bn(params["bn0"], _conv1d(params["conv0"], x, stride=4), deterministic)
    for i, block in enumerate(params["blocks"]):
        pool = 4 if i < 3 else 1
        x = _dainet_res_block(block, x, pool, deterministic)
    frames = x.astype(jnp.float32)
    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": jnp.full((x.shape[0],), frames.shape[1], jnp.int32),
        "clipwise_output": jax.nn.sigmoid(linear(params["fc_audioset"], h)),
        "embedding": h,
    }


# ------------------------------------------------------- ResNet54 bottleneck
def _bottleneck_init(key: jax.Array, inplanes: int, planes: int, stride: int) -> Params:
    """PANN _ResnetBottleneck (expansion 4, pre-avgpool stride,
    zero-init final BN; models.py:805-872)."""
    keys = iter(jax.random.split(key, 4))
    out_ch = planes * 4
    p: Params = {
        "conv1": conv2d_init(next(keys), inplanes, planes, (1, 1), init="torch"),
        "bn1": batch_norm_init(planes),
        "conv2": conv2d_init(next(keys), planes, planes, (3, 3), init="torch"),
        "bn2": batch_norm_init(planes),
        "conv3": conv2d_init(next(keys), planes, out_ch, (1, 1), init="torch"),
        "bn3": dict(batch_norm_init(out_ch), weight=jnp.zeros((out_ch,), jnp.float32)),
        "stride": stride,
    }
    if stride != 1 or inplanes != out_ch:
        p["downsample"] = {
            "conv": conv2d_init(next(keys), inplanes, out_ch, (1, 1), init="torch"),
            "bn": batch_norm_init(out_ch),
        }
    return p


def _bottleneck(p: Params, x: jax.Array, deterministic: bool) -> jax.Array:
    if p["stride"] == 2:
        x = _avg_pool(x)
    out = jax.nn.relu(_bn(p["bn1"], conv2d(p["conv1"], x), deterministic))
    out = jax.nn.relu(
        _bn(p["bn2"], conv2d(p["conv2"], out, padding=((1, 1), (1, 1))), deterministic)
    )
    out = _bn(p["bn3"], conv2d(p["conv3"], out), deterministic)
    identity = x
    if "downsample" in p:
        identity = _bn(p["downsample"]["bn"], conv2d(p["downsample"]["conv"], x),
                       deterministic)
    return jax.nn.relu(out + identity)


def resnet54_init(key: jax.Array, num_classes: int = NUM_CLASSES, n_mels: int = 64) -> Params:
    """ResNet54 (models.py:1202-1315): bottleneck stages [3,4,6,3] emitting
    2048 channels, then ``conv_block_after1`` (2048→2048) after the 2×2
    avg-pool — same tail as ResNet22/38 (models.py:1289-1305)."""
    depths = (3, 4, 6, 3)
    keys = iter(jax.random.split(key, 8 + 2 * sum(depths)))
    params: Params = {
        "bn0": batch_norm_init(n_mels),
        "conv_block1": conv_block_init(next(keys), 1, 64),
        "layers": [],
        "conv_block_after1": conv_block_init(next(keys), 2048, 2048),
        "fc1": linear_init(next(keys), 2048, 2048, init="torch"),
        "fc_audioset": linear_init(next(keys), 2048, num_classes, init="torch"),
        "bottleneck": True,
    }
    inplanes = 64
    for planes, blocks, stride in zip((64, 128, 256, 512), depths, (1, 2, 2, 2)):
        stage = [_bottleneck_init(next(keys), inplanes, planes, stride)]
        inplanes = planes * 4
        for _ in range(1, blocks):
            stage.append(_bottleneck_init(next(keys), inplanes, planes, 1))
        params["layers"].append(stage)
    return params


def resnet54_apply(
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    logmel_cfg: LogMelConfig = PANN_LOGMEL,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    mel = logmel_spectrogram(waveform, logmel_cfg, compute_dtype=compute_dtype)
    input_time_len = waveform.shape[-1]
    mel = _bn(params["bn0"], mel, deterministic)
    x = mel[..., None].astype(compute_dtype)
    x, _ = conv_block(params["conv_block1"], x, deterministic=deterministic)
    for stage in params["layers"]:
        for block in stage:
            x = _bottleneck(block, x, deterministic)
    x = _avg_pool(x)
    x, _ = conv_block(
        params["conv_block_after1"], x, pool_size=(1, 1), deterministic=deterministic
    )
    frames = jnp.mean(x.astype(jnp.float32), axis=2)
    n_out = frames.shape[1]
    reduction = max(input_time_len // max(n_out, 1), 1)
    if waveform_lens is None:
        lens = jnp.full((frames.shape[0],), n_out, jnp.int32)
    else:
        lens = jnp.round(waveform_lens.astype(jnp.float32) / reduction).astype(jnp.int32)
    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": lens,
        "clipwise_output": jax.nn.sigmoid(linear(params["fc_audioset"], h)),
        "embedding": h,
    }


# ----------------------------------------------------- Res1dNet31 / Res1dNet51
def _wav1d_block_init(key: jax.Array, inplanes: int, planes: int, stride: int) -> Params:
    """_ResnetBasicBlockWav1d twin (models.py:2404-2470): two bias-free k3
    conv1ds (second dilated 2), BN2 weight zero-init; stride realized as a
    leading max-pool; downsample = [avgpool +] conv1x1 + BN."""
    k1, k2, k3 = jax.random.split(key, 3)
    p: Params = {
        "conv1": _conv1d_init(k1, inplanes, planes, 3),
        "bn1": batch_norm_init(planes),
        "conv2": _conv1d_init(k2, planes, planes, 3),
        "bn2": dict(batch_norm_init(planes), weight=jnp.zeros((planes,), jnp.float32)),
        "stride": stride,
    }
    if stride != 1 or inplanes != planes:
        p["downsample"] = {
            "conv": _conv1d_init(k3, inplanes, planes, 1),
            "bn": batch_norm_init(planes),
        }
    return p


def _avg_pool1d(x: jax.Array, k: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, 1), (1, k, 1), "VALID"
    ) / k


def _wav1d_block(p: Params, x: jax.Array, deterministic: bool) -> jax.Array:
    out = _max_pool1d(x, p["stride"]) if p["stride"] != 1 else x
    out = jax.nn.relu(_bn(p["bn1"], _conv1d(p["conv1"], out, padding=1), deterministic))
    # (reference applies dropout 0.1 here in training; inference path omits it)
    out = _bn(p["bn2"], _conv1d(p["conv2"], out, padding=2, dilation=2), deterministic)
    identity = x
    if "downsample" in p:
        if p["stride"] != 1:
            identity = _avg_pool1d(identity, p["stride"])
        identity = _bn(
            p["downsample"]["bn"], _conv1d(p["downsample"]["conv"], identity),
            deterministic,
        )
    return jax.nn.relu(out + identity)


_RES1D_PLANES = (64, 128, 256, 512, 1024, 1024, 2048)
_RES1D_STRIDES = (1, 4, 4, 4, 4, 4, 4)
_RES1D_DEPTHS = {
    "res1dnet31": (2, 2, 2, 2, 2, 2, 2),  # models.py:2576-2635
    "res1dnet51": (2, 3, 4, 6, 4, 3, 2),  # models.py:2638-2700
}


def res1dnet_init(key: jax.Array, variant: str = "res1dnet31",
                  num_classes: int = NUM_CLASSES) -> Params:
    """Raw-waveform 1d ResNet (Res1dNet31/51): bias-free conv0 k11 s5 p5 +
    BN, 7 stages of wav1d basic blocks, 2048-d max+mean head."""
    depths = _RES1D_DEPTHS[variant]
    keys = iter(jax.random.split(key, 4 + sum(depths)))
    params: Params = {
        "conv0": _conv1d_init(next(keys), 1, 64, 11),
        "bn0": batch_norm_init(64),
        "layers": [],
        "fc1": linear_init(next(keys), 2048, 2048, init="torch"),
        "fc_audioset": linear_init(next(keys), 2048, num_classes, init="torch"),
    }
    inplanes = 64
    for planes, stride, blocks in zip(_RES1D_PLANES, _RES1D_STRIDES, depths):
        stage = [_wav1d_block_init(next(keys), inplanes, planes, stride)]
        inplanes = planes
        for _ in range(1, blocks):
            stage.append(_wav1d_block_init(next(keys), inplanes, planes, 1))
        params["layers"].append(stage)
    return params


def res1dnet_apply(
    params: Params,
    waveform: jax.Array,
    *,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    x = waveform[:, :, None].astype(compute_dtype)
    x = _bn(params["bn0"], _conv1d(params["conv0"], x, stride=5, padding=5),
            deterministic)
    for stage in params["layers"]:
        for block in stage:
            x = _wav1d_block(block, x, deterministic)
    frames = x.astype(jnp.float32)  # (B, T', 2048)
    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": jnp.full((x.shape[0],), frames.shape[1], jnp.int32),
        "clipwise_output": jax.nn.sigmoid(linear(params["fc_audioset"], h)),
        "embedding": h,
    }


# -------------------------------------------------------------- Wavegram_Cnn14
def wavegram_cnn14_init(key: jax.Array, num_classes: int = NUM_CLASSES) -> Params:
    """Wavegram-only Cnn14 (models.py:2743-2860): the log-mel branch's
    conv_block1 exists in the torch checkpoint but is unused in forward —
    kept in the pytree for converter fidelity."""
    keys = iter(jax.random.split(key, 14))
    channels = [(64, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
    return {
        "pre_conv0": _conv1d_init(next(keys), 1, 64, 11),
        "pre_bn0": batch_norm_init(64),
        "pre_block1": _pre_wav_block_init(next(keys), 64, 64),
        "pre_block2": _pre_wav_block_init(next(keys), 64, 128),
        "pre_block3": _pre_wav_block_init(next(keys), 128, 128),
        "pre_block4": conv_block_init(next(keys), 4, 64),
        "bn0": batch_norm_init(64),  # declared in torch; unused in forward
        "conv_block1": conv_block_init(next(keys), 1, 64),  # unused in forward
        "blocks": [conv_block_init(next(keys), i, o) for i, o in channels],
        "fc1": linear_init(next(keys), 2048, 2048, init="torch"),
        "fc_audioset": linear_init(next(keys), 2048, num_classes, init="torch"),
    }


def wavegram_cnn14_apply(
    params: Params,
    waveform: jax.Array,
    *,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    b = waveform.shape[0]
    a = waveform[:, :, None].astype(compute_dtype)
    a = jax.nn.relu(
        _bn(params["pre_bn0"], _conv1d(params["pre_conv0"], a, stride=5, padding=5),
            deterministic)
    )
    a = _pre_wav_block(params["pre_block1"], a, 4, deterministic)
    a = _pre_wav_block(params["pre_block2"], a, 4, deterministic)
    a = _pre_wav_block(params["pre_block3"], a, 4, deterministic)
    t = a.shape[1]
    a = a.reshape(b, t, 4, 32).transpose(0, 1, 3, 2)  # (B, T, 32, 4)
    x, _ = conv_block(params["pre_block4"], a, pool_size=(2, 1),
                      deterministic=deterministic)  # (B, T/2, 32, 64)
    for block in params["blocks"][:-1]:
        x, _ = conv_block(block, x, deterministic=deterministic)
    x, _ = conv_block(params["blocks"][-1], x, pool_size=(1, 1),
                      deterministic=deterministic)
    frames = jnp.mean(x.astype(jnp.float32), axis=2)
    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": jnp.full((b,), frames.shape[1], jnp.int32),
        "clipwise_output": jax.nn.sigmoid(linear(params["fc_audioset"], h)),
        "embedding": h,
    }


# ---------------------------------------------------- Wavegram_Logmel128_Cnn14
PANN_LOGMEL128 = LogMelConfig(n_mels=128)
PANN_LOGMEL32 = LogMelConfig(n_mels=32)
PANN_LOGMEL_16K = LogMelConfig(
    sample_rate=16_000, n_fft=512, hop_length=160, n_mels=64, fmax=8_000.0
)
PANN_LOGMEL_8K = LogMelConfig(
    sample_rate=8_000, n_fft=256, hop_length=80, n_mels=64, fmax=4_000.0
)


def wavegram_logmel128_cnn14_init(
    key: jax.Array, num_classes: int = NUM_CLASSES
) -> Params:
    """128-mel dual-branch variant (models.py:2988-3131): unlike the 64-mel
    class, pre_block3 widens to 256 channels, reshaped as 4 groups × 64
    wavegram "freqs" to match the 128-mel branch's post-pool width."""
    keys = iter(jax.random.split(key, 16))
    channels = [(1, 64), (128, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
    return {
        "pre_conv0": _conv1d_init(next(keys), 1, 64, 11),
        "pre_bn0": batch_norm_init(64),
        "pre_block1": _pre_wav_block_init(next(keys), 64, 64),
        "pre_block2": _pre_wav_block_init(next(keys), 64, 128),
        "pre_block3": _pre_wav_block_init(next(keys), 128, 256),
        "pre_block4": conv_block_init(next(keys), 4, 64),
        "bn0": batch_norm_init(128),
        "blocks": [conv_block_init(next(keys), i, o) for i, o in channels],
        "fc1": linear_init(next(keys), 2048, 2048, init="torch"),
        "fc_audioset": linear_init(next(keys), 2048, num_classes, init="torch"),
    }


def wavegram_logmel128_cnn14_apply(
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    logmel_cfg: LogMelConfig = PANN_LOGMEL128,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    b = waveform.shape[0]
    a = waveform[:, :, None].astype(compute_dtype)
    a = jax.nn.relu(
        _bn(params["pre_bn0"], _conv1d(params["pre_conv0"], a, stride=5, padding=5),
            deterministic)
    )
    a = _pre_wav_block(params["pre_block1"], a, 4, deterministic)
    a = _pre_wav_block(params["pre_block2"], a, 4, deterministic)
    a = _pre_wav_block(params["pre_block3"], a, 4, deterministic)
    t = a.shape[1]
    # torch: (B, 256, T) → reshape (B, 4, 64, T) → transpose(2,3); channel
    # c = g*64 + f, same split as this NWC reshape (models.py:3103-3107)
    a = a.reshape(b, t, 4, 64).transpose(0, 1, 3, 2)  # (B, T, 64, 4)
    a, _ = conv_block(params["pre_block4"], a, pool_size=(2, 1),
                      deterministic=deterministic)  # (B, T/2, 64, 64)

    mel = logmel_spectrogram(waveform, logmel_cfg, compute_dtype=compute_dtype)
    mel = _bn(params["bn0"], mel, deterministic)
    x = mel[..., None].astype(compute_dtype)
    x, _ = conv_block(params["blocks"][0], x, deterministic=deterministic)

    t_min = min(x.shape[1], a.shape[1])
    f_min = min(x.shape[2], a.shape[2])
    x = jnp.concatenate([x[:, :t_min, :f_min], a[:, :t_min, :f_min]], axis=-1)

    for block in params["blocks"][1:-1]:
        x, _ = conv_block(block, x, deterministic=deterministic)
    x, _ = conv_block(params["blocks"][-1], x, pool_size=(1, 1),
                      deterministic=deterministic)

    frames = jnp.mean(x.astype(jnp.float32), axis=2)
    n_out = frames.shape[1]
    reduction = max(waveform.shape[-1] // max(n_out, 1), 1)
    if waveform_lens is None:
        lens = jnp.full((b,), n_out, jnp.int32)
    else:
        lens = jnp.round(waveform_lens.astype(jnp.float32) / reduction).astype(jnp.int32)
    h = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
    h = jax.nn.relu(linear(params["fc1"], h))
    return {
        "frame_embs": jnp.swapaxes(frames, 1, 2),
        "frame_embs_lens": lens,
        "clipwise_output": jax.nn.sigmoid(linear(params["fc_audioset"], h)),
        "embedding": h,
    }


# ------------------------------------------------ Cnn14_DecisionLevelMax / Avg
def _pool1d_same(x: jax.Array, kind: str, k: int = 3) -> jax.Array:
    """k3 s1 p1 max/avg pool over the time axis of (B, T, C)."""
    pad = [(0, 0), (k // 2, k // 2), (0, 0)]
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, k, 1), (1, 1, 1), pad
        )
    # torch avg_pool1d(count_include_pad=True) divides by k everywhere
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, 1), (1, 1, 1), pad
    ) / k


def cnn14_decisionlevel_apply(
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    pooling: str = "max",
    logmel_cfg: LogMelConfig = PANN_LOGMEL,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
    interpolate_ratio: int = 32,
) -> dict[str, jax.Array]:
    """Cnn14_DecisionLevelMax/Avg (models.py:3731-3858 / 3859-3990): Cnn14
    body → segmentwise k3 max+avg smoothing → framewise sigmoid head;
    clip = max (or mean) over segments; framewise output upsampled ×32 and
    padded to the spectrogram frame count. Params = ``cnn14_init``."""
    from conette_tpu.models.pann import pann_apply  # body reuse (same pytree)

    mel_frames = waveform.shape[-1] // logmel_cfg.hop_length + 1
    body = pann_apply(
        params, waveform, waveform_lens, logmel_cfg=logmel_cfg,
        deterministic=deterministic, compute_dtype=compute_dtype,
    )
    frames = jnp.swapaxes(body["frame_embs"], 1, 2)  # (B, T', 2048)
    x = _pool1d_same(frames, "max") + _pool1d_same(frames, "avg")
    h = jax.nn.relu(linear(params["fc1"], x))
    segmentwise = jax.nn.sigmoid(linear(params["fc_audioset"], h))  # (B,T',cls)
    if pooling == "max":
        clip = jnp.max(segmentwise, axis=1)
    elif pooling == "avg":
        clip = jnp.mean(segmentwise, axis=1)
    else:
        raise ValueError(f"Invalid {pooling=} (expected 'max' or 'avg').")
    # interpolate (repeat ×ratio) + pad with the last frame to mel_frames
    up = jnp.repeat(segmentwise, interpolate_ratio, axis=1)
    if up.shape[1] < mel_frames:
        tail = jnp.repeat(up[:, -1:], mel_frames - up.shape[1], axis=1)
        up = jnp.concatenate([up, tail], axis=1)
    else:
        up = up[:, :mel_frames]
    return {
        "frame_embs": body["frame_embs"],
        "frame_embs_lens": body["frame_embs_lens"],
        "clipwise_output": clip,
        "framewise_output": up,
        "embedding": jnp.max(h, axis=1),
    }
