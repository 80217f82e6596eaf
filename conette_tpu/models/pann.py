"""PANN encoder family in functional JAX (NHWC).

Capability twins of the reference's alternative encoders
(``src/conette/nn/encoders/cnn10.py:23-424``, ``cnn14.py:27-216``,
``cnn14_decisionlevel_att.py:23-245`` over the vendored PANN model zoo
``nn/pann_utils/models.py``):

- shared ``ConvBlock``: 3×3 conv → BN → ReLU twice, then 2×2 avg-pool;
- ``Cnn10``: 4 blocks (64→512), 64-mel frontend, 512-d frame embeddings;
- ``Cnn14``: 6 blocks (64→2048), 2048-d frame embeddings + fc1 clip head;
- ``Cnn14_DecisionLevelAtt``: attention-pooled clipwise output
  (``AttBlock``: softmax-attention conv1d over frames).

All share the reference output contract
``{frame_embs (B, C, T'), frame_embs_lens (B,), clipwise_output (B, 527)}``
so they are drop-in encoder choices for the captioning stack (the CoNeTTE
projection accepts any ``proj_in`` width).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from conette_tpu.models.layers import (
    Params,
    batch_norm_inference,
    batch_norm_init,
    batch_norm_train,
    conv2d,
    conv2d_init,
    dropout,
    linear,
    linear_init,
)
from conette_tpu.ops.frontend import LogMelConfig, logmel_spectrogram

PANN_LOGMEL = LogMelConfig(n_mels=64)
NUM_AUDIOSET_CLASSES = 527

CNN10_CHANNELS = (64, 128, 256, 512)
CNN14_CHANNELS = (64, 128, 256, 512, 1024, 2048)


# ----------------------------------------------------------------- ConvBlock
def conv_block_init(key: jax.Array, in_ch: int, out_ch: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv2d_init(k1, in_ch, out_ch, (3, 3), init="torch"),
        "bn1": batch_norm_init(out_ch),
        "conv2": conv2d_init(k2, out_ch, out_ch, (3, 3), init="torch"),
        "bn2": batch_norm_init(out_ch),
    }


def conv_block(
    params: Params,
    x: jax.Array,
    *,
    pool_size: tuple[int, int] = (2, 2),
    pool_type: str = "avg",
    deterministic: bool = True,
) -> tuple[jax.Array, list[Params]]:
    """NHWC ConvBlock (PANN ``ConvBlock`` twin). Returns (y, new_bn_stats)."""
    new_stats: list[Params] = []

    def bn(bp: Params, y: jax.Array) -> jax.Array:
        if deterministic:
            return batch_norm_inference(bp, y, axis=-1)
        out, stats = batch_norm_train(bp, y, axis=-1)
        new_stats.append(stats)
        return out

    y = conv2d(params["conv1"], x, padding=((1, 1), (1, 1)))
    y = jax.nn.relu(bn(params["bn1"], y))
    y = conv2d(params["conv2"], y, padding=((1, 1), (1, 1)))
    y = jax.nn.relu(bn(params["bn2"], y))
    if pool_type == "avg":
        y = jax.lax.reduce_window(
            y, 0.0, jax.lax.add,
            (1, pool_size[0], pool_size[1], 1), (1, pool_size[0], pool_size[1], 1),
            "VALID",
        ) / (pool_size[0] * pool_size[1])
    elif pool_type == "max":
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max,
            (1, pool_size[0], pool_size[1], 1), (1, pool_size[0], pool_size[1], 1),
            "VALID",
        )
    return y, new_stats


# --------------------------------------------------------------------- init
def pann_init(
    key: jax.Array,
    channels: tuple[int, ...] = CNN14_CHANNELS,
    num_classes: int = NUM_AUDIOSET_CLASSES,
    n_mels: int = 64,
    att_head: bool = False,
) -> Params:
    keys = iter(jax.random.split(key, len(channels) + 4))
    params: Params = {
        "bn0": batch_norm_init(n_mels),
        "blocks": [],
        "fc1": linear_init(next(keys), channels[-1], channels[-1], init="torch"),
    }
    in_ch = 1
    for ch in channels:
        params["blocks"].append(conv_block_init(next(keys), in_ch, ch))
        in_ch = ch
    if att_head:
        params["att"] = {
            "att": linear_init(next(keys), channels[-1], num_classes, init="torch"),
            "cla": linear_init(next(keys), channels[-1], num_classes, init="torch"),
        }
    else:
        params["fc_audioset"] = linear_init(
            next(keys), channels[-1], num_classes, init="torch"
        )
    return params


def cnn10_init(key: jax.Array, **kw: Any) -> Params:
    return pann_init(key, CNN10_CHANNELS, **kw)


def cnn14_init(key: jax.Array, **kw: Any) -> Params:
    return pann_init(key, CNN14_CHANNELS, **kw)


def cnn14_emb_init(key: jax.Array, emb_dim: int = 512, **kw: Any) -> Params:
    """Cnn14_emb512/128/32 twins (models.py:1315-1660): fc1 projects the
    pooled features to a smaller embedding before the AudioSet head."""
    params = pann_init(key, CNN14_CHANNELS, **kw)
    k1, k2 = jax.random.split(jax.random.fold_in(key, 99))
    params["fc1"] = linear_init(k1, CNN14_CHANNELS[-1], emb_dim, init="torch")
    params["fc_audioset"] = linear_init(
        k2, emb_dim, kw.get("num_classes", NUM_AUDIOSET_CLASSES), init="torch"
    )
    return params


def cnn14_att_init(key: jax.Array, **kw: Any) -> Params:
    return pann_init(key, CNN14_CHANNELS, att_head=True, **kw)


# ------------------------------------------------------------------ forward
def pann_apply(
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    logmel_cfg: LogMelConfig = PANN_LOGMEL,
    waveform_input: bool = True,
    deterministic: bool = True,
    dropout_p: float = 0.2,
    rng: jax.Array | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    """Cnn10/Cnn14 forward (architecture determined by the params pytree).
    Output contract parity: ``nn/encoders/cnn14.py:27-216``."""
    if waveform_input:
        mel = logmel_spectrogram(waveform, logmel_cfg, compute_dtype=compute_dtype)
        input_time_len = waveform.shape[-1]
    else:
        mel = waveform
        input_time_len = waveform.shape[1]

    if deterministic:
        mel = batch_norm_inference(params["bn0"], mel, axis=-1)
    else:
        mel, _ = batch_norm_train(params["bn0"], mel, axis=-1)

    x = mel[..., None].astype(compute_dtype)  # (B, T, F, 1)
    rngs = (
        jax.random.split(rng, len(params["blocks"]) + 2)
        if rng is not None
        else [None] * (len(params["blocks"]) + 2)
    )
    n_blocks = len(params["blocks"])
    for i, block in enumerate(params["blocks"]):
        # Cnn14-family forwards pool (2,2) on blocks 1-5 and (1,1) on the
        # final block (cnn14.py:174-184); Cnn10 pools all 4 blocks (2,2)
        # (models.py:607-700)
        pool = (1, 1) if (n_blocks == 6 and i == n_blocks - 1) else (2, 2)
        x, _ = conv_block(block, x, pool_size=pool, deterministic=deterministic)
        x = dropout(rngs[i], x, dropout_p, deterministic)

    # (B, T', F', C) → mean over freq
    frames = jnp.mean(x.astype(jnp.float32), axis=2)  # (B, T', C)

    n_out = frames.shape[1]
    reduction = max(input_time_len // max(n_out, 1), 1)
    if waveform_lens is None:
        lens = jnp.full((frames.shape[0],), n_out, jnp.int32)
    else:
        lens = jnp.round(waveform_lens.astype(jnp.float32) / reduction).astype(jnp.int32)

    out: dict[str, Any] = {
        "frame_embs": jnp.swapaxes(frames, 1, 2),  # (B, C, T')
        "frame_embs_lens": lens,
    }

    if "att" in params:
        # Cnn14_DecisionLevelAtt head (cnn14_decisionlevel_att.py:225-245):
        # k3/s1/p1 max+avg smoothing over frames -> fc1 -> per-frame 2048-d
        # embeddings (these ARE the captioning frame_embs for this encoder)
        # -> AttBlock softmax attention pooling.
        from conette_tpu.models.pann_zoo import _pool1d_same

        smoothed = _pool1d_same(frames, "max") + _pool1d_same(frames, "avg")
        h = jax.nn.relu(linear(params["fc1"], smoothed))  # (B, T', 2048)
        out["frame_embs"] = jnp.swapaxes(h, 1, 2)
        att = jax.nn.softmax(
            jnp.clip(linear(params["att"]["att"], h), -10.0, 10.0), axis=1
        )  # (B, T', classes)
        cla = jax.nn.sigmoid(linear(params["att"]["cla"], h))
        clip = jnp.sum(att * cla, axis=1)
        out["clipwise_output"] = clip
        # framewise: upsample segments x32 and pad to the mel frame count
        # (pann_utils/pytorch_utils.py interpolate + pad_framewise_output)
        if waveform_input:
            mel_frames = input_time_len // logmel_cfg.hop_length + 1
        else:
            mel_frames = input_time_len
        up = jnp.repeat(cla, 32, axis=1)
        if up.shape[1] < mel_frames:
            tail = jnp.repeat(up[:, -1:], mel_frames - up.shape[1], axis=1)
            up = jnp.concatenate([up, tail], axis=1)
        else:
            up = up[:, :mel_frames]
        out["framewise_output"] = up
    else:
        x1 = jnp.max(frames, axis=1)
        x2 = jnp.mean(frames, axis=1)
        h = x1 + x2
        h = dropout(rngs[-2], h, 0.5, deterministic)
        h = jax.nn.relu(linear(params["fc1"], h))
        out["clipwise_output"] = jax.nn.sigmoid(linear(params["fc_audioset"], h))
        # reference contract: the penultimate relu(fc1) activations (post
        # second dropout) are returned as "embedding" (models.py:271-277)
        out["embedding"] = dropout(rngs[-1], h, 0.5, deterministic)
    return out


def build_pann_model(name: str, key: jax.Array | None = None) -> tuple[Params, int]:
    """(params, frame_emb_size) by registry name
    (twin of ``nn/pann_utils/hub.py:14-56``)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    name_l = name.lower()
    if name_l == "cnn10":
        return cnn10_init(key), CNN10_CHANNELS[-1]
    if name_l == "cnn14":
        return cnn14_init(key), CNN14_CHANNELS[-1]
    if name_l in ("cnn14_decisionlevelatt", "cnn14_att"):
        return cnn14_att_init(key), CNN14_CHANNELS[-1]
    if name_l == "resnet22":
        from conette_tpu.models.pann_zoo import resnet22_init

        return resnet22_init(key), 2048
    if name_l == "resnet38":
        from conette_tpu.models.pann_zoo import resnet38_init

        return resnet38_init(key), 2048
    if name_l == "resnet54":
        from conette_tpu.models.pann_zoo import resnet54_init

        return resnet54_init(key), 2048
    if name_l.startswith("cnn14_emb"):
        emb_dim = int(name_l.removeprefix("cnn14_emb"))
        return cnn14_emb_init(key, emb_dim), CNN14_CHANNELS[-1]
    if name_l == "mobilenetv1":
        from conette_tpu.models.pann_zoo import mobilenetv1_init

        return mobilenetv1_init(key), 1024
    if name_l == "mobilenetv2":
        from conette_tpu.models.pann_zoo import mobilenetv2_init

        return mobilenetv2_init(key), 1280
    if name_l in ("cnn14_16k", "cnn14_8k"):
        # same Cnn14 body; the 16/8 kHz frontend is a LogMelConfig choice
        # (models.py:3134-3256 / 3257-3379)
        return cnn14_init(key), CNN14_CHANNELS[-1]
    if name_l in ("cnn14_no_specaug", "cnn14_no_dropout", "cnn14_mixup_time_domain"):
        # identical architecture to Cnn14 (models.py:282-496, 3380-3497);
        # the differences are train-time behaviors: SpecAugment off,
        # dropout off (pass dropout_p=0 to pann_apply), mixup applied on the
        # waveform instead of the spectrogram (train/augment.py handles it)
        return cnn14_init(key), CNN14_CHANNELS[-1]
    if name_l == "cnn14_mel32":
        return cnn14_init(key, n_mels=32), CNN14_CHANNELS[-1]
    if name_l == "cnn14_mel128":
        return cnn14_init(key, n_mels=128), CNN14_CHANNELS[-1]
    if name_l in ("cnn14_decisionlevelmax", "cnn14_decisionlevelavg"):
        # Cnn14 pytree; the decision-level head lives in
        # pann_zoo.cnn14_decisionlevel_apply (models.py:3731-3990)
        return cnn14_init(key), CNN14_CHANNELS[-1]
    if name_l in ("leenet11", "leenet24"):
        from conette_tpu.models.pann_zoo import leenet_init

        return leenet_init(key, name_l), 256 if name_l == "leenet11" else 1024
    if name_l == "dainet19":
        from conette_tpu.models.pann_zoo import dainet_init

        return dainet_init(key), 512
    if name_l == "cnn6":
        from conette_tpu.models.pann_zoo import cnn6_init

        return cnn6_init(key), 512
    if name_l == "wavegram_logmel_cnn14":
        from conette_tpu.models.pann_zoo import wavegram_logmel_cnn14_init

        return wavegram_logmel_cnn14_init(key), 2048
    if name_l == "wavegram_cnn14":
        from conette_tpu.models.pann_zoo import wavegram_cnn14_init

        return wavegram_cnn14_init(key), 2048
    if name_l == "wavegram_logmel128_cnn14":
        from conette_tpu.models.pann_zoo import wavegram_logmel128_cnn14_init

        return wavegram_logmel128_cnn14_init(key), 2048
    if name_l in ("res1dnet31", "res1dnet51"):
        from conette_tpu.models.pann_zoo import res1dnet_init

        return res1dnet_init(key, name_l), 2048
    raise ValueError(
        f"Unknown PANN model {name!r}. (expected one of {sorted(PANN_ZOO_NAMES)})"
    )


#: the full reference zoo surface (nn/pann_utils/models.py — 42 classes incl.
#: the emb-dim and frontend variants), all buildable via build_pann_model
PANN_ZOO_NAMES = frozenset(
    {
        "cnn6", "cnn10", "cnn14", "cnn14_16k", "cnn14_8k", "cnn14_mel32",
        "cnn14_mel128", "cnn14_no_specaug", "cnn14_no_dropout",
        "cnn14_mixup_time_domain", "cnn14_emb512", "cnn14_emb128",
        "cnn14_emb32", "cnn14_decisionlevelatt", "cnn14_decisionlevelmax",
        "cnn14_decisionlevelavg", "resnet22", "resnet38", "resnet54",
        "res1dnet31", "res1dnet51", "mobilenetv1", "mobilenetv2",
        "leenet11", "leenet24", "dainet19", "wavegram_cnn14",
        "wavegram_logmel_cnn14", "wavegram_logmel128_cnn14",
    }
)


def apply_pann_model(
    name: str,
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    deterministic: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jax.Array]:
    """Unified forward dispatcher over the whole zoo: every name accepted by
    ``build_pann_model`` runs through the matching apply with the right
    frontend config. Mirrors the reference's ``classtype(**kwargs)`` +
    ``model(input)`` flow (``pann_utils/hub.py:14-56``)."""
    from conette_tpu.models import pann_zoo as zoo

    name_l = name.lower()
    kw: dict[str, Any] = dict(
        deterministic=deterministic, compute_dtype=compute_dtype
    )
    if name_l in ("cnn10", "cnn14", "cnn14_decisionlevelatt", "cnn14_att",
                  "cnn14_emb512", "cnn14_emb128", "cnn14_emb32",
                  "cnn14_no_specaug", "cnn14_mixup_time_domain"):
        return pann_apply(params, waveform, waveform_lens, **kw)
    if name_l == "cnn14_no_dropout":
        return pann_apply(params, waveform, waveform_lens, dropout_p=0.0, **kw)
    if name_l == "cnn14_16k":
        return pann_apply(
            params, waveform, waveform_lens, logmel_cfg=zoo.PANN_LOGMEL_16K, **kw
        )
    if name_l == "cnn14_8k":
        return pann_apply(
            params, waveform, waveform_lens, logmel_cfg=zoo.PANN_LOGMEL_8K, **kw
        )
    if name_l == "cnn14_mel32":
        return pann_apply(
            params, waveform, waveform_lens, logmel_cfg=zoo.PANN_LOGMEL32, **kw
        )
    if name_l == "cnn14_mel128":
        return pann_apply(
            params, waveform, waveform_lens, logmel_cfg=zoo.PANN_LOGMEL128, **kw
        )
    if name_l in ("cnn14_decisionlevelmax", "cnn14_decisionlevelavg"):
        pooling = "max" if name_l.endswith("max") else "avg"
        return zoo.cnn14_decisionlevel_apply(
            params, waveform, waveform_lens, pooling=pooling, **kw
        )
    if name_l in ("resnet22", "resnet38"):
        return zoo.pann_zoo_apply(params, waveform, waveform_lens,
                                  arch="resnet22", **kw)
    if name_l == "resnet54":
        return zoo.resnet54_apply(params, waveform, waveform_lens, **kw)
    if name_l == "mobilenetv1":
        return zoo.pann_zoo_apply(params, waveform, waveform_lens,
                                  arch="mobilenetv1", **kw)
    if name_l == "mobilenetv2":
        return zoo.mobilenetv2_apply(params, waveform, waveform_lens, **kw)
    if name_l == "cnn6":
        return zoo.cnn6_apply(params, waveform, waveform_lens, **kw)
    if name_l in ("leenet11", "leenet24"):
        return zoo.leenet_apply(params, waveform, **kw)
    if name_l == "dainet19":
        return zoo.dainet_apply(params, waveform, **kw)
    if name_l in ("res1dnet31", "res1dnet51"):
        return zoo.res1dnet_apply(params, waveform, **kw)
    if name_l == "wavegram_cnn14":
        return zoo.wavegram_cnn14_apply(params, waveform, **kw)
    if name_l == "wavegram_logmel_cnn14":
        return zoo.wavegram_logmel_cnn14_apply(params, waveform, waveform_lens, **kw)
    if name_l == "wavegram_logmel128_cnn14":
        return zoo.wavegram_logmel128_cnn14_apply(
            params, waveform, waveform_lens, **kw
        )
    raise ValueError(f"Unknown PANN model {name!r}.")
