"""ConvNeXt-Tiny audio tagger in functional JAX (NHWC, TPU layout).

Capability twin of the reference production encoder
(``src/conette/nn/encoders/convnext.py:105-426``): log-mel frontend →
per-mel-bin BatchNorm → audio stem Conv(4,4)/s(4,4)/pad(time=4) →
4 stages of depths [3,3,9,3], dims [96,192,384,768] with 3 downsampling
convs → frequency-mean frame embeddings (B, T', 768) + AudioSet clip head
(max+mean time pool → LN → Linear(768,527) → sigmoid).

TPU-first differences from the reference implementation:
- NHWC activations (XLA TPU native) instead of NCHW; the reference's
  channels-first LayerNorm becomes a plain last-axis LayerNorm;
- the whole encoder is a pure function of a parameter pytree, jit/pjit
  friendly, with optional bfloat16 compute and f32 accumulation;
- frame-embedding lengths are computed from static shapes
  (``frame_embs_lens = round(input_len / reduction)``, parity with
  ``convnext.py:309-315``).
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
    drop_path,
    gelu,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from conette_tpu.ops.frontend import DEFAULT_LOGMEL, LogMelConfig, logmel_spectrogram

# Keep the encoder in the stage-padded layout across the stem + downsample
# seams (no pad/unpad copies of the big activations). Measured WORSE on
# v5e (+4.6 ms end-to-end, 150.8 vs 146.2 ms interleaved A/B, PROFILE.md
# r3): the padded-lane conv FLOPs and the lost slice-into-LN fusion
# outweigh the copy savings. Kept as a tested, reproducible design point.
_PADDED_SEAMS = False

# Route the LN+conv2x2s2 downsample seams through the fused Pallas kernel
# (ops/pallas/downsample.py) when the fused-block path already has the
# activation in the stage-padded layout: one HBM read + write per seam
# instead of ~4 passes + the slice/re-pad copies (r4, in-trace A/B in
# PROFILE.md).
_FUSED_SEAMS = True

DEPTHS = (3, 3, 9, 3)
DIMS = (96, 192, 384, 768)
NUM_AUDIOSET_CLASSES = 527
LN_EPS = 1e-6


def convnext_init(
    key: jax.Array,
    in_chans: int = 1,
    num_classes: int = NUM_AUDIOSET_CLASSES,
    depths: tuple[int, ...] = DEPTHS,
    dims: tuple[int, ...] = DIMS,
    layer_scale_init_value: float = 1e-6,
    n_mels: int = 224,
    stem_kernel: tuple[int, int] = (4, 4),
    stem_stride: tuple[int, int] = (4, 4),
) -> Params:
    """Initialize the ConvNeXt parameter pytree (trunc_normal(0.02) weights,
    zero biases; parity with ``convnext.py:241-249,422-423``)."""
    keys = iter(jax.random.split(key, 64))
    params: Params = {
        "bn0": batch_norm_init(n_mels),
        "stem": {
            "conv": conv2d_init(next(keys), in_chans, dims[0], stem_kernel),
            "norm": layer_norm_init(dims[0]),
        },
        "downsample": [],
        "stages": [],
        "norm": layer_norm_init(dims[-1]),
        "head_audioset": linear_init(
            next(keys), dims[-1], num_classes, init="trunc_normal"
        ),
    }
    for i in range(3):
        params["downsample"].append(
            {
                "norm": layer_norm_init(dims[i]),
                "conv": conv2d_init(next(keys), dims[i], dims[i + 1], (2, 2)),
            }
        )
    for i, depth in enumerate(depths):
        stage = []
        for _ in range(depth):
            dim = dims[i]
            stage.append(
                {
                    "dwconv": conv2d_init(next(keys), dim, dim, (7, 7), groups=dim),
                    "norm": layer_norm_init(dim),
                    "pwconv1": linear_init(next(keys), dim, 4 * dim, init="trunc_normal"),
                    "pwconv2": linear_init(next(keys), 4 * dim, dim, init="trunc_normal"),
                    "scale": jnp.full((dim,), layer_scale_init_value, jnp.float32),
                }
            )
        params["stages"].append(stage)
    return params


def convnext_block(
    params: Params,
    x: jax.Array,
    *,
    drop_path_rate: float = 0.0,
    deterministic: bool = True,
    rng: jax.Array | None = None,
) -> jax.Array:
    """dwconv7x7 → LN → pwconv(4x) → GELU → pwconv → layer-scale → residual
    (parity: ``convnext.py:61-74``). Runs in NHWC; the pointwise convs are
    MXU matmuls over the channel axis. The XLA lowering of this path is the
    reference-precision route; the bf16 inference fast path is the fully
    fused Pallas kernel (``ops/pallas/convnext_block.py``)."""
    shortcut = x
    dim = x.shape[-1]
    y = conv2d(params["dwconv"], x, padding=((3, 3), (3, 3)), groups=dim)
    y = layer_norm(params["norm"], y, eps=LN_EPS)
    y = linear(params["pwconv1"], y)
    y = gelu(y)
    y = linear(params["pwconv2"], y)
    y = y * params["scale"].astype(y.dtype)
    y = drop_path(rng, y, drop_path_rate, deterministic)
    return shortcut + y


def _stage_fusible_shape(
    shape: tuple[int, int, int, int],
    dtype: Any,
    deterministic: bool,
    drop_path_rate: float,
) -> bool:
    """The fused Pallas block kernel handles inference (no drop-path rng)
    on time lengths with a usable tile divisor, when the stage's weights +
    tile buffers fit the VMEM plan (e.g. the C=768 stage at f32 does not).
    ``shape`` is the REAL (b, t, f, c) extent (pre-padding)."""
    from conette_tpu.ops.pallas.convnext_block import plan_block

    if not (deterministic or drop_path_rate == 0.0):
        return False
    b, t, f, c = shape
    f_pad = f + (-f) % 8
    cp = c + (-c) % 128
    itemsize = jnp.dtype(dtype).itemsize
    return plan_block(t, f_pad, cp, 4 * c, itemsize, b) is not None


def _stage_fusible(y: jax.Array, deterministic: bool, drop_path_rate: float) -> bool:
    return _stage_fusible_shape(y.shape, y.dtype, deterministic, drop_path_rate)


def _padded_layer_norm(
    p: Params, y: jax.Array, c_real: int, eps: float
) -> jax.Array:
    """LayerNorm over the REAL channels of a zero-lane-padded NHWC tensor.
    Padded lanes are exactly zero, so plain full-lane sums ÷ ``c_real``
    give the real-lane stats (same invariant the fused block kernel uses),
    and the zero-padded affine re-zeroes the padded lanes."""
    from conette_tpu.ops.pallas.convnext_block import pad_channels

    c_pad = y.shape[-1]
    x32 = y.astype(jnp.float32)
    mean = jnp.sum(x32, axis=-1, keepdims=True) / c_real
    sumsq = jnp.sum(x32 * x32, axis=-1, keepdims=True) / c_real
    var = sumsq - mean * mean
    xhat = (x32 - mean) * jax.lax.rsqrt(var + eps)
    w = pad_channels(p["weight"], c_pad)
    b = pad_channels(p["bias"], c_pad)
    return (xhat * w + b).astype(y.dtype)


def _padded_stem(params: Params, x: jax.Array, stride, padding) -> tuple[jax.Array, int, int]:
    """Stem conv + LN emitting the stage-padded layout directly (out
    channels zero-padded to 128 lanes) — skips the full-size ``pad_fc``
    copy of the stage-1 input, the largest tensor in the encoder."""
    from conette_tpu.ops.pallas.convnext_block import pad_channels

    w = params["stem"]["conv"]["weight"]  # (4, 4, 1, C)
    c_real = w.shape[-1]
    c_pad = c_real + (-c_real) % 128
    wp = pad_channels(w, c_pad, axis=3)
    bp = pad_channels(params["stem"]["conv"]["bias"], c_pad)
    y = jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), stride, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = (y + bp.astype(jnp.float32)).astype(x.dtype)
    f_real = y.shape[2]
    # LN BEFORE the freq pad: LN of an all-zero padded column would be
    # 0·gamma + beta = beta ≠ 0, violating the block kernel's zero-padded-F
    # invariant (its stencil reads padded columns as halo)
    y = _padded_layer_norm(params["stem"]["norm"], y, c_real, LN_EPS)
    pad_f = (-f_real) % 8
    if pad_f:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, pad_f), (0, 0)))
    return y, f_real, c_real


def _padded_downsample(
    ds: Params, y: jax.Array, f_real: int, c_real: int
) -> tuple[jax.Array, int, int]:
    """LN + 2×2/2 downsample conv directly on the stage-padded layout —
    replaces the unpad-slice → LN → conv → re-pad round trip between fused
    stage chains. Zero-padded weights/bias make padded input lanes inert
    and keep padded output lanes zero; output freq columns beyond the new
    real extent are re-zeroed (the conv bias would otherwise leak into
    them) and the freq axis is re-padded to the next 8-multiple."""
    from conette_tpu.ops.pallas.convnext_block import pad_channels

    assert f_real % 2 == 0, f_real  # ConvNeXt-Tiny boundaries are all even
    y = _padded_layer_norm(ds["norm"], y, c_real, LN_EPS)
    w = ds["conv"]["weight"]  # (2, 2, Cin, Cout)
    c_out = w.shape[-1]
    cp_in = y.shape[-1]
    cp_out = c_out + (-c_out) % 128
    wp = pad_channels(pad_channels(w, cp_in, axis=2), cp_out, axis=3)
    bp = pad_channels(ds["conv"]["bias"], cp_out)
    yc = jax.lax.conv_general_dilated(
        y, wp.astype(y.dtype), (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    yc = (yc + bp.astype(jnp.float32)).astype(y.dtype)
    f_next = f_real // 2
    if yc.shape[2] > f_next:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, yc.shape[2], 1), 2)
        yc = jnp.where(col < f_next, yc, jnp.zeros_like(yc))
    pad_f = (-yc.shape[2]) % 8
    if pad_f:
        yc = jnp.pad(yc, ((0, 0), (0, 0), (0, pad_f), (0, 0)))
    return yc, f_next, c_out


def convnext_features(
    params: Params,
    x: jax.Array,
    *,
    stem_stride: tuple[int, int] = (4, 4),
    stem_padding: tuple[tuple[int, int], tuple[int, int]] = ((4, 4), (0, 0)),
    deterministic: bool = True,
    drop_path_rate: float = 0.0,
    rng: jax.Array | None = None,
    fused_block: bool = False,
    fused_interpret: bool = False,
    fused_transpose: str = "auto",
) -> jax.Array:
    """(B, T, F, 1) NHWC log-mel → (B, T', F', 768) feature map.

    ``fused_block`` routes each stage through the fully-fused Pallas block
    kernel (``ops/pallas/convnext_block.py``), and the whole encoder stays
    in the stage-padded (F→8k, C→128k, zero-pad) layout end to end: the
    stem emits it directly and the downsample LN+conv consume/produce it
    (``_padded_stem`` / ``_padded_downsample``) — one HBM read + write per
    block and no pad/unpad copies of the big activations between stages.
    Stages whose VMEM plan does not fit fall back to the XLA blocks (the
    tensor is sliced back to the real extent for them).

    ``fused_transpose``: "never" | "auto" | "always" — run narrow-F fused
    stages with time and freq SWAPPED (the 7x7 depthwise stencil is
    T/F-symmetric, so only the tap axes of the depthwise weight
    transpose). At the production shapes this targets stage 3 (T=62,
    F=14), whose normal plan packs 2 batch rows with 8 zero gap columns
    (28 real of 40 stencil columns); transposed it runs a single
    (t=14, F=64) tile at 62/64 geometric efficiency with 64-wide sublane
    extents. "auto" applies the measured-margin heuristic
    (``stage_transpose_wins``); "always" transposes any stage with a
    transposed VMEM plan (testing). Default "auto" — the on-chip A/B
    (PROFILE.md r5, batch 384) measured stage 3 at 172.6 ms normal vs
    132.7 ms transposed (medians), encoder e2e 435.9 vs 392.7 ms."""
    padded = False
    f_real = c_real = 0
    if fused_block and _PADDED_SEAMS:
        y, f_real, c_real = _padded_stem(params, x, stem_stride, stem_padding)
        padded = True
    else:
        y = conv2d(params["stem"]["conv"], x, stride=stem_stride, padding=stem_padding)
        y = layer_norm(params["stem"]["norm"], y, eps=LN_EPS)

    depths = [len(s) for s in params["stages"]]
    total = sum(depths)
    block_idx = 0
    for i, stage in enumerate(params["stages"]):
        if i > 0:
            ds = params["downsample"][i - 1]
            fused_seam = False
            if padded and _FUSED_SEAMS and not _PADDED_SEAMS:
                from conette_tpu.ops.pallas.downsample import (
                    _round128,
                    fused_downsample_padded,
                    plan_downsample,
                )

                c2 = ds["conv"]["weight"].shape[-1]
                fused_seam = (
                    f_real % 2 == 0
                    and y.shape[1] >= 2
                    and plan_downsample(
                        y.shape[1] // 2,
                        y.shape[2],
                        y.shape[3],
                        _round128(c2),
                        jnp.dtype(y.dtype).itemsize,
                    )
                    is not None
                )
                if fused_seam:
                    y = fused_downsample_padded(
                        y, f_real, c_real,
                        ds["norm"]["weight"], ds["norm"]["bias"],
                        ds["conv"]["weight"], ds["conv"]["bias"],
                        eps=LN_EPS,
                        interpret=fused_interpret,
                    )
                    f_real //= 2
                    c_real = c2
            if not fused_seam:
                if padded and _PADDED_SEAMS:
                    y, f_real, c_real = _padded_downsample(ds, y, f_real, c_real)
                else:
                    if padded:
                        y = y[:, :, :f_real, :c_real]
                        padded = False
                    y = layer_norm(ds["norm"], y, eps=LN_EPS)
                    y = conv2d(ds["conv"], y, stride=(2, 2))

        real_shape = (
            (y.shape[0], y.shape[1], f_real, c_real) if padded else y.shape
        )
        if fused_block and _stage_fusible_shape(
            real_shape, y.dtype, deterministic, drop_path_rate
        ):
            from conette_tpu.ops.pallas.convnext_block import (
                fused_convnext_block_padded,
                pad_fc,
                stage_transpose_wins,
                transposed_stage_plan,
            )

            if not padded:
                _, _, f_real, c_real = y.shape
                y = pad_fc(y)
                padded = True
            h_dim = stage[0]["pwconv1"]["weight"].shape[1]
            itemsize = jnp.dtype(y.dtype).itemsize
            t_len = y.shape[1]
            if fused_transpose == "always":
                tr = (
                    transposed_stage_plan(
                        t_len, f_real, y.shape[3], h_dim, itemsize, y.shape[0]
                    )
                    is not None
                )
            elif fused_transpose == "auto":
                tr = stage_transpose_wins(
                    t_len, y.shape[2], f_real, y.shape[3], h_dim, itemsize,
                    y.shape[0],
                )
            else:
                tr = False
            if tr:
                # swap time<->freq for this stage: slice the freq pad off
                # (padded rows would otherwise become nonzero interior time
                # rows after the first block and contaminate the 7-tap time
                # halo), transpose, re-pad the new freq (= old time) axis
                y = jnp.swapaxes(y[:, :, :f_real, :], 1, 2)
                y = jnp.pad(y, ((0, 0), (0, 0), (0, (-t_len) % 8), (0, 0)))
                stage_f_real = t_len
            else:
                stage_f_real = f_real
            for block in stage:
                dw = block["dwconv"]["weight"]
                if tr:
                    dw = jnp.swapaxes(dw[:, :, 0, :] if dw.ndim == 4 else dw, 0, 1)
                y = fused_convnext_block_padded(
                    y,
                    stage_f_real,
                    c_real,
                    dw,
                    block["dwconv"]["bias"],
                    block["norm"]["weight"],
                    block["norm"]["bias"],
                    block["pwconv1"]["weight"],
                    block["pwconv1"]["bias"],
                    block["pwconv2"]["weight"],
                    block["pwconv2"]["bias"],
                    block["scale"],
                    eps=LN_EPS,
                    interpret=fused_interpret,
                )
                block_idx += 1
            if tr:
                # back to the canonical padded layout for the next seam
                y = jnp.swapaxes(y[:, :, :t_len, :], 1, 2)
                y = jnp.pad(y, ((0, 0), (0, 0), (0, (-f_real) % 8), (0, 0)))
            continue
        if padded:
            y = y[:, :, :f_real, :c_real]
            padded = False
        for block in stage:
            dp = drop_path_rate * block_idx / max(total - 1, 1)
            brng = (
                jax.random.fold_in(rng, block_idx) if rng is not None else None
            )
            y = convnext_block(
                block,
                y,
                drop_path_rate=dp,
                deterministic=deterministic,
                rng=brng,
            )
            block_idx += 1
    if padded:
        y = y[:, :, :f_real, :c_real]
    return y


def convnext_apply(
    params: Params,
    waveform: jax.Array,
    waveform_lens: jax.Array | None = None,
    *,
    logmel_cfg: LogMelConfig = DEFAULT_LOGMEL,
    waveform_input: bool = True,
    return_frame_outputs: bool = True,
    return_clip_outputs: bool = True,
    deterministic: bool = True,
    drop_path_rate: float = 0.0,
    rng: jax.Array | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
    spec_augment_fn: Any = None,
    use_fused_frontend: bool | None = None,
    use_fused_block: bool | None = None,
    fused_interpret: bool = False,
    fused_transpose: str = "auto",
) -> dict[str, jax.Array]:
    """Full encoder forward.

    :param waveform: (B, T_samples) if ``waveform_input`` else a
        (B, T_frames, n_mels) precomputed log-mel spectrogram.
    :param waveform_lens: (B,) true (unpadded) lengths along the time axis
        of ``waveform`` (samples or frames); defaults to full length.
    :returns: dict with ``frame_embs`` (B, T', 768), ``frame_embs_lens``
        (B,), and ``clipwise_output`` (B, 527).
    Output contract parity: ``convnext.py:264-336``.
    """
    if use_fused_frontend is None:
        # Default OFF: on v5e the XLA-fused jnp path currently beats the
        # Pallas kernel end-to-end (the gather→matmul chain fuses well and
        # avoids the kernel's lane-padding copies); the kernel stays
        # available and golden-tested for explicit opt-in.
        use_fused_frontend = False

    bn_stats = None
    if waveform_input and use_fused_frontend and deterministic:
        # Fused Pallas frontend with the inference BN folded into the
        # kernel's affine epilogue (ops/pallas/logmel.py).
        from conette_tpu.ops.pallas.logmel import fused_logmel

        bn = params["bn0"]
        scale = bn["weight"] * jax.lax.rsqrt(bn["running_var"] + 1e-5)
        shift = bn["bias"] - bn["running_mean"] * scale
        mel = fused_logmel(
            waveform, logmel_cfg, bn_scale=scale, bn_shift=shift,
            compute_dtype=compute_dtype,
        )
        input_time_len = waveform.shape[-1]
    else:
        if waveform_input:
            mel = logmel_spectrogram(waveform, logmel_cfg, compute_dtype=compute_dtype)
            input_time_len = waveform.shape[-1]
        else:
            mel = waveform
            input_time_len = waveform.shape[1]
        # (B, T, F) → BN over mel bins (reference bn0 transpose trick,
        # convnext.py:290-292) → NHWC (B, T, F, 1)
        if deterministic:
            mel = batch_norm_inference(params["bn0"], mel, axis=-1)
        else:
            mel, bn_stats = batch_norm_train(params["bn0"], mel, axis=-1)

    if spec_augment_fn is not None and not deterministic:
        mel = spec_augment_fn(mel)

    x = mel[..., None].astype(compute_dtype)

    if use_fused_block is None:
        # Default ON for bf16 TPU inference: the fully-fused ConvNeXt block
        # Pallas kernel (dwconv+LN+MLP+residual in one VMEM pass,
        # double-buffered halo DMA) beats the XLA lowering on v5e
        # (PROFILE.md r2). Restricted to bf16 because the kernel's
        # tanh-form GELU (~3e-4 abs) and single-pass LN sit below the bf16
        # ulp but NOT below f32 resolution -- f32 runs (the
        # reference-equivalent precision used by the greedy bit-match
        # gate) keep the exact-erf XLA path. CONETTE_FUSED_BLOCK=0 forces
        # it off (e.g. to trade peak throughput for cold-start compile
        # time); use_fused_block=True opts an f32 run in explicitly.
        import os

        use_fused_block = (
            deterministic
            and jax.default_backend() == "tpu"
            and jnp.dtype(compute_dtype) == jnp.bfloat16
            and os.environ.get("CONETTE_FUSED_BLOCK", "1") != "0"
        )
    feats = convnext_features(
        params,
        x,
        deterministic=deterministic,
        drop_path_rate=drop_path_rate,
        rng=rng,
        fused_block=use_fused_block,
        fused_interpret=fused_interpret,
        fused_transpose=fused_transpose,
    )
    # (B, T', F', C) → mean over frequency → (B, T', C)
    frames = jnp.mean(feats.astype(jnp.float32), axis=2)

    out: dict[str, Any] = {}
    if return_frame_outputs:
        n_out = frames.shape[1]
        reduction = input_time_len // n_out
        if waveform_lens is None:
            lens = jnp.full((waveform.shape[0],), n_out, jnp.int32)
        else:
            lens = jnp.round(waveform_lens.astype(jnp.float32) / reduction).astype(
                jnp.int32
            )
        # frame_embs returned time-major-last (B, C, T') as the reference
        # does (consumers transpose as needed).
        out["frame_embs"] = jnp.swapaxes(frames, 1, 2)
        out["frame_embs_lens"] = lens

    if return_clip_outputs:
        pooled = jnp.max(frames, axis=1) + jnp.mean(frames, axis=1)
        pooled = layer_norm(params["norm"], pooled, eps=LN_EPS)
        logits = linear(params["head_audioset"], pooled)
        out["clipwise_output"] = jax.nn.sigmoid(logits.astype(jnp.float32))

    if bn_stats is not None:
        out["bn0_stats"] = bn_stats
    return out


def frame_reduction_factor(n_samples: int, logmel_cfg: LogMelConfig = DEFAULT_LOGMEL) -> int:
    """Waveform-samples → output-frames reduction factor for a given clip
    length (stem /4 then 3 × /2 on the spectrogram time axis)."""
    n_frames = 1 + n_samples // logmel_cfg.hop_length
    t = (n_frames + 8) // 4  # stem pad 4+4, stride 4
    for _ in range(3):
        t = t // 2
    return n_samples // t
