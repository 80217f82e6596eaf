"""Primitive NN layers as pure functions over parameter pytrees.

TPU-first design decisions:
- parameters are plain nested dicts (pytrees) — trivially shardable with
  ``jax.sharding`` and serializable without framework baggage;
- activations run in a configurable ``compute_dtype`` (bfloat16 on TPU)
  with float32 parameters and float32 matmul accumulation
  (``preferred_element_type``);
- convolutions use NHWC layout (XLA TPU native) with HWIO kernels.

Numerical contracts mirror the reference building blocks:
- ``layer_norm`` == torch ``F.layer_norm`` / the reference's channels-first
  LayerNorm (``src/conette/nn/modules/norm.py:30-42``; in NHWC the channel
  axis is last so both variants are one function);
- ``gelu`` is the exact (erf) variant, matching torch ``nn.GELU`` default;
- ``batch_norm_inference`` matches torch ``BatchNorm2d.eval()``.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ---------------------------------------------------------------- init utils
def trunc_normal(key: jax.Array, shape: Sequence[int], std: float = 0.02) -> jax.Array:
    """Truncated normal on [-2std, 2std] (reference ``trunc_normal_`` /
    timm convention)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, tuple(shape), jnp.float32)


def uniform_fan_in(key: jax.Array, shape: Sequence[int], fan_in: int) -> jax.Array:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(
        key, tuple(shape), jnp.float32, minval=-bound, maxval=bound
    )


def xavier_uniform(key: jax.Array, shape: Sequence[int]) -> jax.Array:
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        key, tuple(shape), jnp.float32, minval=-bound, maxval=bound
    )


# -------------------------------------------------------------------- linear
def linear_init(
    key: jax.Array,
    in_features: int,
    out_features: int,
    init: str = "torch",
    std: float = 0.02,
) -> Params:
    kw, kb = jax.random.split(key)
    if init == "torch":
        weight = uniform_fan_in(kw, (in_features, out_features), in_features)
        bias = uniform_fan_in(kb, (out_features,), in_features)
    elif init == "trunc_normal":
        weight = trunc_normal(kw, (in_features, out_features), std)
        bias = jnp.zeros((out_features,), jnp.float32)
    elif init == "xavier":
        weight = xavier_uniform(kw, (in_features, out_features))
        bias = jnp.zeros((out_features,), jnp.float32)
    else:
        raise ValueError(f"Unknown linear {init=}")
    return {"weight": weight, "bias": bias}


def linear(params: Params, x: jax.Array) -> jax.Array:
    y = jnp.dot(
        x, params["weight"].astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (y + params["bias"].astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------- layer norm
def layer_norm_init(dim: int) -> Params:
    return {"weight": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, computed in float32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["weight"] + params["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------- batch norm
def batch_norm_init(dim: int) -> Params:
    return {
        "weight": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "running_mean": jnp.zeros((dim,), jnp.float32),
        "running_var": jnp.ones((dim,), jnp.float32),
    }


def batch_norm_inference(
    params: Params, x: jax.Array, axis: int = -1, eps: float = 1e-5
) -> jax.Array:
    """Inference-mode BN over the ``axis`` channel dimension using running
    stats (torch ``BatchNorm2d.eval()`` semantics)."""
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    scale = (params["weight"] * jax.lax.rsqrt(params["running_var"] + eps)).reshape(shape)
    shift = (params["bias"] - params["running_mean"] * scale.reshape(-1)).reshape(shape)
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


def batch_norm_train(
    params: Params, x: jax.Array, axis: int = -1, eps: float = 1e-5, momentum: float = 0.1
) -> tuple[jax.Array, Params]:
    """Training-mode BN: batch stats + updated running stats (returned, not
    mutated — functional twin of torch BatchNorm2d.train())."""
    reduce_axes = tuple(i for i in range(x.ndim) if i != (axis % x.ndim))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=reduce_axes)
    var = jnp.var(x32, axis=reduce_axes)
    n = np.prod([x.shape[i] for i in reduce_axes])
    unbiased_var = var * (n / max(n - 1, 1))
    new_stats = {
        "weight": params["weight"],
        "bias": params["bias"],
        "running_mean": (1 - momentum) * params["running_mean"] + momentum * mean,
        "running_var": (1 - momentum) * params["running_var"] + momentum * unbiased_var,
    }
    shape = [1] * x.ndim
    shape[axis % x.ndim] = x.shape[axis]
    y = (x32 - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + eps)
    y = y * params["weight"].reshape(shape) + params["bias"].reshape(shape)
    return y.astype(x.dtype), new_stats


# ------------------------------------------------------------------- conv 2d
def conv2d_init(
    key: jax.Array,
    in_chans: int,
    out_chans: int,
    kernel_size: tuple[int, int],
    groups: int = 1,
    init: str = "trunc_normal",
    std: float = 0.02,
) -> Params:
    kw, kb = jax.random.split(key)
    kh, kw_ = kernel_size
    shape = (kh, kw_, in_chans // groups, out_chans)  # HWIO
    if init == "trunc_normal":
        weight = trunc_normal(kw, shape, std)
        bias = jnp.zeros((out_chans,), jnp.float32)
    elif init == "torch":
        fan_in = (in_chans // groups) * kh * kw_
        weight = uniform_fan_in(kw, shape, fan_in)
        bias = uniform_fan_in(kb, (out_chans,), fan_in)
    else:
        raise ValueError(f"Unknown conv {init=}")
    return {"weight": weight, "bias": bias}


def conv2d(
    params: Params,
    x: jax.Array,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0)),
    groups: int = 1,
) -> jax.Array:
    """NHWC conv with HWIO kernel; float32 accumulation."""
    y = jax.lax.conv_general_dilated(
        x,
        params["weight"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return (y + params["bias"].astype(jnp.float32)).astype(x.dtype)


# -------------------------------------------------------------- activations
def gelu(x: jax.Array) -> jax.Array:
    """Exact erf GELU (torch nn.GELU default)."""
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------- embedding
def embedding_init(
    key: jax.Array, vocab_size: int, dim: int, padding_idx: int | None = None
) -> Params:
    weight = jax.random.normal(key, (vocab_size, dim), jnp.float32)
    if padding_idx is not None:
        weight = weight.at[padding_idx].set(0.0)
    return {"weight": weight}


def embedding(params: Params, ids: jax.Array, dtype: jnp.dtype = jnp.float32) -> jax.Array:
    return params["weight"].astype(dtype)[ids]


# ------------------------------------------------------------------ dropout
def dropout(
    key: jax.Array | None, x: jax.Array, rate: float, deterministic: bool
) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(
    key: jax.Array | None, x: jax.Array, rate: float, deterministic: bool
) -> jax.Array:
    """Stochastic depth on the batch axis (reference ``DropPath``)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
