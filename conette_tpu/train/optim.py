"""Optimizers + LR schedules (optax).

Parity with the reference optimizer factory
(``src/conette/optim/optimizers.py:17-81`` — Adam/AdamW/SGD with
``use_custom_wd`` splitting no-decay (1-d/bias) from decay params) and
scheduler list (``optim/schedulers.py:19-125`` — ``cos_decay``
0.5·(1+cos(π·step/n)), Noam ``trf``, MultiStepLR, none). Production recipe:
AdamW lr 5e-4, wd 2.0 (custom split), cosine decay over max_epochs
(``conf/pl/conette.yaml``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

Params = Any


def decay_mask(params: Params) -> Params:
    """True for parameters that receive weight decay: ndim >= 2
    (reference custom-wd split: 1-d tensors and biases are excluded)."""
    return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)


def cos_decay_schedule(base_lr: float, n_steps: int) -> Callable[[jax.Array], jax.Array]:
    """lr(step) = base · 0.5 · (1 + cos(π · step / n))
    (``optim/schedulers.py:95-112``)."""

    def fn(step):
        frac = jnp.minimum(step / max(n_steps, 1), 1.0)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

    return fn


def trf_schedule(d_model: int, warmup_steps: int = 4000) -> Callable:
    """Noam/Transformer schedule (``optim/schedulers.py:115-125``)."""

    def fn(step):
        s = jnp.maximum(step.astype(jnp.float32), 1.0)
        return d_model ** (-0.5) * jnp.minimum(s ** (-0.5), s * warmup_steps ** (-1.5))

    return fn


def multistep_schedule(base_lr: float, milestones: list[int], gamma: float = 0.1) -> Callable:
    def fn(step):
        lr = base_lr
        factor = jnp.asarray(1.0)
        for m in milestones:
            factor = factor * jnp.where(step >= m, gamma, 1.0)
        return lr * factor

    return fn


def get_schedule(
    name: str,
    base_lr: float,
    n_steps: int,
    d_model: int = 256,
    milestones: list[int] | None = None,
) -> Callable:
    if name == "cos_decay":
        return cos_decay_schedule(base_lr, n_steps)
    if name == "trf":
        return trf_schedule(d_model)
    if name == "multistep":
        return multistep_schedule(base_lr, milestones or [n_steps // 2])
    if name in ("none", None):
        return lambda step: jnp.asarray(base_lr)
    raise ValueError(
        f"Unknown scheduler {name!r}. "
        "(expected one of ('cos_decay', 'trf', 'multistep', 'none'))"
    )


def get_optimizer(
    params: Params,
    optim_name: str = "AdamW",
    lr: float = 5e-4,
    weight_decay: float = 2.0,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    use_custom_wd: bool = True,
    sched_name: str = "cos_decay",
    sched_n_steps: int = 400,
) -> tuple[optax.GradientTransformation, Any]:
    """Build the optax optimizer + initial state for a parameter pytree."""
    schedule = get_schedule(sched_name, lr, sched_n_steps)
    mask = decay_mask(params) if use_custom_wd else None

    if optim_name.lower() == "adamw":
        tx = optax.adamw(
            learning_rate=schedule,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
            mask=mask,
        )
    elif optim_name.lower() == "adam":
        tx = optax.adam(learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif optim_name.lower() == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.sgd(learning_rate=schedule, momentum=0.9),
        )
    else:
        raise ValueError(
            f"Unknown optimizer {optim_name!r}. (expected AdamW, Adam or SGD)"
        )
    return tx, tx.init(params)


# ------------------------------------------------------------- EMA / SWA
def ema_update(ema_params: Params, params: Params, decay: float = 0.999) -> Params:
    """Exponential moving average of weights (twin of the reference's
    optional EMA callback, ``train.py:167-280`` callback assembly)."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )


def swa_update(swa_params: Params, params: Params, n_averaged: int) -> Params:
    """Stochastic weight averaging step: running mean over snapshots
    (twin of the reference's optional SWA callback)."""
    return jax.tree.map(
        lambda s, p: s + (p - s) / float(n_averaged + 1), swa_params, params
    )
