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
    """lr(step) = base · 0.5 · (1 + cos(π · min(step, n-1) / n))
    (``optim/schedulers.py:95-112``; ``CosDecayRule`` clamps the step at
    ``n_steps - 1``, so the lr floors at the last-step value instead of 0
    — proven against the reference's actual rule in
    ``tests/test_reference_optim_parity.py``)."""

    def fn(step):
        n = max(n_steps, 1)
        frac = jnp.minimum(jnp.asarray(step, jnp.float32), n - 1) / n
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


def swalr_schedule(
    base_lr: float,
    swa_lr: float = 0.05,
    anneal_epochs: int = 20,
    anneal_strategy: str = "linear",
) -> Callable:
    """SWALR twin (torch ``SWALR``; reference ``optim/schedulers.py:48-58``):
    anneal from the optimizer lr to ``swa_lr`` over ``anneal_epochs`` steps,
    constant afterwards. Strategies: "linear" | "cos"."""

    def fn(step):
        frac = jnp.clip(step / max(anneal_epochs, 1), 0.0, 1.0)
        if anneal_strategy == "cos":
            mix = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
            return swa_lr + (base_lr - swa_lr) * mix
        return base_lr + (swa_lr - base_lr) * frac

    return fn


def cyclic_cos_decay_schedule(
    base_lr: float,
    init_decay_epochs: int,
    min_decay_lr: float,
    restart_interval: int | None = None,
    restart_interval_multiplier: float | None = None,
    restart_lr: float | None = None,
    warmup_epochs: int | None = None,
    warmup_start_lr: float | None = None,
) -> Callable:
    """CyclicCosineDecayLR twin (vendored in the reference,
    ``optim/cyclic_cos_decay.py:15-215``): optional linear warmup → initial
    cosine decay to ``min_decay_lr`` → optional fixed or geometrically
    growing cosine restart cycles."""
    if init_decay_epochs < 1:
        raise ValueError(f"init_decay_epochs must be >= 1, got {init_decay_epochs}")
    if warmup_epochs is not None and warmup_start_lr is None:
        raise ValueError("warmup_start_lr must be set when warmup_epochs is set")
    warm = int(warmup_epochs or 0)

    def cos_calc(t, period, lr_hi):
        return min_decay_lr + (lr_hi - min_decay_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / period)
        )

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        # cosine warmup ramp start→base (the vendored ``_calc`` with
        # (lrs, min_lrs) swapped, ``cyclic_cos_decay.py:150-156,198-202``)
        warm_lr = (
            base_lr
            + (warmup_start_lr - base_lr)
            * 0.5
            * (1.0 + jnp.cos(jnp.pi * step / max(warm, 1)))
            if warm > 0
            else jnp.asarray(base_lr)
        )
        t0 = step - warm
        init_lr = cos_calc(jnp.clip(t0, 0, init_decay_epochs), init_decay_epochs, base_lr)
        # post-decay segment
        t1 = t0 - init_decay_epochs
        cyc_lr_hi = base_lr if restart_lr is None else restart_lr
        if restart_interval is None:
            post_lr = jnp.asarray(min_decay_lr)
        elif restart_interval_multiplier is None:
            cycle_t = jnp.mod(t1, restart_interval)
            post_lr = cos_calc(cycle_t, restart_interval, cyc_lr_hi)
        else:
            m = restart_interval_multiplier
            # n = floor(log_m(1 - (1-m) * t1 / interval)) (cyclic_cos_decay.py:204-215)
            arg = jnp.maximum(1.0 - (1.0 - m) * t1 / restart_interval, 1e-12)
            n = jnp.floor(jnp.log(arg) / jnp.log(m))
            sn_prev = restart_interval * (1.0 - m**n) / (1.0 - m)
            cycle_t = t1 - sn_prev
            interval = restart_interval * m**n
            post_lr = cos_calc(cycle_t, interval, cyc_lr_hi)
        lr = jnp.where(t0 < 0, warm_lr, jnp.where(t1 < 0, init_lr, post_lr))
        return lr

    return fn


def get_schedule(
    name: str,
    base_lr: float,
    n_steps: int,
    d_model: int = 256,
    milestones: list[int] | None = None,
    **kwargs: Any,
) -> Callable:
    """Scheduler factory (reference ``get_scheduler_list`` twin,
    ``optim/schedulers.py:19-92``). ``reduce_lr_on_plateau`` is stateful and
    built via :class:`ReduceLROnPlateau` instead."""
    name = str(name).lower()
    if name in ("cos_decay", "cosdecayrule"):
        return cos_decay_schedule(base_lr, n_steps)
    if name in ("trf", "trfrule", "transformer_scheduler"):
        return trf_schedule(d_model, kwargs.get("warmup_steps", 4000))
    if name in ("multistep", "multisteplr"):
        return multistep_schedule(
            base_lr, milestones or [n_steps // 2], kwargs.get("gamma", 0.1)
        )
    if name == "swalr":
        return swalr_schedule(
            base_lr,
            swa_lr=kwargs.get("swa_lr", 0.05),
            anneal_epochs=kwargs.get("anneal_epochs", 20),
            anneal_strategy=kwargs.get("anneal_strategy", "linear"),
        )
    if name in ("cyclic_cos_decay", "cycliccosinedecaylr"):
        return cyclic_cos_decay_schedule(
            base_lr,
            init_decay_epochs=kwargs.get("init_decay_epochs", max(n_steps // 2, 1)),
            min_decay_lr=kwargs.get("min_decay_lr", base_lr * 0.01),
            restart_interval=kwargs.get("restart_interval"),
            restart_interval_multiplier=kwargs.get("restart_interval_multiplier"),
            restart_lr=kwargs.get("restart_lr"),
            warmup_epochs=kwargs.get("warmup_epochs"),
            warmup_start_lr=kwargs.get("warmup_start_lr"),
        )
    if name in ("none", "null"):
        return lambda step: jnp.asarray(base_lr)
    raise ValueError(
        f"Unknown scheduler {name!r}. (expected one of ('cos_decay', 'trf', "
        "'multistep', 'swalr', 'cyclic_cos_decay', 'reduce_lr_on_plateau', "
        "'none'))"
    )


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch ``ReduceLROnPlateau`` twin; wired
    as a multiplicative factor on top of the base schedule). Call
    ``step(metric)`` once per validation epoch and multiply the scheduled lr
    by ``.factor``."""

    def __init__(
        self,
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        min_lr_factor: float = 0.0,
        cooldown: int = 0,
    ) -> None:
        if mode not in ("min", "max"):
            raise ValueError(f"Invalid {mode=}")
        self.mode = mode
        self.reduce_factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr_factor = min_lr_factor
        self.cooldown = cooldown
        self.factor = 1.0
        self.best: float | None = None
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1.0 - self.threshold)
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.factor = max(
                    self.factor * self.reduce_factor, self.min_lr_factor
                )
                self.cooldown_counter = self.cooldown
                self.num_bad_epochs = 0
        return self.factor


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
    sched_kwargs: dict[str, Any] | None = None,
) -> tuple[optax.GradientTransformation, Any]:
    """Build the optax optimizer + initial state for a parameter pytree.

    ``sched_name="reduce_lr_on_plateau"`` builds the optimizer through
    ``optax.inject_hyperparams`` with a constant ``learning_rate`` hyperparam
    the train loop rescales between epochs via
    ``state.opt_state.hyperparams["learning_rate"]`` (driven by
    :class:`ReduceLROnPlateau`)."""
    mask = decay_mask(params) if use_custom_wd else None
    plateau = str(sched_name).lower() in ("reduce_lr_on_plateau", "reducelronplateau")
    if plateau:
        schedule: Any = lr
    else:
        schedule = get_schedule(sched_name, lr, sched_n_steps, **(sched_kwargs or {}))

    name_l = optim_name.lower()
    if name_l == "adamw":
        def make(learning_rate):
            return optax.adamw(
                learning_rate=learning_rate, b1=betas[0], b2=betas[1],
                eps=eps, weight_decay=weight_decay, mask=mask,
            )
    elif name_l == "adam":
        def make(learning_rate):
            return optax.adam(
                learning_rate=learning_rate, b1=betas[0], b2=betas[1], eps=eps
            )
    elif name_l == "sgd":
        def make(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay, mask=mask),
                optax.sgd(learning_rate=learning_rate, momentum=0.9),
            )
    else:
        raise ValueError(
            f"Unknown optimizer {optim_name!r}. (expected AdamW, Adam or SGD)"
        )

    if plateau:
        tx = optax.inject_hyperparams(make)(learning_rate=schedule)
    else:
        tx = make(schedule)
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
