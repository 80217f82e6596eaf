"""Jitted/pjitted train + eval steps.

The full training step (mixup → teacher forcing → label-smoothed CE →
AdamW update) compiles to one XLA program; under a sharded
``jax.sharding.Mesh`` the gradient all-reduce over the ``data`` axis is
inserted by XLA (the TPU-native replacement for the reference's
DDP/NCCL all-reduce, ``conf/trainer/strategy/ddp.yaml``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax

from conette_tpu.models.conette import ConetteConfig
from conette_tpu.parallel.mesh import (
    Mesh,
    batch_specs,
    param_sharding,
    replicated,
)
from conette_tpu.train.objective import training_loss, validation_loss

Params = Any


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


def make_train_step(
    cfg: ConetteConfig,
    tx: optax.GradientTransformation,
    *,
    use_mixup: bool = True,
    donate: bool = True,
):
    """Returns ``train_step(state, batch, rng) -> (state, metrics)``."""

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return training_loss(params, cfg, batch, rng, use_mixup=use_mixup)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"train/loss": loss, "train/grad_norm": gnorm}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: ConetteConfig):
    def eval_step(params: Params, batch: dict):
        return {"val/loss": validation_loss(params, cfg, batch)}

    return jax.jit(eval_step)


def make_sharded_train_step(
    cfg: ConetteConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    state: TrainState,
    example_batch: dict,
    *,
    use_mixup: bool = True,
):
    """pjit the train step over ``mesh``: batch sharded on ``data``, params
    sharded per ``param_sharding`` (replicated on the data axis), rng
    replicated. Returns (placed_state, sharded_train_step)."""
    p_shard = param_sharding(state.params, mesh)
    o_shard = jax.tree.map(
        lambda _: replicated(mesh), state.opt_state,
        is_leaf=lambda x: hasattr(x, "shape"),
    )
    s_shard = TrainState(params=p_shard, opt_state=o_shard, step=replicated(mesh))
    b_shard = batch_specs(example_batch, mesh)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return training_loss(params, cfg, batch, rng, use_mixup=use_mixup)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"train/loss": loss}

    fn = jax.jit(
        train_step,
        in_shardings=(s_shard, b_shard, replicated(mesh)),
        out_shardings=(s_shard, replicated(mesh)),
    )
    placed_state = jax.device_put(state, s_shard)
    return placed_state, fn


def init_train_state(params: Params, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0))
