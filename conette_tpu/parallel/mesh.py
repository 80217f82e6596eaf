"""Device mesh + sharding helpers.

The reference scales with PL ``DDPStrategy`` over NCCL (DP only;
``conf/trainer/strategy/ddp.yaml``, SURVEY.md §2.10). TPU-native
equivalent: an explicit ``jax.sharding.Mesh`` with a primary ``data`` axis
(gradient reduction rides ICI via the collectives XLA inserts under jit)
plus an optional ``model`` axis that shards the widest decoder matrices
(FF 256×2048 and the 768→256 projection) for demonstration-scale tensor
parallelism — the model is ~10 M params, so DP is the production layout.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def make_mesh(
    n_devices: int | None = None, model_parallel: int = 1, devices: Any = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"n_devices={n_devices} not divisible by model_parallel={model_parallel}"
        )
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over ``data``."""
    return NamedSharding(mesh, P("data"))


def batch_specs(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P("data")), tree)


def param_sharding(params: Params, mesh: Mesh) -> Params:
    """Replicate everything except the widest decoder matrices, which shard
    their output/input feature dims over the ``model`` axis (Megatron-style
    column→row pairing on linear1/linear2)."""

    def spec_for(path: tuple, leaf: Any) -> NamedSharding:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        if mesh.shape["model"] > 1 and leaf.ndim == 2:
            if "linear1/weight" in joined:
                return NamedSharding(mesh, P(None, "model"))  # column parallel
            if "linear2/weight" in joined:
                return NamedSharding(mesh, P("model", None))  # row parallel
            if "pwconv1/weight" in joined:
                return NamedSharding(mesh, P(None, "model"))
            if "pwconv2/weight" in joined:
                return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
