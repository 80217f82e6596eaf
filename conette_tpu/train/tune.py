"""Batch-size tuner (twin of the reference's TUNE_MODE path,
``src/conette/train.py:435-455``): doubling search for the largest batch
size whose training step compiles and executes without running out of
device memory."""

from __future__ import annotations

import logging
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

pylog = logging.getLogger(__name__)


def find_max_batch_size(
    make_batch: Callable[[int], dict[str, Any]],
    step_fn: Callable[[dict[str, Any]], Any],
    start: int = 32,
    max_bsize: int = 65536,
) -> int:
    """Doubles ``bsize`` until ``step_fn(make_batch(bsize))`` fails with a
    resource error, then returns the last working size.

    :param make_batch: bsize → batch dict (host numpy is fine).
    :param step_fn: executes one training step; must raise on OOM.
    """
    best = 0
    bsize = start
    while bsize <= max_bsize:
        try:
            out = step_fn(make_batch(bsize))
            jax.block_until_ready(out)
            best = bsize
            pylog.info(f"bsize {bsize}: OK")
            bsize *= 2
        except Exception as err:
            msg = str(err).lower()
            if "resource" in msg or "memory" in msg or "oom" in msg:
                pylog.info(f"bsize {bsize}: OOM — stopping search")
                break
            raise
    if best == 0:
        raise RuntimeError(f"even bsize={start} does not fit")
    return best


def tune_batch_size_for_model(cfg: Any, params: Any, t_frames: int = 31) -> int:
    """Convenience tuner for the CoNeTTE training step."""
    import optax

    from conette_tpu.train.objective import training_loss

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step(batch):
        return jax.grad(lambda p: training_loss(p, cfg, batch, key))(params)

    def make_batch(b: int) -> dict[str, Any]:
        return {
            "audio": jnp.asarray(
                rng.standard_normal((b, t_frames, cfg.proj_in)).astype(np.float32)
            ),
            "audio_lens": jnp.full((b,), t_frames, jnp.int32),
            "captions": jnp.asarray(
                rng.integers(4, cfg.vocab_size, size=(b, cfg.max_pred_size)).astype(
                    np.int32
                )
            ),
        }

    del optax
    return find_max_batch_size(make_batch, step)
