"""Multi-host initialization + cross-host reductions.

TPU-native replacement for the reference's torch.distributed/NCCL+SLURM
plumbing (``conf/trainer/strategy/ddp.yaml``, ``conf/trainer/plugins/
slurm.yaml``, ``train.py:413-433,489-496``):

- ``initialize()`` wires ``jax.distributed`` from env (including SLURM
  variables when present — the SLURMEnvironment twin);
- ``is_main_process`` replaces the rank-0 checks;
- ``gather_to_host0`` replaces the reference's "destroy the process group
  and re-evaluate on a fresh rank-0 trainer" dance
  (``train.py:419-433,491-492``): device arrays are all-gathered over the
  mesh and scoring runs on host 0 only.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np

pylog = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    use_scheduler_env: bool = True,
) -> None:
    """Initialize jax.distributed; no-ops for single-process runs. SLURM
    env vars are honoured when explicit args are absent, unless
    ``use_scheduler_env`` is False (the ``trainer/plugins: lightning``
    local-environment twin — only explicit JAX_* coordinates count)."""

    def sched(key: str, fallback_key: str, default: str) -> str:
        if use_scheduler_env and key in os.environ:
            return os.environ[key]
        return os.environ.get(fallback_key, default)

    if num_processes is None:
        num_processes = int(sched("SLURM_NTASKS", "JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    if process_id is None:
        process_id = int(sched("SLURM_PROCID", "JAX_PROCESS_ID", "0"))
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if (
            coordinator_address is None
            and use_scheduler_env
            and "SLURM_JOB_NODELIST" in os.environ
        ):
            first = os.environ["SLURM_JOB_NODELIST"].split(",")[0].split("[")[0]
            coordinator_address = f"{first}:8476"
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    pylog.info(
        f"jax.distributed initialized: process {process_id}/{num_processes} "
        f"({jax.local_device_count()} local / {jax.device_count()} global devices)"
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


def rank_tag() -> str:
    """Log-prefix rank tag (twin of the SLURM_PROCID colorlog tag,
    train.py:70-72)."""
    return f"RANK{jax.process_index()}"


def gather_to_host0(x: Any) -> np.ndarray | None:
    """Gather a (possibly sharded) array's full value onto host 0; returns
    None on other hosts. Scoring (SPICE/FENSE subprocesses) then runs on
    host 0 only, mirroring the reference's single-rank eval.

    Batch-sharded global arrays are gathered tiled (concatenated along
    axis 0 — each host's rows in order); fully-replicated/host-local values
    are read directly (a tiled gather would duplicate them)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(x)
    if isinstance(x, jax.Array) and x.is_fully_replicated:
        return np.asarray(x) if is_main_process() else None
    gathered = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(gathered) if is_main_process() else None
