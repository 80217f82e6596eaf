"""2-process full-``main_train`` equality vs the 1-process run (VERDICT r2 #6).

Round 2 proved the jax.distributed *wiring* (2-process collectives smoke,
``tests/test_multihost.py``) but never ran the actual ``main_train`` fit
under multiple processes. This test does:

* run A: ONE process with 8 virtual CPU devices, ``dm.bsize=8``;
* run B: TWO processes × 4 virtual CPU devices forming a jax.distributed
  cluster over the same 8-device global mesh, ``dm.bsize=4`` each (the
  datamodule's DistributedSampler twin gives each process its contiguous
  slice of every global batch, so the assembled global batch is
  row-identical to run A's);

then asserts per-step train losses (≤1e-5) and the final best-checkpoint
parameters (≤1e-4) are equal — in FULL production config: dropout AND
spec-aug on (shape-identical collation makes the RNG draws value-identical
across process topologies). Reference handoff being mirrored: PL DDP fit +
single-rank eval (``train.py:419-433,489-496``) — which does NOT have this
property (per-rank torch RNG streams).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-process e2e fits; deselect with -m 'not slow'

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=" + os.environ["N_DEV"]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["REPO_ROOT"])

    import json as _json

    from conette_tpu.train.main import main_train

    _extra = _json.loads(os.environ.get("EXTRA_ARGS", "[]"))

    out = main_train([
        "trainer=fit_test",
        "trainer.max_epochs=2",
        "trainer.data_parallel=auto",
        "trainer.log_every_n_steps=1",
        "ckpts=loss",
        "dm.hdf_root=" + os.environ["HDF_DIR"],
        "dm.train_hdfs=[clotho_dev_x.hdf]",
        "dm.val_hdfs=[clotho_val_x.hdf]",
        "dm.test_hdfs=[]",
        "dm.bsize=" + os.environ["BSIZE"],
        # both runs collate the same (dataset-max) global shapes: spec-aug
        # stripe widths depend on the padded T, and dropout masks on array
        # shape, so shape identity is a precondition for RNG identity
        "dm.fixed_shapes=true",
        "pl.d_model=32", "pl.nhead=2", "pl.num_decoder_layers=2",
        "pl.dim_feedforward=64", "pl.max_pred_size=6", "pl.min_pred_size=1",
        "pl.beam_size=1",
        # note: dropout and spec-aug both stay ON (production config) —
        # with shape-identical collation the RNG draws are value-identical
        # across process topologies (threefry is deterministic per shape)
        "log_root=" + os.environ["LOG_ROOT"],
    ] + _extra)
    print("RUN_DIR::" + out["run_dir"])
    """
)


@pytest.fixture(scope="module")
def hdf_dir(tmp_path_factory):
    from conette_tpu.data.datasets import DummyAACDataset
    from conette_tpu.data.hdf import pack_to_hdf

    d = tmp_path_factory.mktemp("hdf_eq")
    for name, subset, size, seed in [
        ("clotho", "dev", 16, 0),
        ("clotho", "val", 6, 1),
        ("wavcaps", "full", 24, 2),
    ]:
        ds = DummyAACDataset(size=size, seed=seed, dataset_name=name, subset=subset)
        pack_to_hdf(ds, str(d / f"{name}_{subset}_x.hdf"))
    return str(d)


def _base_env(hdf_dir, log_root, n_dev, bsize):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        REPO_ROOT=repo_root,
        HDF_DIR=hdf_dir,
        LOG_ROOT=str(log_root),
        N_DEV=str(n_dev),
        BSIZE=str(bsize),
    )
    for k in ("SLURM_NTASKS", "SLURM_PROCID", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID", "JAX_COORDINATOR_ADDRESS"):
        env.pop(k, None)
    return env


def _run_dir(stdout: str) -> str:
    for line in stdout.splitlines():
        if line.startswith("RUN_DIR::"):
            return line.split("::", 1)[1]
    raise AssertionError(f"no RUN_DIR in output:\n{stdout}")


def _train_losses(run_dir: str) -> list[float]:
    losses = []
    with open(os.path.join(run_dir, "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec:
                losses.append((rec["step"], rec["train/loss"]))
    losses.sort()
    return [v for _, v in losses]


def _best_params(run_dir: str) -> dict[str, np.ndarray]:
    path = os.path.join(run_dir, "checkpoints", "best", "params.npz")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def test_two_process_fit_equals_single_process(hdf_dir, tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    # ---- run A: 1 process, 8 devices, global bsize 8
    env_a = _base_env(hdf_dir, tmp_path / "logs_a", n_dev=8, bsize=8)
    proc = subprocess.run(
        [sys.executable, str(script)], env=env_a,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"run A failed:\n{proc.stdout}\n{proc.stderr}"
    dir_a = _run_dir(proc.stdout)

    # ---- run B: 2 processes x 4 devices, local bsize 4 (global 8)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = _base_env(hdf_dir, tmp_path / f"logs_b{pid}", n_dev=4, bsize=4)
        env.update(
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\nstdout:{out}\nstderr:{err}"
    dir_b0 = _run_dir(outs[0][0])

    # ---- per-step train losses equal
    la, lb = _train_losses(dir_a), _train_losses(dir_b0)
    assert len(la) == len(lb) > 0, (la, lb)
    np.testing.assert_allclose(lb, la, rtol=0, atol=1e-5)

    # ---- final best-checkpoint params equal. Tolerance note: the
    # attention k-biases are softmax-shift-invariant (their exact gradient
    # is 0), so Adam normalizes pure fp-reassociation noise between the
    # two compilations into an O(lr)-scale random walk on them — observed
    # max ~1.4e-5 after 8 steps at lr 5e-4; every other tensor sits well
    # under 1e-5
    pa, pb = _best_params(dir_a), _best_params(dir_b0)
    assert set(pa) == set(pb)
    for k in pa:
        np.testing.assert_allclose(
            pb[k], pa[k], rtol=0, atol=1e-4, err_msg=f"param {k}"
        )

    # host 1 must NOT have written a checkpoint (host-0-only eval/ckpt,
    # the reference's single-rank-eval handoff)
    dir_b1 = _run_dir(outs[1][0])
    assert not os.path.isfile(
        os.path.join(dir_b1, "checkpoints", "best", "params.npz")
    )


def test_two_process_fit_equality_with_balancing(hdf_dir, tmp_path):
    """Same equality property under the production balancing path:
    main_hdf_min pools the added wavcaps pack behind ONE seeded sampler
    and reload_dataloaders_every_n_epochs=1 re-draws it per epoch — the
    draws are a pure function of (seed, epoch), so every process composes
    the identical epoch dataset."""
    import json as json_mod

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    extra = json_mod.dumps([
        "dm.train_hdfs=[clotho_dev_x.hdf, wavcaps_full_x.hdf]",
        "dm.main_hdf_min=clotho_dev_x.hdf",
        "trainer.reload_dataloaders_every_n_epochs=1",
    ])

    env_a = _base_env(hdf_dir, tmp_path / "logs_a", n_dev=8, bsize=8)
    env_a["EXTRA_ARGS"] = extra
    proc = subprocess.run(
        [sys.executable, str(script)], env=env_a,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"run A failed:\n{proc.stdout}\n{proc.stderr}"
    dir_a = _run_dir(proc.stdout)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = _base_env(hdf_dir, tmp_path / f"logs_b{pid}", n_dev=4, bsize=4)
        env["EXTRA_ARGS"] = extra
        env.update(
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\nstdout:{out}\nstderr:{err}"
    dir_b0 = _run_dir(outs[0][0])

    la, lb = _train_losses(dir_a), _train_losses(dir_b0)
    # balanced epoch = 16 main + 16 sampled = 32 rows -> 4 global batches
    # per epoch x 2 epochs
    assert len(la) == len(lb) == 8, (la, lb)
    np.testing.assert_allclose(lb, la, rtol=0, atol=1e-5)
