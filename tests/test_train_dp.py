"""conette-train with mesh data parallelism engaged (bsize divisible by the
8 virtual devices)."""

import os

from conette_tpu.data.datasets import DummyAACDataset
from conette_tpu.data.hdf import pack_to_hdf
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / e2e; deselect with -m 'not slow'


def test_main_train_data_parallel(tmp_path):
    d = tmp_path / "hdf"
    d.mkdir()
    for name, subset, size, seed in [("clotho", "dev", 16, 0), ("clotho", "val", 8, 1)]:
        ds = DummyAACDataset(size=size, seed=seed, dataset_name=name, subset=subset)
        pack_to_hdf(ds, str(d / f"{name}_{subset}_x.hdf"))

    from conette_tpu.train.main import main_train

    out = main_train(
        [
            "trainer=lim2",
            "ckpts=loss",
            "trainer.data_parallel=8",
            f"dm.hdf_root={d}",
            "dm.train_hdfs=[clotho_dev_x.hdf]",
            "dm.val_hdfs=[clotho_val_x.hdf]",
            "dm.test_hdfs=[]",
            "dm.bsize=8",
            "pl.d_model=32",
            "pl.nhead=2",
            "pl.num_decoder_layers=1",
            "pl.dim_feedforward=64",
            "pl.max_pred_size=6",
            "pl.min_pred_size=1",
            "pl.beam_size=2",
            "test_after_fit=false",
            f"log_root={tmp_path}/logs",
        ]
    )
    assert out["best"] is not None
    assert os.path.isdir(os.path.join(out["run_dir"], "checkpoints", "best"))
