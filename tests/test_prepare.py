"""conette-prepare pipeline test: local WAVs + captions CSV → HDF with
ConvNeXt frame embeddings → trainable by the datamodule (mirrors the
reference training-CI prepare step)."""

import csv
import os

import numpy as np
import pytest

from conette_tpu.prepare import (
    filter_dataset,
    main_prepare,
    pack_dataset_to_hdf,
    scan_local_dataset,
)
from conette_tpu.utils.audio_io import save_wav

pytestmark = pytest.mark.slow  # heavy compiles; deselect with -m 'not slow'


@pytest.fixture(scope="module")
def local_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    audio_dir = d / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        fname = f"clip_{i}.wav"
        dur = [1.0, 2.0, 0.05, 1.5][i]  # one too-short clip to filter out
        sig = rng.standard_normal(int(32_000 * dur)).astype(np.float32) * 0.1
        save_wav(str(audio_dir / fname), sig, 32_000)
        for r in range(2):
            rows.append({"file_name": fname, "caption": f"sound number {i} ref {r}"})
    csv_path = d / "caps.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file_name", "caption"])
        w.writeheader()
        w.writerows(rows)
    return str(audio_dir), str(csv_path), str(d)


def test_scan_and_filter(local_dataset):
    audio_dir, csv_path, _ = local_dataset
    ds = scan_local_dataset(audio_dir, csv_path, "clotho", "dev")
    assert len(ds) == 4
    assert len(ds.at(0, "captions")) == 2
    keep = filter_dataset(ds, min_duration_s=0.1, max_duration_s=30.0)
    assert len(keep) == 3  # the 0.05 s clip is dropped


def test_pack_and_train_roundtrip(local_dataset, tmp_path):
    audio_dir, csv_path, _ = local_dataset
    ds = scan_local_dataset(audio_dir, csv_path, "clotho", "dev")
    keep = filter_dataset(ds)
    fpath = pack_dataset_to_hdf(
        ds, str(tmp_path), indexes=keep, batch_size=2, debug_check=True,
        overwrite=True,
    )
    assert os.path.basename(fpath) == "clotho_dev_resample_mean_convnext_ident.hdf"

    from conette_tpu.data.hdf import HDFDataset

    loaded = HDFDataset(fpath)
    assert len(loaded) == 3
    emb = loaded.at(0, "audio")
    assert emb.ndim == 2 and emb.shape[1] == 768
    # 1 s @ 32 kHz → ~3 output frames
    assert 1 <= emb.shape[0] <= 6

    from conette_tpu.data.datamodule import HDFDataModule
    from conette_tpu.tokenization import AACTokenizer

    tok = AACTokenizer()
    dm = HDFDataModule(tok, [fpath], bsize=3)
    dm.setup_fit()
    batch = next(iter(dm.train_batches()))
    assert batch["audio"].shape[0] == 3
    assert batch["audio"].shape[2] == 768


def test_main_prepare_cli(local_dataset, tmp_path):
    audio_dir, csv_path, _ = local_dataset
    rc = main_prepare(
        [
            "--audio_dir", audio_dir,
            "--captions_csv", csv_path,
            "--dataset", "clotho",
            "--subset", "val",
            "--out_dir", str(tmp_path),
            "--batch_size", "2",
            "--overwrite",
        ]
    )
    assert rc == 0
    assert os.path.isfile(
        tmp_path / "clotho_val_resample_mean_convnext_ident.hdf"
    )


def test_main_prepare_requires_local_data():
    assert main_prepare([]) == 2


def test_config_mode_prepare_with_fake_aac_datasets(monkeypatch, tmp_path):
    """Hydra-style `conette-prepare data=clotho data.download=true` flows
    download -> adapter -> filter -> HDF pack (aac-datasets faked; real
    downloads need a connected host)."""
    import sys
    import types

    import numpy as np

    class FakeClotho:
        def __init__(self, root=None, subset=None, download=False, verbose=0,
                     **kw):
            self.subset = subset
            rng = np.random.default_rng(0)
            self._items = [
                {
                    "audio": rng.standard_normal(32_000 // 4).astype(np.float32) * 0.1,
                    "sr": 32_000,
                    "captions": [f"caption {i} a", f"caption {i} b"],
                    "fname": f"clip_{i}.wav",
                }
                for i in range(3)
            ]

        def __getitem__(self, idx):
            return self._items[idx]

        def __len__(self):
            return len(self._items)

    fake = types.ModuleType("aac_datasets")
    fake.Clotho = FakeClotho
    monkeypatch.setitem(sys.modules, "aac_datasets", fake)

    from conette_tpu.prepare import main_prepare

    rc = main_prepare([
        "data=clotho", "data.download=true", "data.subsets=[dev]",
        "data.bsize=2", f"out_root={tmp_path}",
    ])
    assert rc == 0
    import os

    files = os.listdir(tmp_path)
    assert any(f.startswith("clotho_dev_resample_mean_convnext") for f in files), files

    from conette_tpu.data.hdf import HDFDataset

    ds = HDFDataset(os.path.join(tmp_path, files[0]))
    assert len(ds) == 3
    assert ds.at(0, "captions") == ["caption 0 a", "caption 0 b"]
    assert ds.at(0, "audio").shape[-1] == 768
