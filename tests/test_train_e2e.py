"""End-to-end training smoke test, mirroring the reference training CI
(.github/workflows/training.yaml:60-98): pack a mini HDF → conette-train
with the lim2 trainer (1 epoch, 2 batches) → predict from the fresh run
dir. Runs on the virtual CPU mesh."""

import os

import numpy as np
import pytest

from conette_tpu.data.datasets import DummyAACDataset
from conette_tpu.data.hdf import pack_to_hdf

pytestmark = pytest.mark.slow  # heavy compiles / e2e; deselect with -m 'not slow'


@pytest.fixture(scope="module")
def hdf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hdf")
    for name, subset, size, seed in [
        ("clotho", "dev", 12, 0),
        ("clotho", "val", 6, 1),
        ("clotho", "eval", 6, 2),
    ]:
        ds = DummyAACDataset(size=size, seed=seed, dataset_name=name, subset=subset)
        pack_to_hdf(ds, str(d / f"{name}_{subset}_x.hdf"))
    # caption-less predict corpus (the reference's clotho_test DCASE pack)
    from conette_tpu.data.datasets import DictDataset

    rng = np.random.default_rng(9)
    n = 5
    pred = DictDataset(
        {
            "audio": [
                rng.standard_normal((31, 768)).astype(np.float32)
                for _ in range(n)
            ],
            "audio_lens": [31] * n,
            "captions": [[] for _ in range(n)],
            "dataset": ["clotho"] * n,
            "subset": ["test"] * n,
            "source": [None] * n,
            "fname": [f"t{i}.wav" for i in range(n)],
        }
    )
    pack_to_hdf(pred, str(d / "clotho_test_x.hdf"))
    return str(d)


def test_main_train_smoke(hdf_dir, tmp_path):
    from conette_tpu.train.main import main_train

    out = main_train(
        [
            "trainer=lim2",
            "ckpts=loss",
            f"dm.hdf_root={hdf_dir}",
            "dm.train_hdfs=[clotho_dev_x.hdf]",
            "dm.val_hdfs=[clotho_val_x.hdf]",
            "dm.test_hdfs=[clotho_eval_x.hdf]",
            "dm.predict_hdfs=[clotho_test_x.hdf]",
            "dm.bsize=3",
            "pl.d_model=32",
            "pl.nhead=2",
            "pl.num_decoder_layers=2",
            "pl.dim_feedforward=64",
            "pl.max_pred_size=6",
            "pl.min_pred_size=1",
            "pl.beam_size=2",
            f"log_root={tmp_path}/logs",
        ]
    )
    run_dir = out["run_dir"]
    # out_crit unset -> out_default (reference train.py:515-521)
    assert out["out"] == -1.0
    # predict pass over the caption-less corpus (reference train.py:303-343
    # runs trainer.predict after trainer.test): outputs CSV with no metric
    # columns + DCASE submission CSV
    pred_csv = os.path.join(run_dir, "best_loss_outputs_clotho_test.csv")
    assert os.path.isfile(pred_csv)
    import csv as csv_pred

    with open(pred_csv, newline="") as f:
        pred_rows = list(csv_pred.DictReader(f))
    assert len(pred_rows) == 5
    assert not any(".cands." in k for k in pred_rows[0])
    assert os.path.isfile(
        os.path.join(run_dir, "submission_output_best_loss_clotho_test.csv")
    )
    # artifacts
    assert os.path.isfile(os.path.join(run_dir, "hparams.yaml"))
    assert os.path.isfile(os.path.join(run_dir, "metrics.yaml"))
    assert os.path.isfile(os.path.join(run_dir, "tokenizer.json"))
    assert os.path.isfile(os.path.join(run_dir, "vocab.csv"))
    assert os.path.isfile(os.path.join(run_dir, "endfile.txt"))
    # checkpoints with best link
    best = os.path.join(run_dir, "checkpoints", "best")
    assert os.path.isdir(best)
    assert os.path.isfile(os.path.join(best, "params.npz"))
    # test scoring ran and exported CSVs
    assert out["test"], "expected test corpus scores"
    corpus = next(iter(out["test"]))
    assert "cider_d" in out["test"][corpus]
    # model name derives from the ckpt monitor (val/loss -> best_loss),
    # mirroring reference train.py:332-338
    out_csv = os.path.join(run_dir, f"best_loss_outputs_{corpus}.csv")
    assert os.path.isfile(out_csv)
    # reference outputs_*.csv schema: token/beam/loss columns + prefixed
    # per-sentence scores (round-trippable by the parity tooling)
    import ast
    import csv as csv_mod2

    with open(out_csv, newline="") as f:
        out_rows = list(csv_mod2.DictReader(f))
    lead = ["losses", "preds", "lprobs", "mpreds", "mlprobs", "cands",
            "mcands", "mrefs", "fname", "index", "dataset", "subset"]
    assert list(out_rows[0].keys())[: len(lead)] == lead
    first = out_rows[0]
    preds_ids = ast.literal_eval(first["preds"])
    mpreds_ids = ast.literal_eval(first["mpreds"])
    assert preds_ids == mpreds_ids[0] or preds_ids in mpreds_ids
    assert isinstance(ast.literal_eval(first["losses"]), list)
    assert ast.literal_eval(first["mcands"])  # all beams decoded
    assert "best_loss.cands.cider_d" in first
    assert os.path.isfile(
        os.path.join(run_dir, f"submission_output_best_loss_{corpus}.csv")
    )

    # --- predict from the fresh run dir (CI parity: conette-predict --model_path)
    from conette_tpu import get_sample_path
    from conette_tpu.predict import main_predict

    csv_out = str(tmp_path / "preds.csv")
    rc = main_predict(
        [
            "--audio", get_sample_path(),
            "--task", "clotho",
            "--model_path", run_dir,
            "--csv_export", csv_out,
            "--verbose", "0",
        ]
    )
    assert rc == 0
    assert os.path.isfile(csv_out)
    import csv as csv_mod

    with open(csv_out) as f:
        rows = list(csv_mod.DictReader(f))
    assert len(rows) == 1
    assert set(rows[0]) == {"audio", "task", "candidate"}


def test_testing_run_modes(hdf_dir, tmp_path):
    """testing.run=[last,swa,best] tests each weight set with its own
    evaluator name (reference train.py:297-356): three output CSVs, and
    out['test'] stays the best-model corpus scores."""
    from conette_tpu.train.main import main_train

    out = main_train(
        [
            "trainer=lim2",
            "ckpts=loss",
            f"dm.hdf_root={hdf_dir}",
            "dm.train_hdfs=[clotho_dev_x.hdf]",
            "dm.val_hdfs=[clotho_val_x.hdf]",
            "dm.test_hdfs=[clotho_eval_x.hdf]",
            "dm.bsize=3",
            "pl.d_model=32",
            "pl.nhead=2",
            "pl.num_decoder_layers=2",
            "pl.dim_feedforward=64",
            "pl.max_pred_size=6",
            "pl.min_pred_size=1",
            "pl.beam_size=2",
            "trainer.swa_start=0",
            "testing.run=[last,swa,best]",
            "out_crit=fit_duration_s",
            f"log_root={tmp_path}/logs",
        ]
    )
    run_dir = out["run_dir"]
    # out_crit resolves against the logged metrics (train.py:515-521)
    assert out["out"] > 0
    assert set(out["test_by_model"]) == {"last", "swa", "best_loss"}
    corpus = next(iter(out["test"]))
    for model_name in ("last", "swa", "best_loss"):
        assert os.path.isfile(
            os.path.join(run_dir, f"{model_name}_outputs_{corpus}.csv")
        ), model_name
        assert out["test_by_model"][model_name][corpus]
    # primary result is the best model's
    assert out["test"] == out["test_by_model"]["best_loss"]


def test_testing_run_none_skips(hdf_dir, tmp_path):
    from conette_tpu.train.main import main_train

    out = main_train(
        [
            "trainer=lim2",
            "ckpts=loss",
            f"dm.hdf_root={hdf_dir}",
            "dm.train_hdfs=[clotho_dev_x.hdf]",
            "dm.val_hdfs=[clotho_val_x.hdf]",
            "dm.test_hdfs=[clotho_eval_x.hdf]",
            "dm.bsize=3",
            "pl.d_model=32",
            "pl.nhead=2",
            "pl.num_decoder_layers=2",
            "pl.dim_feedforward=64",
            "pl.max_pred_size=6",
            "pl.min_pred_size=1",
            "pl.beam_size=2",
            "testing.run=[none]",
            f"log_root={tmp_path}/logs",
        ]
    )
    assert out["test"] == {} and out["test_by_model"] == {}

    # warm start from that run + test_on_start: the starting weights are
    # scored with evaluator name "start" (reference train.py:477-482)
    from conette_tpu.train.main import main_train as main_train2

    resume_dir = os.path.join(out["run_dir"], "checkpoints", "best")
    out2 = main_train2(
        [
            "trainer=lim2",
            "ckpts=loss",
            f"dm.hdf_root={hdf_dir}",
            "dm.train_hdfs=[clotho_dev_x.hdf]",
            "dm.val_hdfs=[clotho_val_x.hdf]",
            "dm.test_hdfs=[clotho_eval_x.hdf]",
            "dm.bsize=3",
            "pl.d_model=32",
            "pl.nhead=2",
            "pl.num_decoder_layers=2",
            "pl.dim_feedforward=64",
            "pl.max_pred_size=6",
            "pl.min_pred_size=1",
            "pl.beam_size=2",
            f"resume={resume_dir}",
            "test_on_start=true",
            "testing.run=[none]",
            f"log_root={tmp_path}/logs2",
        ]
    )
    start_csvs = [
        f
        for f in os.listdir(out2["run_dir"])
        if f.startswith("start_outputs_")
    ]
    assert start_csvs, os.listdir(out2["run_dir"])

    # strict_resume (reference train.py:175-177): resuming into a model
    # with a different layer count raises unless strict_resume=false
    mismatch_args = [
        "trainer=lim2",
        "ckpts=loss",
        f"dm.hdf_root={hdf_dir}",
        "dm.train_hdfs=[clotho_dev_x.hdf]",
        "dm.val_hdfs=[clotho_val_x.hdf]",
        "dm.test_hdfs=[]",
        "dm.bsize=3",
        "pl.d_model=32",
        "pl.nhead=2",
        "pl.num_decoder_layers=1",  # ckpt has 2
        "pl.dim_feedforward=64",
        "pl.max_pred_size=6",
        "pl.min_pred_size=1",
        "pl.beam_size=2",
        f"resume={resume_dir}",
        "testing.run=[none]",
        f"log_root={tmp_path}/logs3",
    ]
    with pytest.raises(ValueError, match="strict resume mismatch"):
        main_train2(mismatch_args)
    out3 = main_train2(mismatch_args + ["strict_resume=false"])
    assert out3["run_dir"]


def test_run_tag():
    """get_tag/get_subtag twin (reference utils/hydra.py:47-126): dotted
    tagk keys resolve, values are sanitized, NOTAG when empty, affixes."""
    from conette_tpu.config.loader import DotDict
    from conette_tpu.train.main import run_tag

    cfg = DotDict(
        {"tagk": ["pl.lr", "ckpts.monitor"], "pretag": "", "posttag": "",
         "pl": {"lr": 0.0005}, "ckpts": {"monitor": "val/fense"}}
    )
    assert run_tag(cfg, []) == "0.0005-val_fense"  # dotted + sanitized

    cfg = DotDict({"tagk": ["missing.key"], "pretag": "a", "posttag": "b"})
    assert run_tag(cfg, []) == "a-NOTAG-b"

    cfg = DotDict({"tagk": []})
    assert run_tag(cfg, ["pl.lr=0.001", "log_root=/x"]) == "pl.lr_0.001"


@pytest.mark.slow
def test_predict_only_run(hdf_dir, tmp_path):
    """dm.predict_hdfs with NO test corpora still exports predictions
    (the gate covers predict-only configurations)."""
    from conette_tpu.train.main import main_train

    out = main_train(
        [
            "trainer=lim2",
            "ckpts=loss",
            f"dm.hdf_root={hdf_dir}",
            "dm.train_hdfs=[clotho_dev_x.hdf]",
            "dm.val_hdfs=[clotho_val_x.hdf]",
            "dm.test_hdfs=[]",
            "dm.predict_hdfs=[clotho_test_x.hdf]",
            "dm.bsize=3",
            "pl.d_model=32",
            "pl.nhead=2",
            "pl.num_decoder_layers=2",
            "pl.dim_feedforward=64",
            "pl.max_pred_size=6",
            "pl.min_pred_size=1",
            "pl.beam_size=2",
            f"log_root={tmp_path}/logs",
        ]
    )
    assert out["test"] == {}
    assert os.path.isfile(
        os.path.join(
            out["run_dir"], "best_loss_outputs_clotho_test.csv"
        )
    )


def test_config_composition():
    from conette_tpu.config import load_config

    cfg = load_config("train", ["trainer=lim2", "dm.bsize=7", "pl.d_model=128"])
    assert cfg.trainer["max_epochs"] == 1
    assert cfg.dm["bsize"] == 7
    assert cfg.pl["d_model"] == 128
    assert cfg.pl["task_mode"] == "ds_src"


def test_config_expt_preset_applies_last():
    from conette_tpu.config import load_config

    cfg = load_config("train", ["expt=[clotho_cnext_bl,task_ds_src_camw]"])
    # round 2: presets carry the reference's exact HDF artifact names
    # (conf/expt/clotho_cnext_bl.yaml)
    assert cfg.dm["train_hdfs"] == ["clotho_dev_resample_mean_convnext_ident_bl.hdf"]
    assert len(cfg.pl["task_names"]) == 7


def test_config_unknown_group_option_lists_available():
    from conette_tpu.config import load_config

    with pytest.raises(FileNotFoundError) as err:
        load_config("train", ["trainer=nope"])
    assert "fit_test" in str(err.value)


def test_profiler_trace_written(hdf_dir, tmp_path):
    """trainer.profiler.name=jax writes a device trace into the run dir
    (reference conf/trainer/profiler group twin)."""
    from conette_tpu.train.main import main_train

    out = main_train([
        "trainer=lim2", "dm.bsize=3", f"dm.hdf_root={hdf_dir}",
        f"log_root={tmp_path}", "pl.d_model=32", "pl.nhead=2",
        "pl.num_decoder_layers=1", "pl.dim_feedforward=32",
        "pl.beam_size=2", "pl.max_pred_size=5", "pl.min_pred_size=1",
        "trainer.profiler.name=jax", "test_after_fit=false", "ckpts=loss",
        "dm.train_hdfs=[clotho_dev_x.hdf]",
        "dm.val_hdfs=[clotho_val_x.hdf]", "dm.test_hdfs=[]",
    ])
    prof_dir = os.path.join(out["run_dir"], "profile")
    assert os.path.isdir(prof_dir)
    assert any(os.scandir(prof_dir)), "trace dir empty"
