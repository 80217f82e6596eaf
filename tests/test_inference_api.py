"""Public API tests, mirroring the reference's tests/test_inference.py:13-70
(single file, batch of arrays + sr list, task switching, forbid_rep_mode,
tags with beam_size=1) against a small randomly-initialized checkpoint.
"""

import numpy as np
import pytest

from conette_tpu import get_sample_path
from conette_tpu.huggingface.config import CoNeTTEConfig
from conette_tpu.huggingface.model import CoNeTTEModel, CoNeTTEOutput
from conette_tpu.tokenization import AACTokenizer

CORPUS = [
    "a bird is singing in the trees",
    "rain falls on a tin roof while wind blows",
    "a man speaks and a dog barks loudly",
    "water flows over rocks in a stream",
    "an engine rumbles and accelerates away",
]


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    tok = AACTokenizer()
    tok.fit(CORPUS)
    config = CoNeTTEConfig(
        d_model=32, nhead=2, num_decoder_layers=2, dim_feedforward=64,
        beam_size=2, min_pred_size=1, max_pred_size=6,
        tokenizer_state=tok.get_txt_state(),
    )
    m = CoNeTTEModel(config, seed=0)
    return m


@pytest.fixture(scope="module")
def saved_dir(model, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt"))
    model.save_pretrained(d)
    return d


def test_example_1_single_file(model):
    path = get_sample_path()
    outputs = model(path, task="clotho")
    assert isinstance(outputs, CoNeTTEOutput)
    cands = outputs["cands"]
    assert isinstance(cands, list) and len(cands) == 1
    assert isinstance(cands[0], str)
    assert outputs.tasks == ["clotho"]
    assert outputs["preds"].shape[0] == 1


def test_example_2_batch_tensors_with_sr(model):
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((1, 44_100)).astype(np.float32) * 0.1
    x2 = rng.standard_normal((1, 48_000)).astype(np.float32) * 0.1
    outputs = model([x1, x2], sr=[44_100, 48_000], task="clotho")
    assert len(outputs["cands"]) == 2
    assert outputs["mult_preds"].shape[:2] == (2, 2)  # beam 2


def test_example_3_task_switch(model):
    path = get_sample_path()
    out_cl = model(path, task="clotho")
    out_ac = model(path, task="audiocaps")
    assert out_cl.tasks == ["clotho"]
    assert out_ac.tasks == ["audiocaps"]
    # different BOS task tokens condition the decoder
    bos_cl = model.task_token_ids["clotho"]
    bos_ac = model.task_token_ids["audiocaps"]
    assert bos_cl != bos_ac


def test_example_4_forbid_rep_mode_none(model):
    path = get_sample_path()
    outputs = model(path, task="clotho", forbid_rep_mode="none")
    assert len(outputs["cands"]) == 1


def test_example_5_tags_beam_1(model):
    path = get_sample_path()
    outputs = model(path, task="clotho", beam_size=1)
    assert "tags" in outputs and "tags_probs" in outputs
    assert outputs["tags_probs"].shape == (1, 527)
    assert isinstance(outputs["tags"][0], list)


def test_invalid_task_raises(model):
    with pytest.raises(ValueError):
        model(get_sample_path(), task="not_a_task")


def test_ds_src_task_split(model):
    """wavcaps_freesound → dataset=wavcaps, source=freesound → same token."""
    tok_id = model.task_token_ids["wavcaps_freesound"]
    assert model.tokenizer.id_to_token(tok_id) == "<bos_wavcaps_freesound>"


def test_save_load_roundtrip(model, saved_dir):
    m2 = CoNeTTEModel.from_pretrained(saved_dir)
    assert m2.tokenizer.get_vocab_size() == model.tokenizer.get_vocab_size()
    path = get_sample_path()
    out1 = model(path, task="clotho")
    out2 = m2(path, task="clotho")
    assert out1["cands"] == out2["cands"]
    np.testing.assert_array_equal(out1["preds"], out2["preds"])


def test_preprocess_false_path(model):
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 9, 768)).astype(np.float32)
    shapes = np.asarray([[768, 9], [768, 7]])
    outputs = model(audio, preprocess=False, x_shapes=shapes, task="clotho")
    assert len(outputs["cands"]) == 2
    assert "tags" not in outputs


def test_from_pretrained_hub_name_resolution(model, saved_dir, monkeypatch):
    """Hub-style repo ids resolve through huggingface_hub.snapshot_download
    (reference predict.py:93-121); offline keeps the explicit error."""
    import sys
    import types

    hub = types.ModuleType("huggingface_hub")
    calls = {}

    def snapshot_download(repo_id, token=None):
        calls["repo"] = repo_id
        return saved_dir

    hub.snapshot_download = snapshot_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", hub)

    loaded = CoNeTTEModel.from_pretrained("fake/conette")
    assert calls["repo"] == "fake/conette"
    assert loaded.tokenizer.get_vocab_size() == model.tokenizer.get_vocab_size()

    with pytest.raises(FileNotFoundError):
        CoNeTTEModel.from_pretrained("fake/conette", offline=True)
