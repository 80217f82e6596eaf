"""End-to-end `from_pretrained` on a reference-layout torch checkpoint:
full state-dict naming (preprocessor.encoder.* / model.* prefixes, fixed
STFT buffers to skip, packed MHA in-proj) plus the `_extra_state_` pickled
tokenizer (huggingface/model.py:126-183 semantics)."""

import json
import os
import pickle

import numpy as np
import pytest
import torch
import torch.nn as tnn

from conette_tpu.huggingface.config import CoNeTTEConfig
from conette_tpu.huggingface.model import CoNeTTEModel
from conette_tpu.tokenization import AACTokenizer

CORPUS = ["a dog barks", "rain falls on the roof", "a man speaks quietly"]


def build_reference_layout_state(tok: AACTokenizer, d_model=32, vocab=None):
    """Minimal torch state dict with the reference's exact key naming."""
    vocab = vocab or tok.get_vocab_size()
    torch.manual_seed(0)
    state = {}

    # --- preprocessor.encoder.* (tiny ConvNeXt: dims (8,), depth 1 per stage)
    dims = [8, 16, 32, 64]
    state["preprocessor.encoder.bn0.weight"] = torch.rand(224)
    state["preprocessor.encoder.bn0.bias"] = torch.rand(224)
    state["preprocessor.encoder.bn0.running_mean"] = torch.rand(224)
    state["preprocessor.encoder.bn0.running_var"] = torch.rand(224) + 0.5
    # fixed STFT/mel buffers that the converter must skip
    state["preprocessor.encoder.spectrogram_extractor.stft.conv_real.weight"] = torch.rand(513, 1, 1024)
    state["preprocessor.encoder.logmel_extractor.melW"] = torch.rand(513, 224)
    state["preprocessor.encoder.downsample_layers.0.0.weight"] = torch.rand(dims[0], 1, 4, 4)
    state["preprocessor.encoder.downsample_layers.0.0.bias"] = torch.rand(dims[0])
    state["preprocessor.encoder.downsample_layers.0.1.weight"] = torch.rand(dims[0])
    state["preprocessor.encoder.downsample_layers.0.1.bias"] = torch.rand(dims[0])
    for i in range(1, 4):
        state[f"preprocessor.encoder.downsample_layers.{i}.0.weight"] = torch.rand(dims[i - 1])
        state[f"preprocessor.encoder.downsample_layers.{i}.0.bias"] = torch.rand(dims[i - 1])
        state[f"preprocessor.encoder.downsample_layers.{i}.1.weight"] = torch.rand(dims[i], dims[i - 1], 2, 2)
        state[f"preprocessor.encoder.downsample_layers.{i}.1.bias"] = torch.rand(dims[i])
    for i in range(4):
        p = f"preprocessor.encoder.stages.{i}.0."
        d = dims[i]
        state[p + "dwconv.weight"] = torch.rand(d, 1, 7, 7)
        state[p + "dwconv.bias"] = torch.rand(d)
        state[p + "norm.weight"] = torch.rand(d)
        state[p + "norm.bias"] = torch.rand(d)
        state[p + "pwconv1.weight"] = torch.rand(4 * d, d)
        state[p + "pwconv1.bias"] = torch.rand(4 * d)
        state[p + "pwconv2.weight"] = torch.rand(d, 4 * d)
        state[p + "pwconv2.bias"] = torch.rand(d)
        # legacy name on purpose: converter renames gamma → scale
        state[p + "gamma"] = torch.rand(d)
    state["preprocessor.encoder.norm.weight"] = torch.rand(dims[-1])
    state["preprocessor.encoder.norm.bias"] = torch.rand(dims[-1])
    state["preprocessor.encoder.head_audioset.weight"] = torch.rand(527, dims[-1])
    state["preprocessor.encoder.head_audioset.bias"] = torch.rand(527)

    # --- model.* (projection Sequential idx 2 + decoder)
    state["model.projection.2.weight"] = torch.rand(d_model, 768)
    state["model.projection.2.bias"] = torch.rand(d_model)
    state["model.decoder.emb_layer.weight"] = torch.rand(vocab, d_model)
    for i in range(2):
        p = f"model.decoder.layers.{i}."
        for attn in ("self_attn", "multihead_attn"):
            state[p + attn + ".in_proj_weight"] = torch.rand(3 * d_model, d_model)
            state[p + attn + ".in_proj_bias"] = torch.rand(3 * d_model)
            state[p + attn + ".out_proj.weight"] = torch.rand(d_model, d_model)
            state[p + attn + ".out_proj.bias"] = torch.rand(d_model)
        state[p + "linear1.weight"] = torch.rand(64, d_model)
        state[p + "linear1.bias"] = torch.rand(64)
        state[p + "linear2.weight"] = torch.rand(d_model, 64)
        state[p + "linear2.bias"] = torch.rand(d_model)
        for n in ("norm1", "norm2", "norm3"):
            state[p + n + ".weight"] = torch.rand(d_model)
            state[p + n + ".bias"] = torch.rand(d_model)
    state["model.decoder.classifier.weight"] = torch.rand(vocab, d_model)
    state["model.decoder.classifier.bias"] = torch.rand(vocab)

    # --- _extra_state_: pickled {state_dict_key: tokenizer bin state}
    extra = {
        "model.tokenizers.train_tokenizer._extra_state_": tok.get_bin_state()
    }
    blob = pickle.dumps(extra)
    state["_extra_state_"] = torch.frombuffer(
        bytearray(blob), dtype=torch.uint8
    ).clone()
    return state


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("torch_ckpt")
    tok = AACTokenizer()
    tok.fit(CORPUS)
    for name in ("clotho", "audiocaps"):
        tok.add_special_token(f"<bos_{name}>")
    state = build_reference_layout_state(tok)
    torch.save(state, os.path.join(d, "pytorch_model.bin"))
    config = CoNeTTEConfig(
        d_model=32, nhead=2, num_decoder_layers=2, dim_feedforward=64,
        task_names=["clotho", "audiocaps"], beam_size=2,
        min_pred_size=1, max_pred_size=6,
    )
    # no tokenizer_state in config → must come from _extra_state_
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(config.to_dict(), f)
    return str(d), tok


def test_from_pretrained_converts_torch_checkpoint(ckpt_dir):
    path, tok = ckpt_dir
    model = CoNeTTEModel.from_pretrained(path)
    # tokenizer restored from _extra_state_
    assert model.tokenizer.is_fit()
    assert model.tokenizer.get_vocab_size() == tok.get_vocab_size()
    assert model.tokenizer.token_to_id("dog") == tok.token_to_id("dog")
    # weights converted: classifier row count == vocab
    cls = np.asarray(model.params["decoder"]["classifier"]["weight"])
    assert cls.shape == (32, tok.get_vocab_size())
    # gamma→scale rename survived
    assert "scale" in model.encoder_params["stages"][0][0]
    # forward runs end-to-end on precomputed embeddings
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 7, 768)).astype(np.float32)
    out = model(audio, preprocess=False, x_shapes=np.asarray([[768, 7]]), task="clotho")
    assert isinstance(out["cands"][0], str)


def test_converted_projection_values(ckpt_dir):
    path, _ = ckpt_dir
    model = CoNeTTEModel.from_pretrained(path)
    state = torch.load(os.path.join(path, "pytorch_model.bin"), weights_only=False)
    np.testing.assert_allclose(
        np.asarray(model.params["projection"]["weight"]),
        state["model.projection.2.weight"].numpy().T,
        atol=1e-7,
    )
