"""Checkpoint-converter golden tests: build reference-layout torch modules,
export their state dict, convert to JAX pytrees, and check numerical
equality of forward passes (the conversion direction used for the real HF
``Labbeti/conette`` checkpoint)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from conette_tpu.huggingface.convert import (
    convert_conette,
    convert_convnext,
    flatten_pytree,
    load_params_npz,
    save_params_npz,
    unflatten_pytree,
)
from conette_tpu.models.conette import ConetteConfig, encode_audio
from conette_tpu.models.convnext import convnext_apply
from conette_tpu.models.decoder import DecoderConfig, decoder_forward
from conette_tpu.ops.stft import num_frames


def build_torch_convnext(depths=(1, 1, 2, 1), dims=(8, 16, 32, 64), n_mels=32,
                         num_classes=10):
    """Reference-layout ConvNeXt as torch modules with reference names."""

    class Block(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = tnn.LayerNorm(dim, eps=1e-6)
            self.pwconv1 = tnn.Linear(dim, 4 * dim)
            self.pwconv2 = tnn.Linear(4 * dim, dim)
            self.scale_layer = tnn.Parameter(torch.rand(dim))

        def forward(self, x):
            inp = x
            x = self.dwconv(x)
            x = x.permute(0, 2, 3, 1)
            x = self.pwconv2(torch.nn.functional.gelu(self.pwconv1(self.norm(x))))
            x = self.scale_layer * x
            return inp + x.permute(0, 3, 1, 2)

    class LNFirst(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.weight = tnn.Parameter(torch.rand(dim))
            self.bias = tnn.Parameter(torch.rand(dim))

        def forward(self, x):
            u = x.mean(1, keepdim=True)
            s = (x - u).pow(2).mean(1, keepdim=True)
            x = (x - u) / torch.sqrt(s + 1e-6)
            return self.weight[:, None, None] * x + self.bias[:, None, None]

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.bn0 = tnn.BatchNorm2d(n_mels)
            self.downsample_layers = tnn.ModuleList()
            stem = tnn.Sequential(
                tnn.Conv2d(1, dims[0], (4, 4), (4, 4), padding=(4, 0)),
                LNFirst(dims[0]),
            )
            self.downsample_layers.append(stem)
            for i in range(3):
                self.downsample_layers.append(
                    tnn.Sequential(LNFirst(dims[i]), tnn.Conv2d(dims[i], dims[i + 1], 2, 2))
                )
            self.stages = tnn.ModuleList(
                tnn.Sequential(*[Block(dims[i]) for _ in range(depths[i])])
                for i in range(4)
            )
            self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
            self.head_audioset = tnn.Linear(dims[-1], num_classes)

        def forward(self, x):  # x: (B, 1, T, F) already bn'ed? no: raw mel
            x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
            for i in range(4):
                x = self.downsample_layers[i](x)
                x = self.stages[i](x)
            x = x.mean(dim=3)
            frame = x
            x1 = x.max(dim=2).values
            x2 = x.mean(dim=2)
            clip = torch.sigmoid(self.head_audioset(self.norm(x1 + x2)))
            return frame, clip

    net = Net()
    with torch.no_grad():
        net.bn0.running_mean.uniform_(-1, 1)
        net.bn0.running_var.uniform_(0.5, 2)
        for p in net.parameters():
            p.uniform_(-0.2, 0.2)
    net.eval()
    return net


def test_convnext_conversion_forward_parity():
    net = build_torch_convnext()
    state = {f"preprocessor.encoder.{k}": v.numpy() for k, v in net.state_dict().items()}
    params = convert_convnext(state)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 40, 32)).astype(np.float32)
    lens = np.asarray([40, 30], np.int32)
    outs = convnext_apply(params, jnp.asarray(mel), jnp.asarray(lens), waveform_input=False)
    with torch.no_grad():
        frame_ref, clip_ref = net(torch.from_numpy(mel)[:, None])
    np.testing.assert_allclose(
        np.asarray(outs["frame_embs"]), frame_ref.numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs["clipwise_output"]), clip_ref.numpy(), atol=1e-5, rtol=1e-4
    )


def test_convnext_conversion_handles_gamma_rename():
    net = build_torch_convnext()
    state = {f"preprocessor.encoder.{k}": v.numpy() for k, v in net.state_dict().items()}
    legacy = {k.replace(".scale_layer", ".gamma"): v for k, v in state.items()}
    p1 = convert_convnext(state)
    p2 = convert_convnext(legacy)
    np.testing.assert_array_equal(
        p1["stages"][2][1]["scale"], p2["stages"][2][1]["scale"]
    )


def test_conette_conversion_forward_parity():
    """model.* prefix: projection Sequential + torch TransformerDecoder."""
    d_model, vocab, nhead, nlayers, ff = 32, 40, 2, 2, 64
    proj = tnn.Sequential(
        tnn.Dropout(0.5), tnn.Identity(), tnn.Linear(768, d_model), tnn.ReLU(),
    )
    layer = tnn.TransformerDecoderLayer(
        d_model, nhead, ff, dropout=0.0, activation=torch.nn.functional.gelu,
        batch_first=False, norm_first=False,
    )
    dec = tnn.TransformerDecoder(layer, nlayers)
    emb = tnn.Embedding(vocab, d_model, padding_idx=0)
    cls = tnn.Linear(d_model, vocab)
    state = {}
    state |= {f"model.projection.{k}": v.numpy() for k, v in proj.state_dict().items()}
    state |= {f"model.decoder.{k}": v.numpy() for k, v in dec.state_dict().items()}
    state |= {f"model.decoder.emb_layer.{k}": v.numpy() for k, v in emb.state_dict().items()}
    state |= {f"model.decoder.classifier.{k}": v.numpy() for k, v in cls.state_dict().items()}

    params = convert_conette(state)
    cfg = ConetteConfig(vocab_size=vocab, d_model=d_model, nhead=nhead,
                        num_decoder_layers=nlayers, dim_feedforward=ff)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 9, 768)).astype(np.float32)
    lens = np.asarray([9, 6], np.int32)
    ids = rng.integers(3, vocab, size=(2, 5)).astype(np.int64)

    memory, pad_mask = encode_audio(params, cfg, jnp.asarray(audio), jnp.asarray(lens))
    ours = np.asarray(
        decoder_forward(
            params["decoder"], cfg.decoder_config(), memory, jnp.asarray(ids),
            memory_key_padding_mask=pad_mask,
            caps_in_pad_mask=jnp.zeros_like(jnp.asarray(ids), dtype=bool),
        )
    )

    with torch.no_grad():
        proj.eval()
        mem_t = proj(torch.from_numpy(audio))  # (B, T, d)
        pad_t = torch.from_numpy(np.asarray(pad_mask))
        from conette_tpu.models.decoder import sinusoidal_positions

        x = emb(torch.from_numpy(ids)) * math.sqrt(d_model)
        pe = torch.from_numpy(sinusoidal_positions(5, d_model))
        x = (x + pe[None]).transpose(0, 1)
        sq = torch.triu(torch.full((5, 5), float("-inf")), diagonal=1)
        out = dec(
            tgt=x, memory=mem_t.transpose(0, 1), tgt_mask=sq,
            memory_key_padding_mask=pad_t,
        )
        ref = cls(out).transpose(0, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_flatten_unflatten_roundtrip(tmp_path):
    tree = {
        "a": {"b": np.arange(6).reshape(2, 3).astype(np.float32)},
        "lst": [
            {"w": np.ones((2,), np.float32)},
            {"w": np.zeros((2,), np.float32)},
        ],
    }
    flat = flatten_pytree(tree)
    assert set(flat) == {"a/b", "lst/0/w", "lst/1/w"}
    rec = unflatten_pytree(flat)
    assert isinstance(rec["lst"], list)
    np.testing.assert_array_equal(rec["a"]["b"], tree["a"]["b"])

    fpath = str(tmp_path / "p.npz")
    save_params_npz(fpath, tree)
    loaded = load_params_npz(fpath)
    np.testing.assert_array_equal(loaded["lst"][0]["w"], tree["lst"][0]["w"])


def test_num_frames_helper():
    assert num_frames(320_000, 1024, 320) == 1001


def test_remap_unpickler_blocks_arbitrary_globals():
    """Untrusted _extra_state_ pickles must not execute reduce payloads
    (ADVICE r1: weights_only + allowlisted unpickler)."""
    import pickle

    import pytest as _pytest

    from conette_tpu.huggingface.convert import loads_remapped

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("true",))

    with _pytest.raises(pickle.UnpicklingError, match="Blocked unpickling"):
        loads_remapped(pickle.dumps({"x": Evil()}))
