"""Train-step torch golden vs the reference's ACTUAL decoder (VERDICT r2 #5).

One full production training step — asymmetric mixup on audio AND token
embeddings with a fixed (λ, perm), projection, teacher forcing through the
REAL reference ``AACTransformerDecoder`` (imported via
``tests/reference_shim.py``), label-smoothed CE with pad masking, then one
AdamW step with the custom weight-decay split — executed in both torch and
JAX from identical weights and inputs. Asserts:

* loss parity ≤ 1e-6,
* gradient parity ≤ 1e-5 on every parameter (mapped through the
  production converter),
* post-step parameter parity ≤ 1e-5 (torch ``AdamW`` decoupled decay vs
  ``optax.adamw`` with the same ndim>=2 mask).

Reference semantics: ``pl_modules/conette.py:187-231`` (training_step),
``pl_modules/common.py:59-78`` (projection), ``transforms/mixup.py:14-56``
(λ folding), ``optim/optimizers.py:17-81`` (custom-wd split).
"""

import math
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from conette_tpu.huggingface.convert import convert_conette
from conette_tpu.models.conette import ConetteConfig
from conette_tpu.train.objective import training_loss
from conette_tpu.train.optim import decay_mask

pytestmark = pytest.mark.skipif(
    not Path("/root/reference/src").is_dir(), reason="reference tree not staged"
)

VOCAB, D, NHEAD, LAYERS, FF, E_AUDIO = 32, 32, 2, 2, 64, 48
PAD, BOS, EOS = 0, 1, 2
LR, WD, SMOOTH = 5e-4, 2.0, 0.2

CFG = ConetteConfig(
    vocab_size=VOCAB, label_smoothing=SMOOTH, proj_in=E_AUDIO,
    proj_dropout_p=0.0, nhead=NHEAD, d_model=D,
    num_decoder_layers=LAYERS, decoder_dropout_p=0.0, dim_feedforward=FF,
    bos_id=BOS, eos_id=EOS, pad_id=PAD,
)


@pytest.fixture(scope="module")
def twin():
    """(torch decoder+proj, converted jax params) sharing weights."""
    from reference_shim import load_reference_decoding

    ref = load_reference_decoding()
    torch.manual_seed(99)
    dec = ref.AACTransformerDecoder(
        vocab_size=VOCAB, bos_id=BOS, eos_id=EOS, pad_id=PAD,
        d_model=D, dim_feedforward=FF, dropout=0.0,
        nhead=NHEAD, num_decoder_layers=LAYERS,
    )
    proj = torch.nn.Linear(E_AUDIO, D)
    state = {
        "model.decoder." + k: v.detach().cpu().numpy().copy()
        for k, v in dec.state_dict().items()
    }
    state["model.projection.2.weight"] = proj.weight.detach().numpy().copy()
    state["model.projection.2.bias"] = proj.bias.detach().numpy().copy()
    jparams = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x)), convert_conette(state)
    )
    return ref, dec, proj, jparams


def _batch(seed=7, b=4, t=6, L=9):
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((b, t, E_AUDIO)).astype(np.float32) * 0.5
    lens = rng.integers(3, t + 1, size=b).astype(np.int32)
    lens[0] = t
    caps = rng.integers(4, VOCAB, size=(b, L)).astype(np.int32)
    caps[:, 0] = BOS
    cap_lens = rng.integers(4, L + 1, size=b)
    for i in range(b):
        caps[i, cap_lens[i] - 1] = EOS
        caps[i, cap_lens[i]:] = PAD
    return audio, lens, caps


def _torch_loss(ref, dec, proj, audio, lens, caps, lbd, perm):
    """The reference training step, torch side (conette.py:187-231)."""
    audio_t = torch.from_numpy(audio)
    caps_t = torch.from_numpy(caps.astype(np.int64))
    caps_in, caps_out = caps_t[:, :-1], caps_t[:, 1:]

    caps_emb = dec.emb_layer(caps_in)  # (B, L-1, D), pre-scale
    idx = torch.from_numpy(perm.astype(np.int64))
    audio_m = audio_t * lbd + audio_t[idx] * (1.0 - lbd)
    lens_m = np.maximum(lens, lens[perm])
    caps_emb_m = caps_emb * lbd + caps_emb[idx] * (1.0 - lbd)

    memory = torch.relu(proj(audio_m))  # (B, T, D)
    t = memory.shape[1]
    pad_mask = torch.from_numpy(
        (np.arange(t)[None, :] >= lens_m[:, None])
    )
    logits = ref.teacher_forcing(
        decoder=dec, pad_id=PAD, bos_id=BOS, eos_id=EOS, vocab_size=VOCAB,
        frame_embs=memory.permute(0, 2, 1),  # (B, E, T) reference layout
        frame_embs_pad_mask=pad_mask,
        caps_in=caps_emb_m,
        caps_in_pad_mask=(caps_in == PAD),
    )  # (B, vocab, L-1)
    loss_fn = torch.nn.CrossEntropyLoss(ignore_index=PAD, label_smoothing=SMOOTH)
    return loss_fn(logits, caps_out)


def _jax_loss(jparams, audio, lens, caps, lbd, perm):
    batch = {
        "audio": jnp.asarray(audio),
        "audio_lens": jnp.asarray(lens),
        "captions": jnp.asarray(caps),
    }
    return training_loss(
        jparams, CFG, batch, jax.random.PRNGKey(0),
        mixup_override=(jnp.float32(lbd), jnp.asarray(perm)),
    )


def _grads_as_jax_tree(dec, proj):
    """Map torch .grad tensors through the production converter (the same
    layout transforms apply to gradients as to weights)."""
    state = {
        "model.decoder." + k: p.grad.detach().cpu().numpy().copy()
        for k, p in dec.named_parameters()
    }
    state["model.projection.2.weight"] = proj.weight.grad.detach().numpy().copy()
    state["model.projection.2.bias"] = proj.bias.grad.detach().numpy().copy()
    return convert_conette(state)


def _params_as_jax_tree(dec, proj):
    state = {
        "model.decoder." + k: v.detach().cpu().numpy().copy()
        for k, v in dec.state_dict().items()
    }
    state["model.projection.2.weight"] = proj.weight.detach().numpy().copy()
    state["model.projection.2.bias"] = proj.bias.detach().numpy().copy()
    return convert_conette(state)


def _assert_trees_close(got, want, atol, what):
    flat_g, _ = jax.tree_util.tree_flatten_with_path(got)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want)
    assert len(flat_g) == len(flat_w)
    for (path_g, g), (_, w) in zip(flat_g, flat_w):
        name = jax.tree_util.keystr(path_g)
        diff = float(np.abs(np.asarray(g) - np.asarray(w)).max())
        assert diff <= atol, f"{what} mismatch at {name}: {diff:.2e}"


@pytest.mark.parametrize("lbd", [0.7, 0.55])
def test_loss_and_grads_match_torch(twin, lbd):
    ref, dec, proj, jparams = twin
    audio, lens, caps = _batch()
    perm = np.roll(np.arange(audio.shape[0]), 1)

    dec.zero_grad(set_to_none=True)
    proj.zero_grad(set_to_none=True)
    tl = _torch_loss(ref, dec, proj, audio, lens, caps, lbd, perm)
    tl.backward()

    jl, jgrads = jax.value_and_grad(_jax_loss)(jparams, audio, lens, caps, lbd, perm)

    assert float(jl) == pytest.approx(float(tl.detach()), abs=1e-6)
    # the torch decoder embedding row for PAD gets no grad contribution from
    # padding_idx zeroing; both sides mask pads identically so rows agree
    _assert_trees_close(jgrads, _grads_as_jax_tree(dec, proj), 1e-5, "grad")


def test_adamw_custom_wd_step_matches_torch(twin):
    ref, dec, proj, jparams = twin
    audio, lens, caps = _batch(seed=11)
    perm = np.roll(np.arange(audio.shape[0]), 1)
    lbd = 0.65

    # torch: one AdamW step with the custom decay/no-decay split
    named = list(dec.named_parameters()) + [
        ("projection.weight", proj.weight), ("projection.bias", proj.bias)
    ]
    decay = [p for n, p in named if p.ndim >= 2]
    no_decay = [p for n, p in named if p.ndim < 2]
    opt = torch.optim.AdamW(
        [
            {"params": no_decay, "weight_decay": 0.0},
            {"params": decay, "weight_decay": WD},
        ],
        lr=LR,
    )
    opt.zero_grad(set_to_none=True)
    _torch_loss(ref, dec, proj, audio, lens, caps, lbd, perm).backward()
    opt.step()

    # jax: optax.adamw with the ndim>=2 mask and a constant lr, fed the
    # IDENTICAL (torch) gradients — at step 1 Adam's update is ~sign(g)·lr,
    # so sub-tolerance grad noise at near-zero elements would otherwise
    # amplify to O(lr); grad parity itself is covered by the test above
    grads = jax.tree.map(jnp.asarray, _grads_as_jax_tree(dec, proj))
    tx = optax.adamw(learning_rate=LR, weight_decay=WD, mask=decay_mask(jparams))
    opt_state = tx.init(jparams)
    updates, _ = tx.update(grads, opt_state, jparams)
    new_params = optax.apply_updates(jparams, updates)

    _assert_trees_close(
        new_params, _params_as_jax_tree(dec, proj), 1e-6, "post-step param"
    )


def test_decay_mask_matches_torch_split(twin):
    """The optax mask must reproduce the reference rule: 1-d tensors and
    biases get NO decay, >=2-d weights do (optimizers.py:56-81)."""
    _, dec, proj, jparams = twin
    mask = decay_mask(jparams)
    flat_mask, _ = jax.tree_util.tree_flatten_with_path(mask)
    flat_params, _ = jax.tree_util.tree_flatten_with_path(jparams)
    for (path, decayed), (_, p) in zip(flat_mask, flat_params):
        name = jax.tree_util.keystr(path)
        assert bool(decayed) == (np.ndim(p) >= 2), name
        if "bias" in name or "norm" in name:
            assert not bool(decayed), name
