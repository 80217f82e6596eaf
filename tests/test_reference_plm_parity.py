"""PLM-layer parity vs the reference's ACTUAL ``pl_modules`` code.

The train-step golden (``tests/test_train_step_golden.py``) re-expresses the
reference training math in torch by hand and only imports the real decoder.
Here the whole Lightning-module layer runs for real — the reference's
genuine ``CoNeTTEPLM`` (``pl_modules/conette.py:34-551``) and real
``AACTokenizer`` (``tokenization/aac_tokenizer.py:34-963``) imported via
``tests/reference_shim.py`` (lightning/spacy/nltk twins) — and the JAX
stack must match it end to end:

* tokenizer: fit on the same corpus → identical vocab, ids, decode strings
  (the spacy shim routes BOTH sides through the regex twin, so this pins
  the normalizer pipeline + vocab-build + encode/decode glue);
* ``build_model``: task-token ids (``conette.py:99-129``) and the
  content-words forbid-repetition mask built from real nltk stopword data
  (``pl_modules/common.py:222-299``);
* ``on_after_batch_transfer`` task rewriting (``conette.py:527-550``);
* ``training_step`` (``conette.py:187-231``): loss ≤1e-6 and per-parameter
  grads ≤1e-5 with identical (λ, perm) injected on both sides;
* ``validation_step`` (``conette.py:233-291``): multi-reference
  ``CrossEntropyLossMean`` loss ≤1e-6 + generated cands string-equal;
* ``forward(batch, "generate")`` (``conette.py:352-383``): beam preds
  bit-match through the PLM glue (task BOS ids + stored forbid mask).

Dropout is disabled on both sides (``plm.eval()`` / p=0 config) so the
only randomness is the injected mixup pair.
"""

from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from conette_tpu.huggingface.convert import convert_conette
from conette_tpu.models.conette import (
    ConetteConfig,
    add_task_tokens,
    build_forbid_rep_mask,
    encode_audio,
    forward_generate,
    tasks_to_bos_ids,
)
from conette_tpu.tokenization import AACTokenizer
from conette_tpu.train.objective import training_loss, validation_loss

pytestmark = pytest.mark.skipif(
    not Path("/root/reference/src").is_dir(), reason="reference tree not staged"
)

CORPUS = [
    "a bird is singing in the forest",
    "an engine hums loudly and then stops",
    "rain falls on a tin roof",
    "a man is speaking to a large crowd",
    "waves crash against the rocky shore",
]
TASKS = ("clotho", "audiocaps")
PAD, BOS, EOS = 0, 1, 2
D, NHEAD, LAYERS, FF = 32, 2, 2, 64
SMOOTH = 0.2


@pytest.fixture(scope="module")
def twin():
    """(reference namespace, ref PLM, our tokenizer, cfg, jax params)."""
    from reference_shim import load_reference_plm

    ns = load_reference_plm()

    ref_tok = ns.AACTokenizer()
    ref_tok.fit(CORPUS)

    torch.manual_seed(123)
    plm = ns.CoNeTTEPLM(
        task_mode="ds_src", task_names=TASKS, label_smoothing=SMOOTH,
        mixup_alpha=0.4, proj_name="lin768", min_pred_size=1,
        max_pred_size=8, beam_size=2, nhead=NHEAD, d_model=D,
        num_decoder_layers=LAYERS, decoder_dropout_p=0.0,
        dim_feedforward=FF, train_tokenizer=ref_tok, verbose=0,
    )
    plm.eval()  # dropout off; loss/grad math is mode-independent

    our_tok = AACTokenizer()
    our_tok.fit(CORPUS)
    task_ids = add_task_tokens(our_tok, TASKS, "ds_src")

    cfg = ConetteConfig(
        vocab_size=ref_tok.get_vocab_size(), task_mode="ds_src",
        task_names=TASKS, label_smoothing=SMOOTH, proj_in=768,
        proj_dropout_p=0.0, min_pred_size=1, max_pred_size=8, beam_size=2,
        nhead=NHEAD, d_model=D, num_decoder_layers=LAYERS,
        decoder_dropout_p=0.0, dim_feedforward=FF,
        bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    jparams = jax.tree.map(
        jnp.asarray, convert_conette(_model_state(plm, lambda p: p.detach()))
    )
    return ns, plm, ref_tok, our_tok, task_ids, cfg, jparams


def _model_state(plm, getter):
    """decoder/projection tensors (weights or grads) as a converter-ready
    ``model.``-prefixed numpy state dict."""
    out = {}
    for name, p in plm.named_parameters():
        if not name.startswith(("decoder.", "projection.")):
            continue
        t = getter(p)
        if t is None:
            continue
        out["model." + name] = t.cpu().numpy().copy()
    return out


def _batch(seed=7, b=4, t=6):
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((b, t, 768)).astype(np.float32) * 0.4
    lens = rng.integers(3, t + 1, size=b).astype(np.int64)
    lens[0] = t
    return audio, lens


def _torch_batch(audio, lens, caps):
    b = audio.shape[0]
    lens_t = torch.from_numpy(lens)
    return {
        "audio": torch.from_numpy(audio)[:, None],  # (B, 1, T, 768)
        "audio_shape": torch.stack(
            [torch.ones_like(lens_t), lens_t, torch.full_like(lens_t, 768)],
            dim=1,
        ),
        "captions": torch.from_numpy(np.asarray(caps, np.int64)),
        "dataset": ["clotho"] * b,
        "source": [None] * b,
    }


# --------------------------------------------------------------- tokenizer
def test_tokenizer_twin_parity(twin):
    ns, plm, ref_tok, our_tok, task_ids, cfg, jparams = twin
    assert dict(ref_tok.get_vocab()) == dict(our_tok.get_vocab())
    assert ref_tok.get_max_sentence_size() == our_tok.get_max_sentence_size()

    ref_ids = ref_tok.encode_batch(CORPUS, padding="batch")
    our_ids = our_tok.encode_batch(CORPUS, padding="batch")
    np.testing.assert_array_equal(ref_ids.numpy(), np.asarray(our_ids))

    back_ref = ref_tok.decode_batch(ref_ids)
    back_our = our_tok.decode_batch(np.asarray(our_ids))
    assert back_ref == back_our


def test_build_model_twins(twin):
    ns, plm, ref_tok, our_tok, task_ids, cfg, jparams = twin
    assert plm.task_name_to_token_id == task_ids
    ref_mask = plm.forbid_rep_mask.numpy()
    our_mask = build_forbid_rep_mask(our_tok, "content_words")
    np.testing.assert_array_equal(ref_mask, our_mask)
    assert ref_mask.sum() < ref_mask.size  # stopwords actually excluded


def test_batch_transfer_task_rewrite(twin):
    ns, plm, ref_tok, our_tok, task_ids, cfg, jparams = twin
    audio, lens = _batch()
    caps = ref_tok.encode_batch(CORPUS[:4], padding="batch")
    batch = _torch_batch(audio, lens, caps.numpy())
    batch["dataset"] = ["clotho", "audiocaps", "clotho", "audiocaps"]
    batch = plm.on_after_batch_transfer(batch, 0)
    want = tasks_to_bos_ids(cfg, task_ids, batch["dataset"], batch["source"])
    np.testing.assert_array_equal(batch["captions"][:, 0].numpy(), want)


# ------------------------------------------------------------ training_step
@pytest.mark.parametrize("lbd", [0.7, 0.55])
def test_training_step_loss_and_grads(twin, monkeypatch, lbd):
    ns, plm, ref_tok, our_tok, task_ids, cfg, jparams = twin
    audio, lens = _batch()
    b = audio.shape[0]
    perm = np.roll(np.arange(b), 1)

    monkeypatch.setattr(
        ns.conette_module, "randperm_diff",
        lambda n, device=None: torch.from_numpy(perm.copy()),
    )
    monkeypatch.setattr(
        ns.conette_module, "sample_lambda",
        lambda *a, **k: torch.tensor(lbd),
    )

    caps = ref_tok.encode_batch(CORPUS[:4], padding="batch")
    batch = plm.on_after_batch_transfer(_torch_batch(audio, lens, caps.numpy()), 0)

    plm.zero_grad(set_to_none=True)
    tloss = plm.training_step(batch)
    tloss.backward()

    jbatch = {
        "audio": jnp.asarray(audio),
        "audio_lens": jnp.asarray(lens),
        "captions": jnp.asarray(batch["captions"].numpy()),
    }
    jloss, jgrads = jax.value_and_grad(training_loss)(
        jparams, cfg, jbatch, jax.random.PRNGKey(0),
        mixup_override=(jnp.float32(lbd), jnp.asarray(perm)),
    )

    assert float(jloss) == pytest.approx(float(tloss.detach()), abs=1e-6)

    tgrads = convert_conette(_model_state(plm, lambda p: p.grad))
    flat_j, _ = jax.tree_util.tree_flatten_with_path(jgrads)
    flat_t, _ = jax.tree_util.tree_flatten_with_path(tgrads)
    assert len(flat_j) == len(flat_t)
    for (path, g), (_, w) in zip(flat_j, flat_t):
        diff = float(np.abs(np.asarray(g) - np.asarray(w)).max())
        assert diff <= 1e-5, f"grad mismatch at {jax.tree_util.keystr(path)}: {diff:.2e}"


# ---------------------------------------------------------- validation_step
def test_validation_step_loss_and_cands(twin):
    ns, plm, ref_tok, our_tok, task_ids, cfg, jparams = twin
    audio, lens = _batch(seed=11)
    b = audio.shape[0]

    mult = torch.stack([ref_tok.encode_batch(CORPUS, padding="batch")] * b)
    batch = _torch_batch(audio, lens, np.zeros((b, 2), np.int64))
    del batch["captions"]
    batch["mult_captions"] = mult
    batch["mult_references"] = [CORPUS] * b
    batch = plm.on_after_batch_transfer(batch, 0)

    with torch.no_grad():
        out = plm.validation_step(batch)
    ref_loss = float(plm.logged["val/loss"])

    jbatch = {
        "audio": jnp.asarray(audio),
        "audio_lens": jnp.asarray(lens),
        "mult_captions": jnp.asarray(batch["mult_captions"].numpy()),
    }
    jloss = validation_loss(jparams, cfg, jbatch)
    assert float(jloss) == pytest.approx(ref_loss, abs=1e-6)

    memory, memory_pad = encode_audio(
        jparams, cfg, jbatch["audio"], jbatch["audio_lens"]
    )
    bos = tasks_to_bos_ids(cfg, task_ids, batch["dataset"], batch["source"])
    res = forward_generate(
        jparams, cfg, memory, memory_pad, jnp.asarray(bos),
        forbid_rep_mask=jnp.asarray(plm.forbid_rep_mask.numpy()),
    )
    our_cands = our_tok.decode_batch(np.asarray(res.best_preds))
    assert out["cands_generate"] == our_cands


# ------------------------------------------------------- forward("generate")
def test_forward_generate_bitmatch(twin):
    ns, plm, ref_tok, our_tok, task_ids, cfg, jparams = twin
    audio, lens = _batch(seed=23)
    b = audio.shape[0]
    batch = _torch_batch(audio, lens, np.zeros((b, 2), np.int64))
    del batch["captions"]
    batch["dataset"] = ["audiocaps", "clotho", "clotho", "audiocaps"]

    with torch.no_grad():
        out = plm.forward(batch, "generate")

    memory, memory_pad = encode_audio(
        jparams, cfg, jnp.asarray(audio), jnp.asarray(lens)
    )
    bos = tasks_to_bos_ids(cfg, task_ids, batch["dataset"], batch["source"])
    res = forward_generate(
        jparams, cfg, memory, memory_pad, jnp.asarray(bos),
        forbid_rep_mask=jnp.asarray(plm.forbid_rep_mask.numpy()),
    )

    assert out["cands"] == our_tok.decode_batch(np.asarray(res.best_preds))
    # best-hypothesis token bit-match (pad-trimmed rows)
    ref_preds = out["preds"].numpy()
    got_preds = np.asarray(res.best_preds)
    for i in range(b):
        ref_row = ref_preds[i][ref_preds[i] != PAD]
        got_row = got_preds[i][got_preds[i] != PAD]
        np.testing.assert_array_equal(ref_row, got_row)
    np.testing.assert_allclose(
        np.asarray(res.best_avg_lprobs), out["lprobs"].numpy(),
        atol=1e-4, rtol=1e-4,
    )


# ----------------------------------------------------------- BaselinePLM
@pytest.fixture(scope="module")
def baseline_twin(twin):
    """Reference BaselinePLM (plain-BOS decode, greedy support,
    ``pl_modules/baseline.py:35-437``) + converted JAX params."""
    ns, _, ref_tok, our_tok, _, _, _ = twin
    tok = ns.AACTokenizer()
    tok.fit(CORPUS)
    torch.manual_seed(321)
    plm = ns.BaselinePLM(
        label_smoothing=SMOOTH, mixup_alpha=0.4, proj_name="lin768",
        min_pred_size=1, max_pred_size=8, beam_size=2, nhead=NHEAD,
        d_model=D, num_decoder_layers=LAYERS, decoder_dropout_p=0.0,
        dim_feedforward=FF, train_tokenizer=tok, verbose=0,
    )
    plm.eval()
    cfg = ConetteConfig(
        vocab_size=tok.get_vocab_size(), task_mode="none", task_names=(),
        label_smoothing=SMOOTH, proj_in=768, proj_dropout_p=0.0,
        min_pred_size=1, max_pred_size=8, beam_size=2, nhead=NHEAD,
        d_model=D, num_decoder_layers=LAYERS, decoder_dropout_p=0.0,
        dim_feedforward=FF, bos_id=BOS, eos_id=EOS, pad_id=PAD,
    )
    jparams = jax.tree.map(
        jnp.asarray, convert_conette(_model_state(plm, lambda p: p.detach()))
    )
    return plm, cfg, jparams


def test_baseline_greedy_and_beam_bitmatch(baseline_twin, twin):
    from conette_tpu.models.conette import forward_greedy

    ns, _, ref_tok, our_tok, _, _, _ = twin
    plm, cfg, jparams = baseline_twin
    audio, lens = _batch(seed=31)
    b = audio.shape[0]
    batch = _torch_batch(audio, lens, np.zeros((b, 2), np.int64))
    del batch["captions"]

    memory, memory_pad = encode_audio(
        jparams, cfg, jnp.asarray(audio), jnp.asarray(lens)
    )
    bos = jnp.full((b,), BOS, jnp.int32)
    fmask = jnp.asarray(plm.forbid_rep_mask.numpy())

    # greedy: reference returns (B, vocab, L) logits; argmax = tokens
    with torch.no_grad():
        ref_logits = plm.forward(batch, "greedy")
    ref_greedy = ref_logits.argmax(dim=1).numpy()
    got = forward_greedy(
        jparams, cfg, memory, memory_pad, bos, forbid_rep_mask=fmask
    )
    got_tokens = np.asarray(got.preds)
    for i in range(b):
        ref_row = _trim_at_eos(ref_greedy[i])
        got_row = _trim_at_eos(got_tokens[i])
        np.testing.assert_array_equal(ref_row, got_row)

    # beam through the baseline glue (plain BOS)
    with torch.no_grad():
        out = plm.forward(batch, "generate")
    res = forward_generate(
        jparams, cfg, memory, memory_pad, bos, forbid_rep_mask=fmask
    )
    ref_preds = out["preds"].numpy()
    got_preds = np.asarray(res.best_preds)
    for i in range(b):
        np.testing.assert_array_equal(
            ref_preds[i][ref_preds[i] != PAD], got_preds[i][got_preds[i] != PAD]
        )


def _trim_at_eos(row, eos=EOS, pad=PAD):
    row = row[row != pad]
    hits = np.flatnonzero(row == eos)
    return row[: hits[0] + 1] if hits.size else row
