"""Decode parity vs the reference's ACTUAL code (not a builder oracle).

Rounds 1-2 proved beam/greedy/forcing parity against a hand-written Python
oracle (``tests/test_decoding.py``) — which would hide a shared
misunderstanding. Here the reference's real modules are imported from
``/root/reference`` via ``tests/reference_shim.py`` (a ~100-line
``torchoutil`` shim is the only missing dependency), seeded with random
weights, those exact weights are converted through the production
converter (``conette_tpu/huggingface/convert.py::convert_conette``), and
the JAX decode stack must match:

* greedy: token bit-match + step-logit parity
  (reference ``nn/decoding/greedy.py:18-131``)
* beam:  best-hypothesis token bit-match + avg-lprob parity + global-beam
  multiset parity (reference ``nn/decoding/beam.py:23-269``; the reference
  indexes finished beams by original slot label, we retire in finish
  order, so the global comparison is order-insensitive)
* teacher forcing: full logit parity at non-pad query positions
  (reference ``nn/decoding/forcing.py:12-71``; torch NaN-guards rows whose
  query is PAD, so those columns are excluded, same caveat as
  ``tests/test_decoder.py``)

The old oracle tests are kept as a secondary check.
"""

import math
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from conette_tpu.decoding.beam import beam_search
from conette_tpu.decoding.greedy import greedy_search
from conette_tpu.huggingface.convert import convert_conette
from conette_tpu.models.decoder import DecoderConfig, decoder_forward

pytestmark = pytest.mark.skipif(
    not Path("/root/reference/src").is_dir(), reason="reference tree not staged"
)

VOCAB, D, NHEAD, LAYERS, FF = 32, 32, 2, 2, 64
PAD, BOS, EOS = 0, 1, 2
CFG = DecoderConfig(
    vocab_size=VOCAB, d_model=D, nhead=NHEAD, num_layers=LAYERS,
    dim_feedforward=FF, dropout_p=0.0, bos_id=BOS, eos_id=EOS, pad_id=PAD,
)


@pytest.fixture(scope="module")
def ref():
    from reference_shim import load_reference_decoding

    return load_reference_decoding()


@pytest.fixture(scope="module")
def twin(ref):
    """(reference torch decoder, converted JAX params) with shared weights."""
    torch.manual_seed(1234)
    dec = ref.AACTransformerDecoder(
        vocab_size=VOCAB, bos_id=BOS, eos_id=EOS, pad_id=PAD,
        d_model=D, dim_feedforward=FF, dropout=0.0,
        nhead=NHEAD, num_decoder_layers=LAYERS,
    ).eval()
    state = {
        "model.decoder." + k: v.detach().cpu().numpy()
        for k, v in dec.state_dict().items()
    }
    # convert_conette requires a projection entry; unused here (the tests
    # feed already-projected memory, as beam/greedy/forcing themselves do)
    state["model.projection.2.weight"] = np.eye(D, dtype=np.float32)
    state["model.projection.2.bias"] = np.zeros(D, np.float32)
    jparams = jax.tree.map(jnp.asarray, convert_conette(state)["decoder"])
    return dec, jparams


def _make_inputs(seed: int, bsize: int = 3, t_mem: int = 7):
    rng = np.random.default_rng(seed)
    memory = rng.standard_normal((bsize, t_mem, D)).astype(np.float32) * 0.6
    lens = rng.integers(3, t_mem + 1, size=bsize)
    lens[0] = t_mem
    mem_pad = np.arange(t_mem)[None, :] >= lens[:, None]
    memory[mem_pad] = 0.0
    return memory, mem_pad


def _ref_layout(memory: np.ndarray) -> torch.Tensor:
    # reference decode fns take frame_embs (bsize, emb_size, n_frames)
    return torch.from_numpy(memory).permute(0, 2, 1).contiguous()


def _forbid_mask(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed + 100)
    forbid = rng.random(VOCAB) > 0.55
    forbid[[PAD, BOS, EOS]] = False
    return forbid


def _strip(row, pad=PAD):
    row = list(int(t) for t in row)
    while row and row[-1] == pad:
        row.pop()
    return tuple(row)


@pytest.mark.parametrize(
    "min_pred,max_pred,use_forbid,seed",
    [(0, 10, False, 0), (2, 10, True, 1), (0, 6, True, 2), (3, 12, False, 3)],
)
def test_greedy_matches_reference_code(ref, twin, min_pred, max_pred, use_forbid, seed):
    dec, jparams = twin
    memory, mem_pad = _make_inputs(seed)
    forbid = _forbid_mask(seed) if use_forbid else None

    with torch.no_grad():
        ref_logits = ref.greedy_search(
            decoder=dec, pad_id=PAD, bos_id=BOS, eos_id=EOS, vocab_size=VOCAB,
            frame_embs=_ref_layout(memory),
            frame_embs_pad_mask=torch.from_numpy(mem_pad),
            min_pred_size=min_pred, max_pred_size=max_pred,
            forbid_rep_mask=None if forbid is None else torch.from_numpy(forbid),
        )
    ref_logits = ref_logits.numpy()  # (B, vocab, L_ref)
    ref_preds = ref_logits.argmax(axis=1)  # (B, L_ref)
    l_ref = ref_logits.shape[2]

    out = greedy_search(
        jparams, CFG, jnp.asarray(memory), jnp.asarray(mem_pad),
        jnp.full((memory.shape[0],), BOS, jnp.int32),
        min_pred_size=min_pred, max_pred_size=max_pred,
        forbid_rep_mask=None if forbid is None else jnp.asarray(forbid),
    )
    preds = np.asarray(out.preds)
    logits = np.asarray(out.logits)

    np.testing.assert_array_equal(preds[:, :l_ref], ref_preds)
    assert (preds[:, l_ref:] == PAD).all()

    jl = logits[:, :, :l_ref]
    finite = np.isfinite(ref_logits) & np.isfinite(jl)
    np.testing.assert_array_equal(np.isfinite(ref_logits), np.isfinite(jl))
    np.testing.assert_allclose(jl[finite], ref_logits[finite], atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "beam,min_pred,max_pred,use_forbid,per_task_bos,seed",
    [
        (1, 0, 10, False, False, 0),
        (2, 2, 10, True, True, 1),
        (3, 0, 12, True, True, 2),
        (3, 3, 8, False, False, 3),
        (4, 1, 10, True, True, 4),
    ],
)
def test_beam_matches_reference_code(
    ref, twin, beam, min_pred, max_pred, use_forbid, per_task_bos, seed
):
    dec, jparams = twin
    memory, mem_pad = _make_inputs(seed)
    bsize = memory.shape[0]
    forbid = _forbid_mask(seed) if use_forbid else None
    if per_task_bos:
        bos_ids = np.array([BOS, 5, 9][:bsize], np.int64)
    else:
        bos_ids = np.full((bsize,), BOS, np.int64)

    with torch.no_grad():
        rb, rb_avg, rg, rg_avg = ref.generate(
            decoder=dec, pad_id=PAD, bos_id=torch.from_numpy(bos_ids),
            eos_id=EOS, vocab_size=VOCAB,
            frame_embs=_ref_layout(memory),
            frame_embs_pad_mask=torch.from_numpy(mem_pad),
            beam_size=beam, min_pred_size=min_pred, max_pred_size=max_pred,
            forbid_rep_mask=None if forbid is None else torch.from_numpy(forbid),
        )
    rb, rb_avg = rb.numpy(), rb_avg.numpy()
    rg, rg_avg = rg.numpy(), rg_avg.numpy()

    out = beam_search(
        jparams, CFG, jnp.asarray(memory), jnp.asarray(mem_pad),
        jnp.asarray(bos_ids, dtype=jnp.int32),
        beam_size=beam, min_pred_size=min_pred, max_pred_size=max_pred,
        forbid_rep_mask=None if forbid is None else jnp.asarray(forbid),
    )
    best = np.asarray(out.best_preds)
    best_avg = np.asarray(out.best_avg_lprobs)
    glob = np.asarray(out.global_preds)
    glob_avg = np.asarray(out.global_avg_lprobs)

    # best hypothesis: token bit-match (pad conventions differ only in tail)
    for b in range(bsize):
        assert _strip(best[b]) == _strip(rb[b]), (
            f"row {b}: jax={_strip(best[b])} ref={_strip(rb[b])}"
        )
    np.testing.assert_allclose(best_avg, rb_avg, atol=1e-4, rtol=1e-4)

    # global beams: the reference stores finished beams at their original
    # slot label (beam.py:185-200), we store them in finish order — compare
    # as score-sorted multisets per example
    for b in range(bsize):
        ours = sorted(
            ((-glob_avg[b, j], _strip(glob[b, j])) for j in range(beam))
        )
        theirs = sorted(
            ((-rg_avg[b, j], _strip(rg[b, j])) for j in range(beam))
        )
        for (sa, ta), (sb_, tb) in zip(ours, theirs):
            assert ta == tb, f"row {b}: jax={ta} ref={tb}"
            np.testing.assert_allclose(-sa, -sb_, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_teacher_forcing_matches_reference_code(ref, twin, seed):
    dec, jparams = twin
    memory, mem_pad = _make_inputs(seed, bsize=4, t_mem=6)
    rng = np.random.default_rng(seed + 50)
    bsize, l_cap = 4, 9
    lens = rng.integers(3, l_cap + 1, size=bsize)
    lens[0] = l_cap
    caps = rng.integers(3, VOCAB, size=(bsize, l_cap)).astype(np.int64)
    caps[:, 0] = BOS
    for b in range(bsize):
        caps[b, lens[b] - 1] = EOS
        caps[b, lens[b]:] = PAD

    with torch.no_grad():
        ref_logits = ref.teacher_forcing(
            decoder=dec, pad_id=PAD, bos_id=BOS, eos_id=EOS, vocab_size=VOCAB,
            frame_embs=_ref_layout(memory),
            frame_embs_pad_mask=torch.from_numpy(mem_pad),
            caps_in=torch.from_numpy(caps),
        ).numpy()  # (B, vocab, L)

    jlog = decoder_forward(
        jparams, CFG, jnp.asarray(memory), jnp.asarray(caps.astype(np.int32)),
        memory_key_padding_mask=jnp.asarray(mem_pad),
        caps_in_pad_mask=jnp.asarray(caps == PAD),
    )
    jlog = np.transpose(np.asarray(jlog), (0, 2, 1))  # (B, vocab, L)

    nonpad = caps != PAD  # (B, L): torch NaN-guards PAD-query rows
    diff = np.abs(jlog - ref_logits).max(axis=1)  # (B, L)
    assert diff[nonpad].max() < 2e-4


# ----------------------------------------------------------------------
# shape generalization: a SECOND decoder geometry (wider model, odd head
# count, 3 layers, bigger vocab) through the same reference-code oracle —
# guards against constants accidentally tuned to the primary 32/32/2/2
# fixture geometry.
# ----------------------------------------------------------------------
VOCAB2, D2, NHEAD2, LAYERS2, FF2 = 50, 48, 3, 3, 96
CFG2 = DecoderConfig(
    vocab_size=VOCAB2, d_model=D2, nhead=NHEAD2, num_layers=LAYERS2,
    dim_feedforward=FF2, dropout_p=0.0, bos_id=BOS, eos_id=EOS, pad_id=PAD,
)


@pytest.fixture(scope="module")
def twin2(ref):
    torch.manual_seed(77)
    dec = ref.AACTransformerDecoder(
        vocab_size=VOCAB2, bos_id=BOS, eos_id=EOS, pad_id=PAD,
        d_model=D2, dim_feedforward=FF2, dropout=0.0,
        nhead=NHEAD2, num_decoder_layers=LAYERS2,
    ).eval()
    state = {
        "model.decoder." + k: v.detach().cpu().numpy()
        for k, v in dec.state_dict().items()
    }
    state["model.projection.2.weight"] = np.eye(D2, dtype=np.float32)
    state["model.projection.2.bias"] = np.zeros(D2, np.float32)
    jparams = jax.tree.map(jnp.asarray, convert_conette(state)["decoder"])
    return dec, jparams


@pytest.mark.parametrize("beam,seed", [(1, 10), (3, 11)])
def test_beam_matches_reference_code_alt_geometry(ref, twin2, beam, seed):
    dec, jparams = twin2
    rng = np.random.default_rng(seed)
    bsize, t_mem = 3, 9
    memory = rng.standard_normal((bsize, t_mem, D2)).astype(np.float32) * 0.6
    lens = rng.integers(4, t_mem + 1, size=bsize)
    lens[0] = t_mem
    mem_pad = np.arange(t_mem)[None, :] >= lens[:, None]
    memory[mem_pad] = 0.0
    forbid = np.zeros(VOCAB2, bool)
    forbid[10:30] = True
    bos_ids = np.array([BOS, 7, 12], np.int64)

    with torch.no_grad():
        rb, rb_avg, _, _ = ref.generate(
            decoder=dec, pad_id=PAD, bos_id=torch.from_numpy(bos_ids),
            eos_id=EOS, vocab_size=VOCAB2,
            frame_embs=_ref_layout(memory),
            frame_embs_pad_mask=torch.from_numpy(mem_pad),
            beam_size=beam, min_pred_size=2, max_pred_size=11,
            forbid_rep_mask=torch.from_numpy(forbid),
        )
    out = beam_search(
        jparams, CFG2, jnp.asarray(memory), jnp.asarray(mem_pad),
        jnp.asarray(bos_ids, dtype=jnp.int32),
        beam_size=beam, min_pred_size=2, max_pred_size=11,
        forbid_rep_mask=jnp.asarray(forbid),
    )
    best = np.asarray(out.best_preds)
    for b in range(bsize):
        assert _strip(best[b]) == _strip(rb.numpy()[b])
    np.testing.assert_allclose(
        np.asarray(out.best_avg_lprobs), rb_avg.numpy(), atol=1e-4, rtol=1e-4
    )
