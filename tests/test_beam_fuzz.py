"""Property fuzz: the static lax beam search must match the dynamic oracle
across random model seeds, beam widths, min sizes and memory lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conette_tpu.decoding.beam import beam_search
from conette_tpu.models.decoder import DecoderConfig, decoder_init
from tests.test_decoding import oracle_beam

pytestmark = pytest.mark.slow  # heavy compiles / e2e; deselect with -m 'not slow'

CONFIGS = [
    # (model_seed, data_seed, beam, min_pred, max_pred, use_forbid)
    (11, 0, 2, 0, 6, False),
    (12, 1, 4, 1, 7, True),
    (13, 2, 3, 3, 5, False),
    (14, 3, 2, 2, 9, True),
    (15, 4, 5, 0, 6, True),
]


@pytest.mark.parametrize("model_seed,data_seed,beam,min_p,max_p,use_forbid", CONFIGS)
def test_beam_matches_oracle_fuzz(model_seed, data_seed, beam, min_p, max_p, use_forbid):
    cfg = DecoderConfig(
        vocab_size=24, d_model=16, nhead=2, num_layers=1, dim_feedforward=32,
        dropout_p=0.0, bos_id=1, eos_id=2, pad_id=0,
    )
    params = decoder_init(jax.random.PRNGKey(model_seed), cfg)
    rng = np.random.default_rng(data_seed)
    B = 2
    T = int(rng.integers(2, 7))
    memory = rng.standard_normal((B, T, cfg.d_model)).astype(np.float32) * 0.7
    mem_pad = np.zeros((B, T), bool)
    if T > 2:
        mem_pad[0, T - 1 :] = True
    bos_ids = rng.integers(3, cfg.vocab_size, size=B).astype(np.int32)
    forbid = None
    if use_forbid:
        forbid = rng.random(cfg.vocab_size) > 0.4
        forbid[cfg.eos_id] = False

    res = beam_search(
        params, cfg, jnp.asarray(memory), jnp.asarray(mem_pad),
        jnp.asarray(bos_ids), beam_size=beam, min_pred_size=min_p,
        max_pred_size=max_p,
        forbid_rep_mask=jnp.asarray(forbid) if forbid is not None else None,
    )
    oracle = oracle_beam(params, memory, mem_pad, bos_ids, beam, min_p, max_p, forbid, cfg=cfg)
    for b, ((best_toks, best_avg), finished) in enumerate(oracle):
        ours = np.asarray(res.best_preds[b]).tolist()
        assert ours[: len(best_toks)] == best_toks, (
            f"cfg={model_seed, data_seed, beam, min_p, max_p, use_forbid} "
            f"batch {b}: {ours} vs {best_toks}"
        )
        np.testing.assert_allclose(float(res.best_avg_lprobs[b]), best_avg, atol=1e-4)
        np.testing.assert_allclose(
            sorted(np.asarray(res.global_avg_lprobs[b]).tolist()),
            sorted(a for _, a in finished),
            atol=1e-4,
        )
