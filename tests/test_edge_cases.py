"""Edge cases: long clips beyond the bucket table, mixed sample rates,
empty decodes, single-frame memories, vocab-size corners."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conette_tpu.decoding.beam import beam_search
from conette_tpu.huggingface.preprocessor import bucket_length
from conette_tpu.models.decoder import DecoderConfig, decoder_init

pytestmark = pytest.mark.slow  # heavy compiles; deselect with -m 'not slow'


def test_bucket_length_beyond_table():
    # > 30 s rounds up to the next 5 s multiple
    assert bucket_length(31 * 32_000) == 35 * 32_000
    assert bucket_length(94 * 32_000) == 95 * 32_000
    assert bucket_length(1) == 32_000


def test_preprocessor_mixed_rates_and_channels():
    from conette_tpu.huggingface.preprocessor import CoNeTTEPreprocessor

    pre = CoNeTTEPreprocessor(seed=0)
    rng = np.random.default_rng(0)
    clips = [
        rng.standard_normal((2, 44_100)).astype(np.float32),  # stereo 44.1k
        rng.standard_normal((1, 48_000)).astype(np.float32),  # mono 48k
        rng.standard_normal((1, 16_000)).astype(np.float32),  # mono 16k (upsample)
    ]
    wav, lens = pre.load_resample(clips, sr=[44_100, 48_000, 16_000])
    assert wav.shape[0] == 3
    # all resampled to 32 kHz: 1 s / 1 s / 1 s
    np.testing.assert_array_equal(lens, [32_000, 32_000, 32_000])


def test_decode_empty_prediction():
    from conette_tpu.tokenization import AACTokenizer

    tok = AACTokenizer()
    tok.fit(["a dog barks"])
    assert tok.decode_single([]) == ""
    assert tok.decode_single([tok.pad_token_id, tok.pad_token_id]) == ""


def test_beam_single_frame_memory():
    cfg = DecoderConfig(vocab_size=16, d_model=16, nhead=2, num_layers=1,
                        dim_feedforward=32, dropout_p=0.0)
    params = decoder_init(jax.random.PRNGKey(0), cfg)
    memory = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, 16)),
                         jnp.float32)
    res = beam_search(
        params, cfg, memory, jnp.zeros((1, 1), bool), jnp.asarray([1], jnp.int32),
        beam_size=3, min_pred_size=1, max_pred_size=4,
    )
    assert res.best_preds.shape == (1, 4)
    assert np.isfinite(np.asarray(res.best_avg_lprobs)).all()


def test_beam_min_equals_max():
    """min_pred_size == max_pred_size forces full-length captions."""
    cfg = DecoderConfig(vocab_size=16, d_model=16, nhead=2, num_layers=1,
                        dim_feedforward=32, dropout_p=0.0)
    params = decoder_init(jax.random.PRNGKey(1), cfg)
    memory = jnp.asarray(np.random.default_rng(1).standard_normal((2, 3, 16)),
                         jnp.float32)
    res = beam_search(
        params, cfg, memory, jnp.zeros((2, 3), bool),
        jnp.asarray([1, 1], jnp.int32),
        beam_size=2, min_pred_size=4, max_pred_size=4,
    )
    preds = np.asarray(res.best_preds)
    # EOS masked until the final step → no EOS in positions 0..2
    assert not (preds[:, :3] == cfg.eos_id).any()


def test_tokenizer_handles_unicode_and_empty():
    from conette_tpu.tokenization import AACTokenizer

    tok = AACTokenizer()
    out = tok.tokenize_batch(["", "   ", "café noßé 音"])
    assert out[0] == [] and out[1] == []
    assert len(out[2]) == 3


def test_collate_single_item():
    from conette_tpu.data.collate import CollateDict

    batch = CollateDict()([{"audio": np.ones((3, 4), np.float32), "fname": "x"}])
    assert batch["audio"].shape == (1, 3, 4)
