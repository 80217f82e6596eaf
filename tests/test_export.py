"""AOT export of the caption pipeline (``conette_tpu/export.py``):
serialize → deserialize → replay must match the live model exactly, and
the artifact must be self-contained (no model classes at load time)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from conette_tpu.huggingface.config import CoNeTTEConfig
    from conette_tpu.huggingface.model import CoNeTTEModel
    from conette_tpu.tokenization import AACTokenizer

    tok = AACTokenizer()
    tok.fit(["a bird sings in a tree", "an engine hums loudly", "rain falls"])
    cfg = CoNeTTEConfig(
        d_model=32, nhead=2, num_decoder_layers=2, dim_feedforward=64,
        beam_size=2, min_pred_size=1, max_pred_size=6,
        tokenizer_state=tok.get_txt_state(),
    )
    return CoNeTTEModel(cfg, seed=0)


@pytest.fixture(scope="module")
def art_dir(model, tmp_path_factory):
    from conette_tpu.export import save_exported

    d = str(tmp_path_factory.mktemp("export"))
    save_exported(model, d, batch_size=3, clip_seconds=1.0)
    return d


def test_artifact_files(art_dir):
    for f in ("caption.stablehlo", "tokenizer.json", "meta.json"):
        assert os.path.isfile(os.path.join(art_dir, f)), f


def test_exported_matches_live_model(model, art_dir):
    from conette_tpu.export import ExportedCaptioner

    rng = np.random.default_rng(0)
    wavs = [
        rng.standard_normal(32_000).astype(np.float32) * 0.1,
        rng.standard_normal(24_000).astype(np.float32) * 0.1,
    ]
    cap = ExportedCaptioner(art_dir)
    got = cap(wavs, task="clotho")

    live = model(wavs, sr=32_000, task="clotho")
    # the live path pads to its own bucket; the artifact uses a fixed
    # 1.0 s bucket — same lengths here, so captions must be identical
    assert got == live["cands"]


def test_exported_task_conditioning(model, art_dir):
    from conette_tpu.export import ExportedCaptioner

    cap = ExportedCaptioner(art_dir)
    assert set(cap.meta["task_bos_ids"]) == set(model.config.task_names)
    with pytest.raises(ValueError, match="Invalid task"):
        cap([np.zeros(16_000, np.float32)], task="nope")
    with pytest.raises(ValueError, match="exported batch size"):
        cap([np.zeros(16_000, np.float32)] * 4)


@pytest.mark.slow
def test_cross_platform_tpu_cpu_export(model):
    """platforms=['tpu','cpu'] lowers for BOTH backends on a CPU-only
    host (no TPU needed at export time) and still replays on cpu."""
    import jax.numpy as jnp
    from jax import export as jexport

    from conette_tpu.export import export_caption_program

    data, meta = export_caption_program(
        model, 2, 1.0, platforms=["tpu", "cpu"]
    )
    back = jexport.deserialize(data)
    out = back.call(
        jnp.zeros((2, meta["n_samples"]), jnp.float32),
        jnp.full((2,), meta["n_samples"], jnp.int32),
        jnp.full((2,), 1, jnp.int32),
    )
    assert np.asarray(out[0]).shape == (2, meta["max_pred_size"])


def test_greedy_export_matches_live_model(model, tmp_path):
    """beam_size=1 exports through the greedy fast path and still matches
    the live model (which uses the same fast path)."""
    from conette_tpu.export import ExportedCaptioner, save_exported

    d = str(tmp_path / "greedy")
    save_exported(model, d, batch_size=2, clip_seconds=1.0, beam_size=1)
    cap = ExportedCaptioner(d)
    rng = np.random.default_rng(2)
    wavs = [rng.standard_normal(32_000).astype(np.float32) * 0.1]
    got = cap(wavs, task="clotho")
    live = model(wavs, sr=32_000, task="clotho", beam_size=1)
    assert got == live["cands"]


def test_exported_default_task_and_crop(model, art_dir):
    from conette_tpu.export import ExportedCaptioner

    cap = ExportedCaptioner(art_dir)
    # longer-than-bucket input is cropped, default task applies
    wav = np.random.default_rng(1).standard_normal(50_000).astype(np.float32)
    out = cap([wav])
    assert isinstance(out[0], str)


def test_export_after_pretrained_roundtrip(model, tmp_path):
    """A ``from_pretrained`` model holds plain numpy param leaves; export
    must still trace (numpy closure constants indexed by tracers raise
    TracerArrayConversionError — regression from the r4 gate rehearsal)."""
    from conette_tpu.export import ExportedCaptioner, save_exported
    from conette_tpu.huggingface.model import CoNeTTEModel

    ck = str(tmp_path / "ckpt")
    model.save_pretrained(ck)
    reloaded = CoNeTTEModel.from_pretrained(ck)
    d = str(tmp_path / "export")
    save_exported(reloaded, d, batch_size=2, clip_seconds=1.0)

    rng = np.random.default_rng(3)
    wav = rng.standard_normal(32_000).astype(np.float32) * 0.1
    got = ExportedCaptioner(d)([wav])
    live = reloaded([wav])
    assert got[0] == live.cands[0]
