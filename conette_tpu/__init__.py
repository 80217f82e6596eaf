"""conette_tpu — a TPU-native (JAX/XLA/Pallas) audio-captioning framework.

A ground-up rebuild of the capabilities of CoNeTTE (ConvNeXt-Transformer with
Task Embedding; reference: Labbeti/conette-audio-captioning) designed for TPU:

- the audio frontend (polyphase resample + STFT + log-mel) is expressed as
  MXU-friendly matmuls (with a fused Pallas kernel for the hot path),
- the ConvNeXt-Tiny encoder runs in NHWC layout in bfloat16/float32,
- caption generation (greedy + beam search) compiles to a single
  ``lax.scan`` with a static KV cache instead of a Python decode loop,
- batch parallelism is expressed over an explicit ``jax.sharding.Mesh``.

Public API mirrors the reference package facade
(``/root/reference/src/conette/__init__.py:19-55``).
"""

from pathlib import Path

__version__ = "0.3.0"

DEFAULT_MODEL_NAME = "Labbeti/conette"


def get_sample_path() -> str:
    """Return the path of a bundled sample audio file.

    Mirrors ``conette.get_sample_path`` (reference ``__init__.py:52-55``).
    The sample is generated deterministically on first use if no WAV has
    been bundled (we cannot ship the reference's audio asset).
    """
    data_dir = Path(__file__).parent / "data_assets"
    data_dir.mkdir(exist_ok=True)
    fpath = data_dir / "sample.wav"
    if not fpath.exists():
        from conette_tpu.utils.audio_io import generate_sample_wav

        generate_sample_wav(str(fpath))
    return str(fpath)


def conette(
    pretrained_model_name_or_path: str | None = DEFAULT_MODEL_NAME,
    config_kwds: dict | None = None,
    model_kwds: dict | None = None,
    **kwargs,
):
    """Build a ``CoNeTTEModel`` (mirrors ``conette.conette()``,
    reference ``__init__.py:25-49``): pretrained when a name/path is
    given, a fresh randomly-initialized model when ``None``."""
    from conette_tpu.huggingface.config import CoNeTTEConfig
    from conette_tpu.huggingface.model import CoNeTTEModel

    config_kwds = config_kwds or {}
    model_kwds = dict(model_kwds or {}) | kwargs
    if pretrained_model_name_or_path is None:
        return CoNeTTEModel(CoNeTTEConfig(**config_kwds), **model_kwds)
    if config_kwds:
        config = CoNeTTEConfig.from_pretrained(
            pretrained_model_name_or_path, **config_kwds
        )
        model_kwds = {"config": config} | model_kwds
    return CoNeTTEModel.from_pretrained(
        pretrained_model_name_or_path, **model_kwds
    )


# lazy top-level re-exports (reference __init__.py:19-20 exposes the HF
# classes at package root) — PEP 562 keeps `import conette_tpu` free of
# the jax import cost until a model class is actually touched
def __getattr__(name: str):
    if name in ("CoNeTTEConfig", "CoNeTTEModel"):
        import importlib

        mod = importlib.import_module(
            f"conette_tpu.huggingface.{'config' if name == 'CoNeTTEConfig' else 'model'}"
        )
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "DEFAULT_MODEL_NAME",
    "CoNeTTEConfig",
    "CoNeTTEModel",
    "conette",
    "get_sample_path",
    "__version__",
]
