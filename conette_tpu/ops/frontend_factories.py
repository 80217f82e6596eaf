"""Audio-frontend factories (renamed from ``frontends.py`` in r5: one letter
away from ``ops/frontend.py`` — the log-mel op — and doing unrelated work).

Twin of the reference transform factory (``src/conette/transforms/get.py``):
named offline frontends mapping raw audio → encoder features, used by
``conette-prepare`` to pack HDFs:

- ``resample_mean_convnext``  — THE production frontend (``get.py:240-310``)
- ``resample_mean_cnn10`` / ``cnn14`` / ``cnn14_att`` (``get.py:64-237``)
- ``resample_mean_spectrogram`` — raw log-mel frames (``get.py:313-647``)

Each factory returns a callable ``(waveform (C, T), sr) → (T', feat)``
feature array plus the feature width, with resampling to 32 kHz and
channel averaging in front.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from conette_tpu.ops.frontend import DEFAULT_LOGMEL, LogMelConfig, logmel_spectrogram
from conette_tpu.ops.resample import resample_numpy

TARGET_SR = 32_000

FrontendFn = Callable[[np.ndarray, int], np.ndarray]

# Default sample rates per dataset (reference error message,
# transforms/get.py:650-660)
DEFAULT_SRC_SR = {"clotho": 44_100, "audiocaps": 32_000, "macs": 48_000}


def _resample_mean(waveform: np.ndarray, sr: int) -> np.ndarray:
    waveform = np.asarray(waveform, np.float32)
    if waveform.ndim == 1:
        waveform = waveform[None]
    if sr != TARGET_SR:
        waveform = resample_numpy(waveform, sr, TARGET_SR)
    return waveform.mean(axis=0)


def get_frontend(
    name: str = "resample_mean_convnext",
    encoder_params: Any | None = None,
    seed: int = 0,
) -> tuple[FrontendFn, int]:
    """→ (frontend_fn, feature_width)."""
    if name == "resample_mean_convnext":
        from conette_tpu.models.convnext import convnext_apply, convnext_init

        params = encoder_params or convnext_init(jax.random.PRNGKey(seed))
        run = jax.jit(
            lambda p, w, n: convnext_apply(p, w, n, deterministic=True)
        )

        def fn(waveform: np.ndarray, sr: int) -> np.ndarray:
            mono = _resample_mean(waveform, sr)
            outs = run(
                params, jnp.asarray(mono[None]), jnp.asarray([len(mono)])
            )
            n = int(outs["frame_embs_lens"][0])
            return np.asarray(outs["frame_embs"])[0, :, :n].T.astype(np.float32)

        return fn, 768

    if name in ("resample_mean_cnn10", "resample_mean_cnn14", "resample_mean_cnn14_att"):
        from conette_tpu.models.pann import build_pann_model, pann_apply

        pann_name = {
            "resample_mean_cnn10": "Cnn10",
            "resample_mean_cnn14": "Cnn14",
            "resample_mean_cnn14_att": "Cnn14_DecisionLevelAtt",
        }[name]
        params, feat = (
            (encoder_params, {"Cnn10": 512}.get(pann_name, 2048))
            if encoder_params is not None
            else build_pann_model(pann_name, jax.random.PRNGKey(seed))
        )
        run = jax.jit(lambda p, w, n: pann_apply(p, w, n, deterministic=True))

        def fn(waveform: np.ndarray, sr: int) -> np.ndarray:
            mono = _resample_mean(waveform, sr)
            outs = run(params, jnp.asarray(mono[None]), jnp.asarray([len(mono)]))
            n = int(outs["frame_embs_lens"][0])
            return np.asarray(outs["frame_embs"])[0, :, :n].T.astype(np.float32)

        return fn, feat

    if name == "resample_mean_spectrogram":
        cfg: LogMelConfig = DEFAULT_LOGMEL
        run = jax.jit(lambda w: logmel_spectrogram(w, cfg))

        def fn(waveform: np.ndarray, sr: int) -> np.ndarray:
            mono = _resample_mean(waveform, sr)
            return np.asarray(run(jnp.asarray(mono[None])))[0].astype(np.float32)

        return fn, cfg.n_mels

    if name == "resample_mean_gammatonegram":
        from conette_tpu.ops.gammatone import gammatone_filterbank
        from conette_tpu.ops.stft import power_spectrogram

        n_filters = 64
        fb = jnp.asarray(
            gammatone_filterbank(TARGET_SR, DEFAULT_LOGMEL.n_fft, n_filters)
        )

        def gfn(waveform: np.ndarray, sr: int) -> np.ndarray:
            mono = _resample_mean(waveform, sr)
            power = power_spectrogram(
                jnp.asarray(mono[None]), DEFAULT_LOGMEL.n_fft, DEFAULT_LOGMEL.hop_length
            )
            gt = jnp.einsum("btf,fm->btm", power, fb)
            out = 10.0 * jnp.log10(jnp.maximum(1e-10, gt))
            return np.asarray(out)[0].astype(np.float32)

        return gfn, n_filters

    raise ValueError(
        f"Unknown frontend {name!r}. (expected one of "
        "('resample_mean_convnext', 'resample_mean_cnn10', 'resample_mean_cnn14',"
        " 'resample_mean_cnn14_att', 'resample_mean_spectrogram',"
        " 'resample_mean_gammatonegram'))"
    )
