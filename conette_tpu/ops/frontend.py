"""Log-mel audio frontend: waveform → (B, n_frames, n_mels).

Replaces the reference's Spectrogram+LogmelFilterBank pair
(``src/conette/nn/encoders/convnext.py:160-180``; sr=32000, n_fft=1024,
hop=320, 224 mels, fmin=50, fmax=14000, ref=1.0, amin=1e-10, top_db=None).

The whole frontend is three ops XLA fuses aggressively:
windowed-DFT matmul → square-add → mel matmul → log10.
A Pallas fused kernel (ops/pallas/logmel.py) implements the same function
contract for the production path.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from conette_tpu.ops.mel import mel_filterbank
from conette_tpu.ops.stft import power_spectrogram

__all__ = ["LogMelConfig", "logmel_spectrogram", "DEFAULT_LOGMEL"]


class LogMelConfig:
    """Static frontend hyperparameters (hashable, jit-friendly)."""

    def __init__(
        self,
        sample_rate: int = 32_000,
        n_fft: int = 1024,
        hop_length: int = 320,
        n_mels: int = 224,
        fmin: float = 50.0,
        fmax: float = 14_000.0,
        ref: float = 1.0,
        amin: float = 1e-10,
        top_db: float | None = None,
    ) -> None:
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.fmin = fmin
        self.fmax = fmax
        self.ref = ref
        self.amin = amin
        self.top_db = top_db

    def _key(self) -> tuple:
        return (
            self.sample_rate,
            self.n_fft,
            self.hop_length,
            self.n_mels,
            self.fmin,
            self.fmax,
            self.ref,
            self.amin,
            self.top_db,
        )

    def __hash__(self) -> int:
        return hash(self._key())

    def __eq__(self, other: object) -> bool:
        return isinstance(other, LogMelConfig) and self._key() == other._key()


DEFAULT_LOGMEL = LogMelConfig()


@lru_cache(maxsize=8)
def _mel_matrix(cfg: LogMelConfig) -> np.ndarray:
    return mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)


def logmel_spectrogram(
    x: jnp.ndarray,
    cfg: LogMelConfig = DEFAULT_LOGMEL,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """(B, T) waveform → (B, n_frames, n_mels) log-mel spectrogram."""
    power = power_spectrogram(
        x, cfg.n_fft, cfg.hop_length, compute_dtype=compute_dtype
    )
    fb = jnp.asarray(_mel_matrix(cfg), dtype=power.dtype)
    mel = jnp.einsum("btf,fm->btm", power, fb, preferred_element_type=jnp.float32)
    log_mel = 10.0 * jnp.log10(jnp.maximum(cfg.amin, mel))
    log_mel = log_mel - 10.0 * np.log10(max(cfg.amin, cfg.ref))
    if cfg.top_db is not None:
        log_mel = jnp.maximum(
            log_mel, jnp.max(log_mel, axis=(-2, -1), keepdims=True) - cfg.top_db
        )
    return log_mel
