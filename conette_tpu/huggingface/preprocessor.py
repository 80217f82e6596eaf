"""CoNeTTEPreprocessor — audio loading + frozen ConvNeXt feature frontend.

Capability twin of the reference preprocessor
(``src/conette/huggingface/preprocessor.py:21-154``): accepts file paths,
arrays, or lists thereof with per-item sample rates; resamples to 32 kHz,
averages channels, pads+stacks, and runs the frozen ConvNeXt-Tiny tagger,
returning ``{"audio": (B, T, 768), "audio_shape": (B, 2),
"clip_probs": (B, 527)}``.

TPU-first design: clips are padded to a small static set of length buckets
so arbitrary-length corpora compile to a handful of XLA programs
(BASELINE.json configs 3–5); loading/resampling happens host-side (numpy
twin of the device resampler) and one fused jitted program runs
log-mel → ConvNeXt → frame/clip heads per bucket.
"""

from __future__ import annotations

import functools
from typing import Any, Iterable, Union

import jax
import jax.numpy as jnp
import numpy as np

from conette_tpu.models.convnext import convnext_apply, convnext_init
from conette_tpu.ops.resample import resample_numpy
from conette_tpu.utils.audio_io import load_audio

TARGET_SR = 32_000
FEAT_SIZE = 768

# Static padding buckets (seconds at 32 kHz). Clips longer than the last
# bucket are padded up to the next 5 s multiple.
BUCKETS_S = (1, 2, 3, 5, 7, 10, 15, 20, 30)

ArrayLike = Union[np.ndarray, "jnp.ndarray"]
AudioInput = Union[str, ArrayLike, Iterable[str], Iterable[ArrayLike]]


def bucket_length(n_samples: int, sr: int = TARGET_SR) -> int:
    for s in BUCKETS_S:
        if n_samples <= s * sr:
            return s * sr
    step = 5 * sr
    return ((n_samples + step - 1) // step) * step


class CoNeTTEPreprocessor:
    """Frozen audio tagger frontend. ``params`` is the ConvNeXt pytree
    (converted from the reference checkpoint or randomly initialized)."""

    def __init__(
        self,
        params: Any | None = None,
        *,
        seed: int = 0,
        compute_dtype: Any = jnp.float32,
        use_buckets: bool = True,
        verbose: int = 0,
    ) -> None:
        if params is None:
            params = convnext_init(jax.random.PRNGKey(seed))
        self.params = params
        self.compute_dtype = compute_dtype
        self.use_buckets = use_buckets
        self.verbose = verbose
        # fused-encoder Pallas kernels compile for minutes per bucket shape;
        # make repeat invocations hit the persistent cache
        from conette_tpu.utils.misc import enable_compilation_cache

        enable_compilation_cache()

    @property
    def target_sr(self) -> int:
        return TARGET_SR

    @property
    def feat_size(self) -> int:
        return FEAT_SIZE

    # --------------------------------------------------------------- loading
    def _load(self, path: str) -> tuple[np.ndarray, int]:
        return load_audio(path)

    def load_resample(
        self,
        x: AudioInput,
        sr: Union[None, int, Iterable[int]] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (waveforms (B, T_max) float32 mono @32 kHz, lengths (B,)).

        Input handling parity: ``preprocessor.py:82-154`` (str | list[str] |
        array | list[array] + scalar/per-item sr; channel-mean; pad+stack).
        """
        if isinstance(x, str):
            x = [x]
        if isinstance(x, Iterable) and not hasattr(x, "shape"):
            x = list(x)

        if isinstance(x, list) and len(x) > 0 and isinstance(x[0], str):
            from conette_tpu.native import loader as native_loader

            if native_loader.is_available():
                # native C++ decode+mean+resample in one pass, GIL-released
                # and thread-parallel (torchaudio-native path equivalent)
                mono = native_loader.load_batch(list(x), TARGET_SR)
                lens = np.asarray([len(m) for m in mono], np.int64)
                max_len = int(lens.max())
                pad_len = bucket_length(max_len) if self.use_buckets else max_len
                batch = np.zeros((len(mono), pad_len), np.float32)
                for i, m in enumerate(mono):
                    batch[i, : len(m)] = m
                return batch, lens
            loaded = [self._load(p) for p in x]
            waves = [w for w, _ in loaded]
            srs = [s for _, s in loaded]
        else:
            if hasattr(x, "shape"):
                arr = np.asarray(x, dtype=np.float32)
                if arr.ndim == 1:
                    arr = arr[None, None, :]
                elif arr.ndim == 2:
                    arr = arr[None, :, :]
                elif arr.ndim != 3:
                    raise ValueError(f"Invalid audio array shape {arr.shape}")
                waves = [arr[i] for i in range(arr.shape[0])]
            else:
                waves = [np.asarray(w, dtype=np.float32) for w in x]
                waves = [w[None, :] if w.ndim == 1 else w for w in waves]
            if sr is None:
                srs = [TARGET_SR] * len(waves)
            elif isinstance(sr, int):
                srs = [sr] * len(waves)
            else:
                srs = list(sr)
            if len(srs) == 1 and len(waves) != 1:
                srs = srs * len(waves)
        if len(waves) != len(srs) or len(waves) == 0:
            raise ValueError(f"Mismatched audio/sr counts ({len(waves)}/{len(srs)}).")

        mono: list[np.ndarray] = []
        for w, s in zip(waves, srs):
            if w.ndim != 2:
                raise ValueError(f"Expected (channels, time) clip, got {w.shape}")
            if s != TARGET_SR:
                w = resample_numpy(w, int(s), TARGET_SR)
            mono.append(w.mean(axis=0).astype(np.float32))

        lens = np.asarray([len(m) for m in mono], np.int64)
        max_len = int(lens.max())
        pad_len = bucket_length(max_len) if self.use_buckets else max_len
        batch = np.zeros((len(mono), pad_len), np.float32)
        for i, m in enumerate(mono):
            batch[i, : len(m)] = m
        return batch, lens

    # --------------------------------------------------------------- encode
    @functools.cached_property
    def _encode_fn(self):
        @jax.jit
        def run(params, wav, lens):
            return convnext_apply(
                params,
                wav,
                lens,
                deterministic=True,
                compute_dtype=self.compute_dtype,
            )

        return run

    def __call__(
        self,
        x: AudioInput,
        sr: Union[None, int, Iterable[int]] = None,
        x_shapes: Any = None,
    ) -> dict[str, Any]:
        wav, lens = self.load_resample(x, sr)
        if x_shapes is not None:
            lens = np.asarray(x_shapes)[:, -1]
        outs = self._encode_fn(self.params, jnp.asarray(wav), jnp.asarray(lens))
        frame_embs = jnp.swapaxes(outs["frame_embs"], 1, 2)  # (B, T, 768)
        audio_shape = jnp.stack(
            [
                jnp.full_like(outs["frame_embs_lens"], FEAT_SIZE),
                outs["frame_embs_lens"],
            ],
            axis=1,
        )
        return {
            "audio": frame_embs,
            "audio_shape": audio_shape,
            "clip_probs": outs["clipwise_output"],
        }
