"""CoNeTTEModel — the public pretrained-model wrapper.

API parity with the reference ``CoNeTTEModel``
(``src/conette/huggingface/model.py:38-289``):

- ``CoNeTTEModel.from_pretrained(path)`` restores config + tokenizer +
  weights. The tokenizer is rebuilt from ``config.tokenizer_state``
  (deferred vocab-size-dependent model build — ``model.py:55-58,126-163``);
  torch-layout checkpoints (pytorch_model.bin / model.safetensors) are
  converted on the fly (huggingface/convert.py), native checkpoints load
  from ``params.npz``.
- ``model(x, sr=..., task=..., beam_size=...)`` → ``CoNeTTEOutput`` with
  ``cands / preds / lprobs / mult_* / tasks / tags / tags_probs``
  (``model.py:26-35,185-261``): preprocess → AudioSet tags at threshold
  0.3 → task → beam search → detokenize.

TPU-first: the encode+generate path is one jitted XLA program per
(bucket, beam config); decoding never leaves the device until final ids.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from conette_tpu.huggingface.audioset import load_audioset_names, probs_to_names
from conette_tpu.huggingface.config import CoNeTTEConfig
from conette_tpu.huggingface.convert import (
    convert_torch_checkpoint,
    load_params_npz,
    save_params_npz,
)
from conette_tpu.huggingface.preprocessor import AudioInput, CoNeTTEPreprocessor
from conette_tpu.models.conette import (
    ConetteConfig,
    add_task_tokens,
    build_forbid_rep_mask,
    conette_init,
    encode_audio,
    forward_generate,
    forward_greedy,
    tasks_to_bos_ids,
)
from conette_tpu.models.convnext import convnext_init
from conette_tpu.tokenization import AACTokenizer

pylog = logging.getLogger(__name__)


class CoNeTTEOutput(dict):
    """Dict with attribute access (reference ``CoNeTTEOutput``)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as err:
            raise AttributeError(name) from err


class CoNeTTEModel:
    def __init__(
        self,
        config: CoNeTTEConfig,
        *,
        encoder_params: Any | None = None,
        model_params: Any | None = None,
        tokenizer: AACTokenizer | None = None,
        seed: int = 1234,
        compute_dtype: Any = jnp.float32,
        audioset_names: list[str] | None = None,
        verbose: int = 0,
    ) -> None:
        self.config = config
        self.verbose = verbose

        # --- tokenizer (deferred-build source of truth for vocab size)
        if tokenizer is None:
            if config.tokenizer_state is not None:
                tokenizer = AACTokenizer.from_txt_state(config.tokenizer_state)
            else:
                tokenizer = AACTokenizer()
        self.tokenizer = tokenizer

        self.task_token_ids: dict[str, int] = {}
        if self.tokenizer.is_fit():
            self.task_token_ids = add_task_tokens(
                self.tokenizer, tuple(config.task_names), config.task_mode
            )

        vocab_size = max(self.tokenizer.get_vocab_size(), 8)
        self.model_cfg = ConetteConfig(
            vocab_size=vocab_size,
            task_mode=config.task_mode,
            task_names=tuple(config.task_names),
            label_smoothing=config.label_smoothing,
            mixup_alpha=config.mixup_alpha,
            min_pred_size=config.min_pred_size,
            max_pred_size=config.max_pred_size,
            beam_size=config.beam_size,
            nhead=config.nhead,
            d_model=config.d_model,
            num_decoder_layers=config.num_decoder_layers,
            decoder_dropout_p=config.decoder_dropout_p,
            dim_feedforward=config.dim_feedforward,
            bos_id=self.tokenizer.bos_token_id if self.tokenizer.is_fit() else 1,
            eos_id=self.tokenizer.eos_token_id if self.tokenizer.is_fit() else 2,
            pad_id=self.tokenizer.pad_token_id if self.tokenizer.is_fit() else 0,
        )

        key = jax.random.PRNGKey(seed)
        ke, km = jax.random.split(key)
        if encoder_params is None:
            encoder_params = convnext_init(ke)
        if model_params is None:
            model_params = conette_init(km, self.model_cfg)
        self.preprocessor = CoNeTTEPreprocessor(
            encoder_params, compute_dtype=compute_dtype
        )
        self.params = model_params

        if self.tokenizer.is_fit():
            mask = build_forbid_rep_mask(self.tokenizer, "content_words")
            self.forbid_rep_mask = jnp.asarray(mask) if mask is not None else None
        else:
            self.forbid_rep_mask = None

        self.audioset_names = audioset_names or load_audioset_names()
        self.default_task = (
            list(config.task_names)[0] if config.task_names else "clotho"
        )
        self._jit_cache: dict[Any, Any] = {}

    # ------------------------------------------------------------- plumbing
    @property
    def tasks(self) -> list[str]:
        """Valid task names (reference ``model.py:114-115``)."""
        return list(self.config.task_names)

    @property
    def encoder_params(self) -> Any:
        return self.preprocessor.params

    def _generate_fn(self, beam_size: int, min_pred: int, max_pred: int, forbid: bool):
        key = ("gen", beam_size, min_pred, max_pred, forbid)
        if key not in self._jit_cache:

            @jax.jit
            def run(params, audio, lens, bos_ids, forbid_mask):
                memory, pad_mask = encode_audio(params, self.model_cfg, audio, lens)
                if beam_size <= 1:
                    g = forward_greedy(
                        params, self.model_cfg, memory, pad_mask, bos_ids,
                        min_pred_size=min_pred, max_pred_size=max_pred,
                        forbid_rep_mask=forbid_mask,
                    )
                    lp = jax.nn.log_softmax(
                        jnp.transpose(g.logits, (0, 2, 1)), axis=-1
                    )
                    sel = jnp.take_along_axis(lp, g.preds[..., None], axis=-1)[..., 0]
                    valid = g.preds != self.model_cfg.pad_id
                    avg = jnp.sum(jnp.where(valid, sel, 0.0), axis=1) / jnp.maximum(
                        valid.sum(axis=1), 1
                    )
                    return g.preds, avg, g.preds[:, None, :], avg[:, None]
                res = forward_generate(
                    params, self.model_cfg, memory, pad_mask, bos_ids,
                    beam_size=beam_size, min_pred_size=min_pred,
                    max_pred_size=max_pred, forbid_rep_mask=forbid_mask,
                )
                return (
                    res.best_preds,
                    res.best_avg_lprobs,
                    res.global_preds,
                    res.global_avg_lprobs,
                )

            self._jit_cache[key] = run
        return self._jit_cache[key]

    # -------------------------------------------------------------- forward
    def __call__(self, *args: Any, **kwargs: Any) -> CoNeTTEOutput:
        return self.forward(*args, **kwargs)

    def forward(
        self,
        x: AudioInput,
        sr: Union[None, int, Iterable[int]] = None,
        x_shapes: Any = None,
        preprocess: bool = True,
        threshold: float = 0.3,
        task: Union[str, list[str], None] = None,
        beam_size: Optional[int] = None,
        min_pred_size: Optional[int] = None,
        max_pred_size: Optional[int] = None,
        forbid_rep_mode: Optional[str] = None,
    ) -> CoNeTTEOutput:
        # validate tasks BEFORE the (expensive) preprocessing pass
        if isinstance(task, str):
            _check = [task]
        elif task is not None:
            _check = list(task)
        else:
            _check = []
        for t in _check:
            if t not in self.config.task_names:
                raise ValueError(
                    f"Invalid task {t!r}. (not in {list(self.config.task_names)})"
                )

        if preprocess:
            batch = self.preprocessor(x, sr, x_shapes)
            clip_probs = np.asarray(batch.pop("clip_probs"))
            tags = probs_to_names(clip_probs, threshold, self.audioset_names)
        else:
            audio = jnp.asarray(x)
            batch = {"audio": audio, "audio_shape": jnp.asarray(x_shapes)}
            clip_probs = None
            tags = None

        bsize = int(batch["audio"].shape[0])

        # --- task handling (parity: model.py:216-244)
        if task is None:
            tasks = [self.default_task] * bsize
        elif isinstance(task, str):
            tasks = [task] * bsize
        elif len(list(task)) != bsize:
            raise ValueError(
                f"Invalid number of tasks ({len(list(task))} vs {bsize} inputs)"
            )
        else:
            tasks = list(task)
        for t in tasks:
            if t not in self.config.task_names:
                raise ValueError(
                    f"Invalid task {t!r}. (not in {list(self.config.task_names)})"
                )
        datasets = [t.split("_")[0] for t in tasks]
        sources = [
            "_".join(t.split("_")[1:]) if "_" in t else None for t in tasks
        ]

        if self.model_cfg.task_mode == "ds_src":
            bos_np = tasks_to_bos_ids(self.model_cfg, self.task_token_ids, datasets, sources)
        elif self.model_cfg.task_mode == "ds":
            bos_np = tasks_to_bos_ids(self.model_cfg, self.task_token_ids, datasets)
        else:
            bos_np = np.full((bsize,), self.model_cfg.bos_id, np.int32)

        beam = beam_size if beam_size is not None else self.config.beam_size
        min_p = min_pred_size if min_pred_size is not None else self.config.min_pred_size
        max_p = max_pred_size if max_pred_size is not None else self.config.max_pred_size

        if forbid_rep_mode is None:
            forbid = self.forbid_rep_mask
        else:
            m = build_forbid_rep_mask(self.tokenizer, forbid_rep_mode)
            forbid = jnp.asarray(m) if m is not None else None

        use_forbid = forbid is not None
        if forbid is None:
            forbid = jnp.zeros((self.model_cfg.vocab_size,), bool)

        lens = jnp.asarray(batch["audio_shape"])[:, -1]
        run = self._generate_fn(beam, min_p, max_p, use_forbid)
        preds, lprobs, mult_preds, mult_lprobs = run(
            self.params, jnp.asarray(batch["audio"]), lens, jnp.asarray(bos_np), forbid
        )

        preds_np = np.asarray(preds)
        mult_np = np.asarray(mult_preds)
        cands = [self._decode_pred(row) for row in preds_np]
        mult_cands = [[self._decode_pred(r) for r in rows] for rows in mult_np]

        out = CoNeTTEOutput(
            cands=cands,
            preds=preds_np,
            lprobs=np.asarray(lprobs),
            mult_cands=mult_cands,
            mult_preds=mult_np,
            mult_lprobs=np.asarray(mult_lprobs),
            tasks=tasks,
        )
        if clip_probs is not None:
            out["tags_probs"] = clip_probs
            out["tags"] = tags
        return out

    def _decode_pred(self, ids: np.ndarray) -> str:
        eos = self.model_cfg.eos_id
        toks = []
        for t in ids.tolist():
            if t == eos:
                break
            toks.append(t)
        return self.tokenizer.decode_single(toks)

    # --------------------------------------------------------- persistence
    def save_pretrained(self, save_directory: str) -> None:
        os.makedirs(save_directory, exist_ok=True)
        self.config.tokenizer_state = self.tokenizer.get_txt_state()
        self.config.save_pretrained(save_directory)
        save_params_npz(
            os.path.join(save_directory, "params.npz"),
            {"encoder": self.encoder_params, "model": self.params},
        )
        with open(os.path.join(save_directory, "audioset_names.json"), "w") as f:
            json.dump(self.audioset_names, f)

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: str,
        device: Any = None,  # accepted for API parity; JAX manages placement
        offline: bool = False,
        token: str | None = None,
        verbose: int = 0,
        **kwargs: Any,
    ) -> "CoNeTTEModel":
        path = pretrained_model_name_or_path
        if not os.path.isdir(path):
            # Hub-name resolution (reference predict.py:93-121 loads
            # "Labbeti/conette" by name): resolve through
            # huggingface_hub.snapshot_download when importable and online,
            # keep the explicit offline error otherwise.
            resolved = None
            if not offline and "/" in path and not os.path.exists(path):
                try:
                    from huggingface_hub import snapshot_download

                    resolved = snapshot_download(repo_id=path, token=token)
                except ImportError:
                    pylog.warning(
                        "huggingface_hub not installed; cannot resolve "
                        f"{path!r} as a Hub repo id."
                    )
                except Exception as err:
                    pylog.warning(f"Hub snapshot download failed: {err}")
            if resolved is None:
                raise FileNotFoundError(
                    f"Model directory {path!r} not found and Hub resolution "
                    "unavailable (offline host or huggingface_hub missing); "
                    "download the HF snapshot first."
                )
            path = resolved

        # Train-run directory (reference predict.py:124-178 twin): a run dir
        # with checkpoints/best from conette-train instead of an HF export.
        best_dir = os.path.join(path, "checkpoints", "best")
        if not os.path.isfile(os.path.join(path, "config.json")) and os.path.isdir(
            best_dir
        ):
            from conette_tpu.train.checkpoint import load_checkpoint

            loaded = load_checkpoint(best_dir)
            tokenizer = loaded.get("tokenizer")
            mc = loaded["meta"].get("model_cfg", {})
            config = CoNeTTEConfig(
                tokenizer_state=tokenizer.get_txt_state() if tokenizer else None,
                **{
                    k: mc[k]
                    for k in (
                        "task_mode", "task_names", "label_smoothing",
                        "mixup_alpha", "min_pred_size", "max_pred_size",
                        "beam_size", "nhead", "d_model", "num_decoder_layers",
                        "decoder_dropout_p", "dim_feedforward",
                    )
                    if k in mc
                },
            )
            pylog.warning(
                "Loading a train-run checkpoint: decoder weights are trained, "
                "the ConvNeXt encoder is randomly initialized unless converted "
                "separately (the reference fetches it from its Zenodo registry)."
            )
            return cls(
                config,
                model_params=loaded["params"],
                tokenizer=tokenizer,
                verbose=verbose,
                **kwargs,
            )

        config = CoNeTTEConfig.from_pretrained(path)

        audioset_names = None
        names_file = os.path.join(path, "audioset_names.json")
        if os.path.isfile(names_file):
            with open(names_file) as f:
                audioset_names = json.load(f)
        else:
            audioset_names = load_audioset_names([path])

        npz = os.path.join(path, "params.npz")
        encoder_params = model_params = None
        tokenizer = None
        if os.path.isfile(npz):
            tree = load_params_npz(npz)
            encoder_params, model_params = tree["encoder"], tree["model"]
        else:
            state = _load_torch_state(path)
            if state is not None:
                encoder_params, model_params, extra = convert_torch_checkpoint(state)
                if extra and config.tokenizer_state is None:
                    tok_state = _extract_tokenizer_state(extra)
                    if tok_state is not None:
                        tokenizer = AACTokenizer()
                        tokenizer.set_state(tok_state)
            else:
                pylog.warning(
                    f"No weights found in {path!r}; initializing randomly."
                )
        return cls(
            config,
            encoder_params=encoder_params,
            model_params=model_params,
            tokenizer=tokenizer,
            audioset_names=audioset_names,
            verbose=verbose,
            **kwargs,
        )


def _load_torch_state(path: str) -> dict[str, Any] | None:
    for fname in ("model.safetensors", "pytorch_model.bin"):
        fpath = os.path.join(path, fname)
        if not os.path.isfile(fpath):
            continue
        if fname.endswith(".safetensors"):
            try:
                from safetensors.numpy import load_file

                return dict(load_file(fpath))
            except Exception as err:
                pylog.warning(f"safetensors load failed: {err}")
                continue
        import torch

        # weights_only: the state dict + the uint8 _extra_state_ tensor load
        # fine without arbitrary-code pickle; the _extra_state_ payload is
        # then unpickled separately through the allowlisted _RemapUnpickler.
        return torch.load(fpath, map_location="cpu", weights_only=True)
    return None


def _extract_tokenizer_state(extra: Any) -> Any:
    """Pull a tokenizer state out of the unpickled ``_extra_state_`` blob
    (layout: {"tokenizers.<name>": state, ...} or nested dicts)."""
    if not isinstance(extra, dict):
        return None
    for key, val in extra.items():
        if "tokenizer" in str(key) and isinstance(val, dict):
            if "tokenizer" in val:
                return val
    return None


def eval_and_disable_grad(*models: Any) -> None:
    """No-op API twin (JAX models are pure; reference helper
    ``huggingface/model.py``). Kept for drop-in compatibility."""
