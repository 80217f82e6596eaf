"""Checkpointing: monitored top-k snapshots + best link + resume.

Twin of the reference's three mechanisms (SURVEY.md §5):
1. ``CustomModelCheckpoint`` — top-k on a monitored metric (``val/fense``
   max in production) with a ``best.ckpt`` link at fit end
   (``callbacks/custom_ckpt.py:22-221``);
2. ``ResumeCallback`` — weight-only warm start with a regex ignore filter
   (``callbacks/resume.py:23-138``);
3. one-file serialization bundling weights + tokenizer + config
   (``huggingface/model.py:165-183``) — here a directory with
   ``state.npz`` (params + opt state), ``meta.json``, ``tokenizer.json``.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
from typing import Any

import numpy as np

from conette_tpu.huggingface.convert import (
    flatten_pytree,
    load_params_npz,
    save_params_npz,
    unflatten_pytree,
)
from conette_tpu.tokenization import AACTokenizer

pylog = logging.getLogger(__name__)


def save_checkpoint(
    ckpt_dir: str,
    params: Any,
    *,
    opt_state: Any = None,
    step: int = 0,
    meta: dict | None = None,
    tokenizer: AACTokenizer | None = None,
    backend: str = "npz",
) -> str:
    """``backend="npz"`` (default, dependency-light) or ``"orbax"``
    (TPU-native: async, multi-host, sharded-array aware — the SURVEY §5
    orbax plan; falls back to npz when orbax is unavailable)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    if backend == "orbax":
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(
                os.path.abspath(os.path.join(ckpt_dir, "orbax")), params, force=True
            )
            ckptr.wait_until_finished()
        except Exception as err:
            pylog.warning(f"orbax save failed ({err}); falling back to npz")
            backend = "npz"
    if backend == "npz":
        save_params_npz(os.path.join(ckpt_dir, "params.npz"), params)
    if opt_state is not None:
        flat = {
            k: np.asarray(v)
            for k, v in flatten_pytree(_opt_state_to_tree(opt_state)).items()
        }
        np.savez(os.path.join(ckpt_dir, "opt_state.npz"), **flat)
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump({"step": step} | (meta or {}), f, indent=2)
    if tokenizer is not None:
        tokenizer.save_file(os.path.join(ckpt_dir, "tokenizer.json"))
    return ckpt_dir


def load_checkpoint(
    ckpt_dir: str, ign_weights: str | None = None
) -> dict[str, Any]:
    """→ {"params", "meta", "tokenizer"?, "opt_state_flat"?}. ``ign_weights``
    is a regex of parameter paths to drop (warm-start filter)."""
    out: dict[str, Any] = {}
    npz_path = os.path.join(ckpt_dir, "params.npz")
    orbax_path = os.path.join(ckpt_dir, "orbax")
    if os.path.isfile(npz_path):
        params = load_params_npz(npz_path)
    elif os.path.isdir(orbax_path):
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(os.path.abspath(orbax_path))
    else:
        raise FileNotFoundError(f"no params.npz or orbax/ under {ckpt_dir}")
    if ign_weights:
        pat = re.compile(ign_weights)
        flat = flatten_pytree(params)
        kept = {k: v for k, v in flat.items() if not pat.search(k)}
        dropped = sorted(set(flat) - set(kept))
        if dropped:
            pylog.info(f"Ignoring {len(dropped)} weights matching {ign_weights!r}")
        params = unflatten_pytree(kept)
    out["params"] = params
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        out["meta"] = json.load(f)
    tok_file = os.path.join(ckpt_dir, "tokenizer.json")
    if os.path.isfile(tok_file):
        out["tokenizer"] = AACTokenizer.from_file(tok_file)
    opt_file = os.path.join(ckpt_dir, "opt_state.npz")
    if os.path.isfile(opt_file):
        with np.load(opt_file) as data:
            out["opt_state_flat"] = {k: data[k] for k in data.files}
    return out


class CheckpointManager:
    """Top-k monitored checkpointing with a ``best`` link."""

    def __init__(
        self,
        root: str,
        monitor: str = "val/fense",
        mode: str = "max",
        top_k: int = 1,
        save_after_epoch: int = 0,
    ) -> None:
        if mode not in ("max", "min"):
            raise ValueError(f"Invalid {mode=}")
        self.root = root
        self.monitor = monitor
        self.mode = mode
        self.top_k = top_k
        self.save_after_epoch = save_after_epoch
        self._saved: list[tuple[float, str]] = []  # (score, dir)
        os.makedirs(root, exist_ok=True)

    @property
    def best_score(self) -> float | None:
        if not self._saved:
            return None
        return max(s for s, _ in self._saved) if self.mode == "max" else min(
            s for s, _ in self._saved
        )

    @property
    def best_dir(self) -> str | None:
        if not self._saved:
            return None
        key = (max if self.mode == "max" else min)
        return key(self._saved, key=lambda x: x[0])[1]

    def _is_improvement(self, score: float) -> bool:
        if len(self._saved) < self.top_k:
            return True
        worst = min(self._saved, key=lambda x: x[0] if self.mode == "max" else -x[0])
        return score > worst[0] if self.mode == "max" else score < worst[0]

    def step(
        self,
        epoch: int,
        metrics: dict[str, float],
        params: Any,
        *,
        opt_state: Any = None,
        tokenizer: AACTokenizer | None = None,
        extra_meta: dict | None = None,
    ) -> str | None:
        """Maybe snapshot after a validation epoch; returns the dir saved."""
        if epoch < self.save_after_epoch or self.monitor not in metrics:
            return None
        score = float(metrics[self.monitor])
        if not self._is_improvement(score):
            return None
        # hydra-safe filename separators (custom_ckpt.py:40-41)
        safe_mon = self.monitor.replace("/", "_")
        name = f"epoch_{epoch:03d}-{safe_mon}_{score:.4f}"
        ckpt_dir = os.path.join(self.root, name)
        save_checkpoint(
            ckpt_dir, params, opt_state=opt_state,
            step=epoch, tokenizer=tokenizer,
            meta={"monitor": self.monitor, "score": score, "epoch": epoch}
            | (extra_meta or {}),
        )
        self._saved.append((score, ckpt_dir))
        # evict beyond top_k
        ordered = sorted(self._saved, key=lambda x: x[0], reverse=self.mode == "max")
        for score_i, dir_i in ordered[self.top_k :]:
            shutil.rmtree(dir_i, ignore_errors=True)
        self._saved = ordered[: self.top_k]
        self._update_best_link()
        return ckpt_dir

    def _update_best_link(self) -> None:
        best = self.best_dir
        if best is None:
            return
        link = os.path.join(self.root, "best")
        try:
            if os.path.islink(link) or os.path.exists(link):
                if os.path.islink(link):
                    os.unlink(link)
                else:
                    shutil.rmtree(link)
            os.symlink(os.path.basename(best), link)
        except OSError:  # filesystems without symlinks: copy
            shutil.copytree(best, link, dirs_exist_ok=True)


def _opt_state_to_tree(opt_state: Any) -> Any:
    """optax states are nested namedtuples; convert to plain dicts."""
    if hasattr(opt_state, "_asdict"):
        return {k: _opt_state_to_tree(v) for k, v in opt_state._asdict().items()}
    if isinstance(opt_state, (list, tuple)):
        return [_opt_state_to_tree(v) for v in opt_state]
    if isinstance(opt_state, dict):
        return {k: _opt_state_to_tree(v) for k, v in opt_state.items()}
    return opt_state


def restore_opt_state(opt_state_flat: dict[str, Any], template: Any) -> Any:
    """Map a flattened ``opt_state.npz`` payload back onto a freshly
    initialized optax state of the same structure (resume-with-momentum).
    The template (``tx.init(params)``) provides the namedtuple skeleton;
    leaves are replaced positionally by flattened path."""
    import jax

    tree = _opt_state_to_tree(template)
    flat_template = flatten_pytree(tree)
    missing = sorted(set(flat_template) - set(opt_state_flat))
    extra = sorted(set(opt_state_flat) - set(flat_template))
    if missing or extra:
        raise ValueError(
            f"opt_state mismatch: missing={missing[:5]} extra={extra[:5]} "
            "(optimizer config changed since the checkpoint was written?)"
        )
    # rebuild values in the template's leaf order, then unflatten onto the
    # original (namedtuple-typed) structure
    leaves, treedef = jax.tree_util.tree_flatten(template)
    tree_leaves, _ = jax.tree_util.tree_flatten(tree)
    flat_items = flatten_pytree(tree)
    # positional alignment: flatten_pytree over the dict-ified tree yields
    # leaves in the same order as tree_flatten of that dict tree
    assert len(tree_leaves) == len(leaves)
    ordered = [opt_state_flat[k] for k in flat_items.keys()]
    return jax.tree_util.tree_unflatten(treedef, ordered)
