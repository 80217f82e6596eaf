"""Misc run utilities (twins of ``src/conette/utils/misc.py:25-240``)."""

from __future__ import annotations

import logging
import os
import random
import subprocess
import zipfile
from typing import Iterable

import numpy as np

pylog = logging.getLogger(__name__)


def reset_seed(seed: int) -> None:
    """Seed every host-side RNG (twin of ``reset_seed``). JAX keys are
    explicit so only python/numpy need global seeding."""
    random.seed(seed)
    np.random.seed(seed % (2**32))


def get_current_git_hash(cwd: str | None = None, default: str = "unknown") -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, cwd=cwd, timeout=10,
        )
        return out.stdout.strip() if out.returncode == 0 else default
    except Exception:
        return default


def save_code_to_zip(
    out_fpath: str,
    root: str | None = None,
    extensions: Iterable[str] = (".py", ".yaml", ".cpp", ".toml"),
) -> str:
    """Snapshot the package source into a zip next to the run artifacts
    (twin of ``save_code_to_zip``)."""
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extensions = tuple(extensions)
    with zipfile.ZipFile(out_fpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fname in filenames:
                if fname.endswith(extensions):
                    fpath = os.path.join(dirpath, fname)
                    zf.write(fpath, os.path.relpath(fpath, root))
    return out_fpath


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Point JAX at a persistent compilation cache so repeated CLI / API
    invocations skip XLA+Mosaic recompiles (the fused ConvNeXt block Pallas
    kernels take minutes to compile per shape; cached runs are instant).

    Resolution order: explicit arg > $CONETTE_JAX_CACHE_DIR > a repo-local
    ``.jax_cache`` when the package is run from a checkout, else
    ``~/.cache/conette_tpu/jax``. No-op if a cache dir is already set."""
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:
        return
    if current:
        return
    if cache_dir is None:
        cache_dir = os.environ.get("CONETTE_JAX_CACHE_DIR")
    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        if os.path.isdir(os.path.join(repo_root, ".git")):
            cache_dir = os.path.join(repo_root, ".jax_cache")
        else:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "conette_tpu", "jax"
            )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as err:  # never make caching a hard failure
        pylog.debug(f"compilation cache unavailable: {err}")


def hard_exit(rc: int) -> None:
    """Flush stdio and ``os._exit`` — for CLI ``__main__`` blocks only.

    Remote/tunneled PJRT backends (the axon plugin on this host) can hang
    forever in client teardown during interpreter shutdown, leaving a CLI
    that finished its work (output printed, CSV written) wedged until the
    user kills it. Skipping interpreter shutdown after a completed run is
    safe: all artifacts are written with explicit flush/close before the
    mains return. Library callers must NOT use this — only the
    ``if __name__ == "__main__"`` entry points."""
    import sys as _sys

    _sys.stdout.flush()
    _sys.stderr.flush()
    os._exit(rc)
