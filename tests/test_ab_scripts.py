"""Smoke-run the on-chip A/B scripts on CPU at tiny shapes.

These scripts monkeypatch production module globals (e.g. beam.py's
``reorder_cache`` / ``REORDER_L_CHUNKS``) and historically broke when the
production call-site signature changed underneath them (the l_chunks=4
default flip). A subprocess smoke run catches that drift; the numbers it
prints are meaningless on CPU.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_ab_reorder_smoke() -> None:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ab_reorder.py"),
         "--batch", "2", "--iters", "1"],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    # every variant produced a timing, and the labels are the expected set
    for name in ("full_perm", "chunked_2", "chunked_4", "chunked_10", "none"):
        assert f"median_{name}_ms" in out, out
        assert out[f"median_{name}_ms"] > 0.0
