"""Smoke-run EVERY measurement/utility script at tiny shapes on CPU.

These scripts are the round-to-round measurement instruments (on-chip A/Bs,
latency/train benches, demos, fixture generators, the baseline weight gate);
they historically broke when a production call-site signature changed
underneath them (the l_chunks=4 default flip, fixed in commit 2d63348). A
subprocess dry run catches that drift at CI time instead of inside a scarce
chip window. The numbers the benches print are meaningless on CPU — only
rc=0 and the output schema are asserted.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def _run(args: list[str], timeout: int = 1200) -> subprocess.CompletedProcess:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, args[0]), *args[1:]],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


# ---------------------------------------------------------------- --help
# every argparse script answers --help without touching a device (and, for
# run_baseline_gate, without even importing jax — ADVICE r4)
HELP_SCRIPTS = [
    "ab_frontend.py",
    "ab_reorder.py",
    "ab_s1ln.py",
    "ab_seams.py",
    "ab_stage3.py",
    "bench_latency.py",
    "bench_train.py",
    "convert_checkpoint.py",
    "demo_task_conditioning.py",
    "demo_train.py",
    "parity_report.py",
    "roofline_stages.py",
    "run_baseline_gate.py",
]


@pytest.mark.parametrize("script", HELP_SCRIPTS)
def test_script_help(script: str) -> None:
    proc = _run([script, "--help"], timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "usage" in proc.stdout.lower()


def test_scripts_dir_fully_covered() -> None:
    """Every script in scripts/ has a smoke in this file — a new script
    cannot land without one (this test names the offender)."""
    covered = set(HELP_SCRIPTS) | {
        # dedicated dry-runs below
        "gen_flac_fixtures.py",
        "gen_resample_fixture.py",
        "gen_spacy_fixture.py",
        # shell helpers: build_native.sh is exercised by the conftest
        # native-build hook + tests/test_native_loader.py; the download
        # script is a connected-host curl wrapper (STAGING.md §3)
        "build_native.sh",
        "download_metric_resources.sh",
    }
    actual = {f for f in os.listdir(SCRIPTS) if not f.startswith("_")}
    missing = actual - covered
    assert not missing, f"scripts without a smoke test: {sorted(missing)}"


# ------------------------------------------------------------- dry runs
@pytest.mark.slow
def test_ab_reorder_smoke() -> None:
    proc = _run(["ab_reorder.py", "--batch", "2", "--iters", "1"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    for name in (
        "ancestry", "anc_gather", "anc_stacked",
        "full_perm", "chunked_2", "chunked_4", "none",
    ):
        assert f"median_{name}_ms" in out, out
        assert out[f"median_{name}_ms"] > 0.0
    # the correctness cross-check must have run AND passed — including the
    # read-time formulation variants of the ancestry path
    eq_lines = [
        json.loads(l)
        for l in proc.stderr.splitlines()
        if l.startswith('{"ancestry_eq_full_perm"')
    ]
    assert eq_lines, proc.stderr[-2000:]
    eq = eq_lines[0]
    assert eq["ancestry_eq_full_perm"] is True
    assert eq["anc_gather_eq_ancestry"] is True
    assert eq["anc_stacked_eq_ancestry"] is True


@pytest.mark.slow
def test_ab_frontend_smoke() -> None:
    proc = _run(["ab_frontend.py", "--batch", "2", "--iters", "1"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert any(k.startswith("median_") for k in out), out


@pytest.mark.slow
def test_ab_s1ln_smoke() -> None:
    # interpret mode on CPU: numbers meaningless, schema + rc asserted
    proc = _run(["ab_s1ln.py", "--batch", "1", "--iters", "1", "--interpret"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    for name in ("vpu", "mxu", "skip"):
        assert f"median_{name}_ms" in out, out
    assert "ln_share_ms" in out, out


@pytest.mark.slow
def test_ab_stage3_smoke() -> None:
    # CPU interpret mode: correctness (baseline == transposed == XLA chain,
    # restored pad columns zero) at a tiny batch, no timing
    proc = _run(["ab_stage3.py", "--batch", "2", "--check-only", "--interpret"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["ok"] is True, out


@pytest.mark.slow
def test_ab_seams_smoke() -> None:
    proc = _run(["ab_seams.py", "--batch", "2", "--iters", "1"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert any(k.startswith("median_") for k in out), out


@pytest.mark.slow
def test_roofline_stages_smoke() -> None:
    proc = _run(["roofline_stages.py", "--batch", "2", "--iters", "1",
                 "--chains", "1", "2"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert "anchor_matmul_tflops" in out and "s4" in out, out


@pytest.mark.slow
def test_bench_latency_smoke() -> None:
    proc = _run(["bench_latency.py", "--iters", "2", "--wav-seconds", "1",
                 "--vocab", "128"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["p50_ms"] > 0 and out["p90_ms"] >= out["p50_ms"], out


@pytest.mark.slow
def test_bench_train_smoke() -> None:
    proc = _run(["bench_train.py", "--batch", "4", "--iters", "2",
                 "--frames", "4", "--cap-len", "6", "--vocab", "64"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["samples_per_s"] > 0, out
    assert out["projected_epoch_s"] > 0, out


@pytest.mark.slow
def test_demo_task_conditioning_smoke() -> None:
    proc = _run(["demo_task_conditioning.py", "--smoke"], timeout=2400)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TASK DEMO SMOKE OK" in proc.stdout


@pytest.mark.slow
def test_demo_train_smoke(tmp_path) -> None:
    proc = _run(["demo_train.py", "--epochs", "1", "--out", str(tmp_path)],
                timeout=2400)
    assert proc.returncode == 0, proc.stderr[-3000:]


@pytest.mark.slow
def test_gen_flac_fixtures_smoke(tmp_path) -> None:
    proc = _run(["gen_flac_fixtures.py", str(tmp_path)])
    assert proc.returncode == 0, proc.stderr[-2000:]
    made = os.listdir(tmp_path)
    assert any(f.endswith(".flac") for f in made), made
    assert any(f.endswith(".wav") for f in made), made


def test_gen_resample_fixture_graceful(tmp_path) -> None:
    """Without torchaudio (this host) the generator must fail FAST with the
    staging message, not a traceback; with torchaudio it must write the npz."""
    out = str(tmp_path / "resample_fixtures.npz")
    proc = _run(["gen_resample_fixture.py", out], timeout=600)
    if proc.returncode == 0:
        assert os.path.isfile(out)
    else:
        assert "torchaudio not installed" in proc.stderr, proc.stderr[-2000:]


def test_gen_spacy_fixture_graceful() -> None:
    proc = _run(["gen_spacy_fixture.py"], timeout=600)
    if proc.returncode == 0:
        json.loads(proc.stdout)  # valid fixture JSON
    else:
        assert "spacy not installed" in proc.stderr, proc.stderr[-2000:]


@pytest.mark.slow
def test_run_baseline_gate_rehearse() -> None:
    """The weight gate's weight-free rehearsal must stay runnable after any
    signature churn — this is what makes the gate a one-command affair the
    day the released weights stage (STAGING.md §1)."""
    proc = _run(["run_baseline_gate.py", "--rehearse"], timeout=2400)
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])


@pytest.mark.slow
def test_parity_report_runs() -> None:
    """With the reference outputs staged (this host has them) the report must
    end PARITY: OK; without them it must fail fast, not hang."""
    from conette_tpu import parity

    proc = _run(["parity_report.py"], timeout=1800)
    if parity.available():
        assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
        assert "PARITY: OK" in proc.stdout
    else:
        assert proc.returncode != 0
