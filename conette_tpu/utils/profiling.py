"""Profiling & observability hooks.

TPU-native twins of the reference aux subsystems (SURVEY.md §5):
- ``trace`` context ≙ the opt-in PL PyTorchProfiler
  (``conf/trainer/profiler/pytorch.yaml``) → ``jax.profiler`` trace dirs
  viewable in TensorBoard/XProf;
- ``flops_profile`` ≙ the DeepSpeed FLOPs profiler callback
  (``callbacks/deepspeed.py:18-126``) → ``jit(...).lower().compile()
  .cost_analysis()``;
- ``TimeTracker`` ≙ ``callbacks/time.py:12-117`` fit/epoch wall-time
  tracking;
- ``debug_mode`` ≙ ``detect_anomaly`` + NaN EarlyStopping
  (``conf/trainer/dev.yaml``, ``train.py:188-194``) → ``jax_debug_nans``.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Callable, Iterator

import jax

pylog = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        pylog.info(f"Profiler trace written to {log_dir}")


def flops_profile(fn: Callable, *example_args: Any) -> dict[str, float]:
    """Compile ``fn`` on example args and report XLA's cost analysis
    (flops, bytes accessed, ...)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # per-device list on some backends
        analysis = analysis[0] if analysis else {}
    out = {k: float(v) for k, v in dict(analysis or {}).items()
           if isinstance(v, (int, float))}
    if "flops" in out:
        pylog.info(f"cost_analysis: {out.get('flops', 0):.3e} flops")
    return out


@contextlib.contextmanager
def debug_mode() -> Iterator[None]:
    """NaN/Inf trapping for a scope (dev twin of detect_anomaly)."""
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


class TimeTracker:
    """Wall-time tracking per named phase (fit/test/epoch...)."""

    def __init__(self) -> None:
        self._starts: dict[str, float] = {}
        self.durations: dict[str, float] = {}

    def start(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._starts.pop(name)
        self.durations[name] = self.durations.get(name, 0.0) + dt
        return dt

    @contextlib.contextmanager
    def track(self, name: str) -> Iterator[None]:
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def formatted(self) -> dict[str, str]:
        out = {}
        for name, secs in self.durations.items():
            h, rem = divmod(int(secs), 3600)
            m, s = divmod(rem, 60)
            out[name] = f"{h:02d}:{m:02d}:{s:02d}"
        return out
