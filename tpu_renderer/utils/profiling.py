"""Profiling and debug instrumentation (SURVEY.md §5.1-5.2).

The reference's only instrumentation is a wall-clock print (main.py:152-155)
and per-model render stats (core.py:634-636). Here:

- :class:`FrameTimer` measures steady-state frame rates with proper device
  synchronization (each frame's output is materialized on the host — on
  tunneled dev TPUs ``block_until_ready`` alone under-reports).
- :func:`trace` wraps ``jax.profiler.trace`` for XProf/Perfetto dumps.
- :func:`nan_debug` enables jax's NaN checker around a scope — the moral
  equivalent of a sanitizer for the all-masks-no-branches pipeline.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["FrameTimer", "trace", "nan_debug", "summarize_device_trace"]


class FrameTimer:
    """Steady-state frame timing: ``with FrameTimer() as t: ... t.frame(x)``."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        return False

    def frame(self, device_output):
        """Record one frame, synchronizing on its output."""
        np.asarray(device_output)
        now = time.perf_counter()
        self.times.append(now - self._t0)
        self._t0 = now

    @property
    def fps(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    def summary(self) -> dict:
        ts = np.asarray(self.times)
        return {"frames": len(ts), "fps": self.fps,
                "ms_mean": float(ts.mean() * 1000) if len(ts) else 0.0,
                "ms_p50": float(np.median(ts) * 1000) if len(ts) else 0.0,
                "ms_max": float(ts.max() * 1000) if len(ts) else 0.0}


@contextlib.contextmanager
def trace(log_dir="/tmp/tpu_renderer_trace"):
    """``jax.profiler`` trace scope; view with XProf/TensorBoard/Perfetto."""
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir


@contextlib.contextmanager
def nan_debug():
    """Enable jax_debug_nans within the scope (debug-mode sanitizer)."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def summarize_device_trace(log_dir) -> list:
    """Aggregate per-op device durations from a :func:`trace` dump.

    Returns [(total_ms, op_name, source_line)] sorted descending — the
    fastest way to find the dominant XLA fusion without TensorBoard.
    """
    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        return []
    data = json.load(gzip.open(files[-1]))
    dur = collections.Counter()
    src = {}
    for e in data.get("traceEvents", []):
        args = e.get("args") or {}
        if e.get("ph") == "X" and "dur" in e and args.get("long_name"):
            dur[e["name"]] += e["dur"]
            src[e["name"]] = args.get("source", "?")
    return [(d / 1000.0, name, src[name]) for name, d in dur.most_common()]
