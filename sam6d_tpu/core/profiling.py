"""Stage timing + device tracing.

The reference instruments wall-clock per stage (proposal vs matching,
detector.py:347-398; T_data/T_forward/T_back around cuda.synchronize,
solver.py:82-110). Equivalent here: a StageTimer that fences with
block_until_ready, plus jax.profiler trace capture for kernel-level views.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Accumulates per-stage wall-clock with device fencing."""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        yield
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.times[k] / max(self.counts[k], 1) for k in self.times}


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace around a region (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class LogBuffer:
    """Running means of scalar metrics (reference gorilla LogBuffer used by
    Solver, utils/solver.py:111-121)."""

    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    def update(self, metrics: Dict[str, float]):
        for k, v in metrics.items():
            self._sums[k] = self._sums.get(k, 0.0) + float(v)
            self._counts[k] = self._counts.get(k, 0) + 1

    def average(self) -> Dict[str, float]:
        return {k: self._sums[k] / self._counts[k] for k in self._sums}

    def clear(self):
        self._sums.clear()
        self._counts.clear()
