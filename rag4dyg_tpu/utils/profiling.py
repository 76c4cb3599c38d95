"""Profiling helpers: XLA trace capture + step-time statistics.

The reference has no profiling at all (SURVEY §5.1 — wall-clock prints
only). Here: a context manager around ``jax.profiler`` trace capture
(viewable in TensorBoard/Perfetto) and a lightweight step timer that
reports percentile step times — enough to see dispatch-bound vs
compute-bound regimes without external tooling.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def xla_trace(trace_dir: Optional[str]):
    """Capture an XLA profiler trace into ``trace_dir`` (no-op if None)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with percentile summary."""

    def __init__(self):
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        assert self._t0 is not None, "stop() without start()"
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        self._t0 = None
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        ts = sorted(self._times)
        n = len(ts)

        def pct(p: float) -> float:
            return ts[min(n - 1, int(p * n))]
        return {"steps": n, "mean_ms": sum(ts) / n * 1e3,
                "p50_ms": pct(0.50) * 1e3, "p90_ms": pct(0.90) * 1e3,
                "p99_ms": pct(0.99) * 1e3, "total_s": sum(ts)}
