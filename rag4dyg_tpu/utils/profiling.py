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


def lm_flops_per_token(n_layer: int, n_embd: int, seq_len: int,
                       vocab_size: int = 0) -> float:
    """Approximate forward FLOPs per token of the GPT-2 backbone:
    24*L*D^2 (qkv/proj/mlp matmuls) + 4*L*S*D (attention scores+values),
    plus 2*D*V when the tied lm_head projection is computed."""
    return (24.0 * n_layer * n_embd * n_embd
            + 4.0 * n_layer * seq_len * n_embd
            + 2.0 * n_embd * vocab_size)


def lm_train_flops(n_layer: int, n_embd: int, tokens: float, seq_len: int,
                   *, vocab_size: int = 0, remat: bool = False) -> float:
    """Training FLOPs for ``tokens`` processed at ``seq_len``: forward +
    2x backward (+1 forward recompute under jax.checkpoint)."""
    mult = 4.0 if remat else 3.0
    return mult * tokens * lm_flops_per_token(n_layer, n_embd, seq_len,
                                              vocab_size)


# v5e MXU peak (bf16); f32 matmuls also run as single bf16 MXU passes on
# this chip (CLAUDE.md), so one denominator serves both dtypes
TPU_PEAK_FLOPS = 197e12


def mfu(flops: float, seconds: float,
        peak: float = TPU_PEAK_FLOPS) -> float:
    """Model FLOP utilization in [0, 1] against the chip's MXU peak."""
    if seconds <= 0:
        return 0.0
    return flops / seconds / peak


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
