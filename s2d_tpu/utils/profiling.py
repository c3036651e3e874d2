"""Profiling helpers: jax.profiler tracing + simple step timers.

The reference's observability is an IterationTimer + data-time metric
(`/root/reference/model_training/mask2former_video/engine/defaults.py:532`,
`train_loop.py:597-605`). On TPU we additionally get kernel-level traces
for free via jax.profiler (viewable in Perfetto/XProf).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into `logdir` (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-time per step with (data, compute) split, IterationTimer-style."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self.data_time = 0.0
        self.step_time = 0.0

    def data_done(self):
        now = time.perf_counter()
        self.data_time = now - self._t0
        self._t1 = now

    def step_done(self):
        now = time.perf_counter()
        self.step_time = now - self._t1
        self._t0 = now
        # consecutive step_done calls (lagged-readback flushes can pair two
        # flushes with one data_done) must measure DISJOINT spans
        self._t1 = now

    def metrics(self):
        return {"data_time": self.data_time, "time": self.data_time + self.step_time}


# v5e per-chip bf16 peak (datasheet), shared by every bench's MFU line so
# a future correction happens in exactly one place
V5E_PEAK_BF16_FLOPS = 197e12


def compiled_flops(lowerable, *args, **kwargs) -> float:
    """FLOPs of one call per XLA's cost analysis of the compiled
    executable (0.0 when unavailable). `lowerable` is a jitted function;
    the lower/compile hits the persistent compilation cache, so this
    costs seconds, not a recompile."""
    try:
        cost = lowerable.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def mfu_vs_v5e(flops_per_call: float, calls: int, seconds: float) -> float:
    """Measured FLOP/s over the v5e bf16 peak. Only meaningful on TPU —
    callers gate on the backend."""
    if seconds <= 0:
        return 0.0
    return (flops_per_call * calls / seconds) / V5E_PEAK_BF16_FLOPS
