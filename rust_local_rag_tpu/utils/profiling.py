"""Tracing / step-time percentile tooling.

The reference instruments per-phase latency inside rerank scoring and
exposes a calibrate tool computing percentile stats (SURVEY.md §5.1,
reranker.rs:321-441,605-699). TPU counterpart: a JAX profiler trace context
for deep dives plus a lightweight step timer with nearest-rank percentiles
for steady-state monitoring.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import List, Optional


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX profiler trace (open with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepStats:
    mean_ms: float
    median_ms: float
    p95_ms: float
    p99_ms: float
    max_ms: float
    sample_size: int


class StepTimer:
    """Collects wall-clock step durations; nearest-rank percentiles with
    index round(p * (N-1)) — the reference's formula (reranker.rs:670-676).
    """

    def __init__(self) -> None:
        self._durations_ms: List[float] = []
        self._start: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        assert self._start is not None
        self._durations_ms.append((time.perf_counter() - self._start) * 1000)
        self._start = None

    def record_ms(self, ms: float) -> None:
        self._durations_ms.append(ms)

    def stats(self) -> StepStats:
        if not self._durations_ms:
            raise ValueError("no samples recorded")
        data = sorted(self._durations_ms)
        n = len(data)
        p95 = data[min(round(0.95 * (n - 1)), n - 1)]
        p99 = data[min(round(0.99 * (n - 1)), n - 1)]
        return StepStats(
            mean_ms=sum(data) / n,
            median_ms=data[n // 2],
            p95_ms=p95,
            p99_ms=p99,
            max_ms=data[-1],
            sample_size=n,
        )
