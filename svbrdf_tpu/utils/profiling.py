"""Profiling & step-time metrics.

The reference has no in-path profiling — throughput was measured offline by
differencing TensorBoard wall-clock stamps (reference
development/notebooks/website.ipynb cell 21; SURVEY.md §5). Here tracing is
first-class: `trace_steps` wraps a window of train steps in a
`jax.profiler` trace viewable in TensorBoard/XProf or Perfetto, and
`StepTimer` keeps streaming step-time statistics that the trainer logs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace_steps(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Streaming wall-clock stats for train steps.

    Excludes the first `warmup` steps (compile) from the summary.
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: list = []

    @contextlib.contextmanager
    def measure(self) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self._times.append(time.perf_counter() - t0)

    @property
    def count(self) -> int:
        return len(self._times)

    def steady_times(self) -> np.ndarray:
        return np.asarray(self._times[self.warmup:] or self._times)

    def mean_ms(self) -> float:
        return float(self.steady_times().mean() * 1e3) if self._times else 0.0

    def median_ms(self) -> float:
        return (float(np.median(self.steady_times()) * 1e3)
                if self._times else 0.0)

    def summary(self) -> str:
        if not self._times:
            return "no steps timed"
        t = self.steady_times()
        first = self._times[0] * 1e3
        return (f"steps: {self.count}, first {first:.1f} ms (incl. compile), "
                f"median {np.median(t) * 1e3:.2f} ms, "
                f"mean {t.mean() * 1e3:.2f} ms, "
                f"p95 {np.percentile(t, 95) * 1e3:.2f} ms")
