"""Profiling / tracing hooks — the observability upgrade over the
reference, which has none (SURVEY.md §5.1: tqdm + ETA arithmetic only).

- `trace(dir)`: context manager around jax.profiler (XPlane traces
  viewable in TensorBoard / xprof);
- `StepTimer`: wall-clock per-step stats with device sync on demand;
- `annotate`: named TraceAnnotation for step phases.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Track per-step wall time; `summary()` gives mean/p50/p90."""
    sync: bool = False
    times: list = field(default_factory=list)
    _t0: float = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if self.sync and result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            'steps': n,
            'mean_s': sum(ts) / n,
            'p50_s': ts[n // 2],
            'p90_s': ts[int(n * 0.9)],
            'total_s': sum(self.times),
        }
