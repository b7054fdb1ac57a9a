"""Tracing / profiling hooks.

The reference's only observability is wall-clock epoch timing pushed to
wandb (main_image.py:550-565,601). Rebuild adds (SURVEY §5):
  * ``trace(logdir)`` — context manager around ``jax.profiler`` traces
    (viewable in TensorBoard / xprof);
  * ``StepTimer`` — per-step wall latencies with p50/p90/p99 summaries;
  * ``annotate`` — named TraceAnnotation spans visible in the trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self):
        self.samples: List[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)

        def pct(p):
            return s[min(int(len(s) * p), len(s) - 1)]

        return {"n": len(s), "mean_s": sum(s) / len(s),
                "p50_s": pct(0.50), "p90_s": pct(0.90), "p99_s": pct(0.99),
                "total_s": sum(s)}
