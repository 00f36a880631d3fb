"""Tracing and per-phase step timing — a first-class observability module.

The reference has no systematic profiling (one ad-hoc wall-clock loop,
pyhaspi2.py:1253-1262, and a commented cProfile line; SURVEY §5).  Here:

  * `StepTimer` accumulates wall-clock per named phase and reports
    count/mean/total — the training loop wraps its phases with it;
  * `trace_context` wraps a block in a `jax.profiler` trace when a
    directory is given (view with TensorBoard or xprof), and is a no-op
    otherwise, so it can stay in production code paths.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StepTimer:
    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {name: {"total_s": self._total[name],
                       "count": self._count[name],
                       "mean_s": self._total[name] / self._count[name]}
                for name in self._total}

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=1)

    def __str__(self) -> str:
        return " | ".join(
            f"{k}: {v['total_s']:.1f}s total ({v['count']}x, "
            f"mean {v['mean_s']:.2f}s)"
            for k, v in sorted(self.report().items()))


@contextlib.contextmanager
def trace_context(trace_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace when trace_dir is set; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
