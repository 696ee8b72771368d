"""Tracing / profiling utilities.

The reference surfaces only steps/s in its progress bar (SURVEY.md §5 —
no tracing, no timers).  Here: jax.profiler trace capture plus lightweight
per-phase wall timers that aggregate into a report.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimers:
    """Accumulating wall-clock timers: `with timers.phase('decode'): ...`"""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"  {name:24s} {t:8.3f}s total  {t / n * 1000:8.2f} ms/call  x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace when a log dir is given (view with TensorBoard /
    xprof); no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
