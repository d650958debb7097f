"""Profiling hooks (SURVEY §5.1 — the reference has none; we add the
TPU-native versions: `jax.profiler` traces + per-stage wall timers).

Usage:
    with trace_if("/tmp/jax-trace", enabled=args.profile):
        ... training steps ...

    timers = StageTimers()
    with timers.stage("decode"): ...
    with timers.stage("h2d"): ...
    print(timers.report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def trace_if(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (viewable in XProf/TensorBoard)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimers:
    """Accumulating wall-clock timers for input-pipeline stages."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name}: {tot:.3f}s total, {tot/max(n,1)*1e3:.2f} ms/call × {n}")
        return "\n".join(lines)
