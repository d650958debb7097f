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

    def report(self, reset: bool = False) -> str:
        lines = []
        for name in sorted(self.totals):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name}: {tot:.3f}s total, {tot/max(n,1)*1e3:.2f} ms/call × {n}")
        if reset:
            self.reset()
        return "\n".join(lines)

    def reset(self) -> None:
        """Zero the accumulators — per-epoch reports must not blend epochs."""
        self.totals.clear()
        self.counts.clear()


class StepProfiler:
    """jax.profiler trace of the first N steps, flushed from EVERY exit path
    (a run shorter than N steps, or one stopped by preemption, must still
    write the artifact). Shared by both trainer entry points."""

    def __init__(self, n_steps: int, log_dir: str):
        import os
        import sys

        self.left = n_steps
        self.on = False
        if n_steps:
            import jax

            self.trace_dir = os.path.join(log_dir, "trace")
            jax.profiler.start_trace(self.trace_dir)
            self.on = True
            print(f"profiling {n_steps} steps → {self.trace_dir}", file=sys.stderr)

    def tick(self, fence=None) -> None:
        """Count one step; stops the trace when the budget is spent."""
        if self.on:
            self.left -= 1
            if self.left <= 0:
                self.stop(fence)

    def stop(self, fence=None) -> None:
        if self.on:
            import sys

            import jax

            if fence is not None:
                float(fence)  # host fence so the trace captures real work
            jax.profiler.stop_trace()
            self.on = False
            print("profiler trace written", file=sys.stderr)
