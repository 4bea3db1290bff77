"""Tracing / profiling utilities.

The reference's only observability is wall-clock prints every 5 iters with
explicit cuda synchronizes (`train.py:134-174`).  Here profiling is a
first-class module: phase timers with summary statistics, and a context
manager around ``jax.profiler`` for on-demand device traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class PhaseTimers:
    """Accumulating named timers (host wall-clock)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a block; pass sync=jax.block_until_ready-able output getter
        to include device time."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax
                jax.block_until_ready(sync() if callable(sync) else sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(self.totals[k], 4),
                    "count": self.counts[k],
                    "mean_ms": round(1e3 * self.totals[k]
                                     / max(self.counts[k], 1), 3)}
                for k in sorted(self.totals)}

    def report(self) -> str:
        lines = [f"{k:>24}: {v['total_s']:8.2f}s / {v['count']:6d} = "
                 f"{v['mean_ms']:8.2f}ms" for k, v in self.summary().items()]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/subgc_trace",
                 host_tracer_level: int = 2):
    """jax.profiler trace around a block (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
