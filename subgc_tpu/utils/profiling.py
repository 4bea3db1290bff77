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


def decode_flops_per_row(cfg) -> int:
    """Analytic matmul FLOPs of ONE decode-step row (one beam/sub-graph slot
    for one token step) at config dims.

    This is the single source of truth for the bench/profiler MFU numbers:
    XLA's ``cost_analysis()`` counts while-loop bodies once, undercounting a
    T-step decode scan ~16x (docs/PERF.md round 3), so throughput artifacts
    count decode FLOPs analytically with this formula instead.  Terms match
    the split-matmul decode step in models/decoder.py::decode_step; the
    optional fold/merge variants shuffle the same FLOPs between matmuls
    without changing the total (fold removes the xt matmul but is
    off-by-default and excluded here — counts stay conservative).
    """
    R, E, H, N = (cfg.rnn_size, cfg.input_encoding_size, cfg.att_hid_size,
                  cfg.obj_num)
    V1 = cfg.vocab_size + 1
    return (2 * R * 4 * R          # att-LSTM h_lang @ w_ih[:R]
            + 2 * E * 4 * R        # att-LSTM xt @ w_ih[2R:]
            + 2 * R * 4 * R        # att-LSTM h_att @ w_hh
            + 2 * R * H + 2 * N * H + 2 * N * R   # additive attention
            + 2 * 2 * R * 4 * R    # lang-LSTM [att_res, h_att] @ w_ih
            + 2 * R * 4 * R        # lang-LSTM h_lang @ w_hh
            + 2 * R * V1)          # logit projection


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
