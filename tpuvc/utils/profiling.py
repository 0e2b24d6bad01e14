"""Tracing and per-stage timing (SURVEY.md section 5: the reference only has
ad hoc perf_counter/cuda.synchronize timers; here it is a first-class module).

- ``trace(logdir)``: context manager around jax.profiler for device traces
  viewable in TensorBoard/XProf.
- ``StageTimer``: accumulates wall-clock per named stage with device sync at
  the boundaries, so codec stages (flow, mv-code, warp, residual) can be
  attributed honestly.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1000.0 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }

    def __str__(self):
        rows = [
            f"{k}: {v['mean_ms']:.2f} ms x {v['count']}"
            for k, v in sorted(self.report().items())
        ]
        return "\n".join(rows)
