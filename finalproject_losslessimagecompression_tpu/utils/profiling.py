"""Tracing / profiling utilities.

The reference's only instrumentation is manual time.time() spans printed in
the eval loop (reference: trainer.py:253-331, rans/test.py:15-27).  Here:
- `phase(name)`: accumulating wall-clock spans with a report, usable around
  any host-side region (forward vs encode vs decode, like the reference's
  forward_time / rans_en_time / rans_de_time breakdown);
- `device_trace(logdir)`: a jax.profiler trace context producing
  TensorBoard-compatible device profiles (XLA op-level timeline) -- the
  TPU-native replacement for print-timing device work.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }

    def summary(self) -> str:
        return "  ".join(
            f"{k}: {v['total_s']:.3f}s/{v['count']}"
            for k, v in sorted(self.report().items())
        )


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
