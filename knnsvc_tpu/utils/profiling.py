"""Profiling / tracing utilities (SURVEY.md §5: the reference has none beyond
wall-clock prints; the rebuild uses jax.profiler + per-stage timers).

- `trace(dir)`: context manager around jax.profiler (XPlane traces viewable
  in TensorBoard / xprof).
- `StageTimer`: accumulates wall-clock per named stage, forcing device
  completion via host transfer (block_until_ready is unreliable through the
  axon tunnel on this box).
- `annotate(name)`: jax.profiler.TraceAnnotation passthrough for custom spans.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def force_completion(tree):
    """Force device work to finish by pulling a leaf to host (see
    memory: axon block_until_ready pitfall). Pulls ONE element, not the
    whole array — downloading a (T, 1024) pool through the tunnel would
    time the transfer, not the compute (r5: a full 6 MB pull inflated the
    pool_build attribution by ~250 ms/stage)."""
    import jax

    leaves = jax.tree.leaves(tree)
    if leaves:
        leaf = leaves[-1]
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 1:
            np.asarray(leaf.ravel()[:1])
        else:
            np.asarray(leaf)
    return tree


class StageTimer:
    """Accumulating per-stage wall timer.

    with timer.stage("wavlm"):
        feats = encode(...)       # device completion forced on exit
    print(timer.report())
    """

    def __init__(self, sync: bool = True):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._sync = sync
        self._last_result = None

    @contextlib.contextmanager
    def stage(self, name: str, result_getter=None):
        t0 = time.time()
        try:
            yield self
        finally:
            if self._sync and self._last_result is not None:
                force_completion(self._last_result)
                self._last_result = None
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def observe(self, result):
        """Register the stage's device output so completion can be forced."""
        self._last_result = result
        return result

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        total = sum(self.totals.values())
        lines = [f"{name:24s} {t:8.3f}s  ({self.counts[name]}x, {100*t/max(total,1e-9):5.1f}%)"
                 for name, t in rows]
        return "\n".join(lines + [f"{'TOTAL':24s} {total:8.3f}s"])

    def as_json(self) -> str:
        return json.dumps({k: {"seconds": v, "count": self.counts[k]}
                           for k, v in self.totals.items()})
