"""Profiling / tracing hooks.

The reference has no profiling surface at all (SURVEY.md section 5.1 — the
offline progress bar is its only throughput signal).  This module provides:
per-stage wall timers with relay-safe device synchronization, and a
context manager around ``jax.profiler`` for device traces viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


def sync(tree):
    """Force true device completion (block_until_ready can return early
    through remote-relay backends; a host transfer cannot)."""
    import jax

    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[:1])
    return tree


class StageTimer:
    """Accumulates wall time per named stage; device-synced on exit."""

    def __init__(self, device_sync: bool = True):
        self.device_sync = device_sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._result = None

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if self.device_sync and holder.get("result") is not None:
                sync(holder["result"])
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {name: {"total_s": round(t, 4),
                       "count": self.counts[name],
                       "mean_ms": round(t / max(self.counts[name], 1) * 1e3, 3)}
                for name, t in sorted(self.totals.items(),
                                      key=lambda kv: -kv[1])}

    def report(self) -> str:
        lines = [f"{'stage':<24}{'count':>8}{'mean ms':>12}{'total s':>10}"]
        for name, s in self.summary().items():
            lines.append(f"{name:<24}{s['count']:>8}{s['mean_ms']:>12.3f}"
                         f"{s['total_s']:>10.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context — view with TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
