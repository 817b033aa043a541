"""Tracing / profiling helpers (SURVEY.md section 5.1).

The reference has no profiling beyond the injected ``sys_time`` clock and
``printing`` prints.  Here: per-phase wall timers with device fences (a timer
around async-dispatched JAX work is meaningless without ``block_until_ready``)
and a thin wrapper over ``jax.profiler`` traces for TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates fenced wall-time per named phase.

    >>> timer = PhaseTimer()
    >>> with timer.phase("steer", fence=result):
    ...     result = rollout(...)
    >>> timer.summary()   # {'steer': {'total_s': ..., 'count': ..., ...}}
    """

    def __init__(self, clock=time.perf_counter):
        self.clock = clock
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        """Time a block; ``fence`` (any pytree of device arrays) is
        block_until_ready'd before the clock stops so async dispatch does not
        fake instant phases."""
        t0 = self.clock()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self.totals[name] += self.clock() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: dict(total_s=self.totals[name], count=self.counts[name],
                       mean_s=self.totals[name] / max(self.counts[name], 1))
            for name in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context: view in TensorBoard / Perfetto.

    Captures XLA executable timelines (rounds, NN kernel, steer scan) for the
    enclosed block.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_call(fn, *args, **kwargs):
    """Run fn, fence its outputs, return (outputs, elapsed_s)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
