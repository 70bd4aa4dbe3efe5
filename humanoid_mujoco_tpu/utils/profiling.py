"""Profiling/tracing utilities.

The reference times planner stages (noise/rollout/model-deriv/cost-
deriv/backward-pass/policy-update) with wall-clock segment timers and
atomic accumulation, surfaced as GUI plots (sampling/planner.cc:162-207,
agent.cc:297-300). Headless TPU equivalents:

  * StageTimers — host-side accumulating section timers (the GetDuration
    + IncrementAtomic analog); remember that jit makes host timings
    dispatch times unless you block_until_ready inside the section.
  * trace_to — context manager around jax.profiler for device-level
    traces viewable in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimers:
    """Accumulating wall-clock section timers (thread-safe)."""

    def __init__(self):
        self._t: Dict[str, float] = defaultdict(float)
        self._n: Dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def section(self, name: str, block: bool = False, result=None):
        t0 = time.perf_counter()
        yield
        if block and result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        with self._lock:
            self._t[name] += dt
            self._n[name] += 1

    def summary(self) -> Dict[str, dict]:
        with self._lock:
            return {k: dict(total_s=round(v, 6), calls=self._n[k],
                            mean_ms=round(1e3 * v / max(self._n[k], 1), 3))
                    for k, v in self._t.items()}

    def reset(self):
        with self._lock:
            self._t.clear()
            self._n.clear()


@contextlib.contextmanager
def trace_to(logdir: str):
    """Device-level trace (jax.profiler) for XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
