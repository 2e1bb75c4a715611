"""Profiling / tracing utilities.

The reference only has wall-clock timers (SURVEY §5).  Here:
* ``trace(logdir)`` — jax.profiler trace context for TensorBoard-profile dumps;
* ``StepTimer`` — device-synchronized step timing + edges/sec accounting (the
  BASELINE metric);
* ``debug_nans()`` — enable jax_debug_nans for debug configs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Times jitted steps with block_until_ready; reports steps/sec and
    edges/sec given the per-step edge count."""

    def __init__(self, edges_per_step: Optional[int] = None):
        self.edges_per_step = edges_per_step
        self.reset()

    def reset(self):
        self._t0 = None
        self.steps = 0
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.elapsed += time.perf_counter() - self._t0
        self.steps += 1

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.elapsed if self.elapsed else 0.0

    @property
    def edges_per_sec(self) -> float:
        if not self.edges_per_step:
            return 0.0
        return self.steps_per_sec * self.edges_per_step


def debug_nans(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
