"""Profiling helpers.

The reference's only profiling support was a TensorBoard callback with
``profile_batch=2`` behind ``--enable_profile`` (reference
``helpers/callbacks.py:44-48``).  Here: a ``jax.profiler`` trace context and
a steps/sec / docs/sec counter usable from any loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax profiler trace into ``log_dir`` (no-op when None)."""
    import jax

    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput counter: steps/sec and items/sec over a sliding window."""

    def __init__(self, items_per_step: int = 1):
        self.items_per_step = items_per_step
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def items_per_sec(self) -> float:
        return self.steps_per_sec * self.items_per_step
