"""Profiling and step-timing utilities (SURVEY.md §5.1 gap).

The reference has no tracing/profiling support beyond the JAX compilation
cache (reference common/runner.py:45-54). Here:

- `trace(dir)`: context manager around `jax.profiler.trace` — captures a
  TensorBoard-viewable device trace (use with tensorboard_plugin_profile).
- `StepTimer`: lightweight wall-clock step timer with EWMA steps/sec,
  used by the training runner's progress logging.
- `annotate(name)`: `jax.profiler.TraceAnnotation` passthrough for marking
  host-side phases inside a capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into `log_dir`."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named host-side annotation visible in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock steps/sec with exponential smoothing."""

    def __init__(self, smoothing: float = 0.9):
        self._smoothing = smoothing
        self._last: Optional[float] = None
        self._rate: Optional[float] = None

    def tick(self, units: float = 1.0) -> Optional[float]:
        """Record one step of `units` work; returns smoothed units/sec."""
        now = time.monotonic()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            rate = units / dt
            if self._rate is None:
                self._rate = rate
            else:
                self._rate = self._smoothing * self._rate + (1 - self._smoothing) * rate
        self._last = now
        return self._rate

    @property
    def rate(self) -> Optional[float]:
        return self._rate
