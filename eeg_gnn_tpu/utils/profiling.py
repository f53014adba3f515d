"""Profiling hooks: jax.profiler traces + step timing.

The reference has only wall-clock helpers (SURVEY.md §5); on TPU the
useful tool is an XLA trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing with a real device sync per measurement.

    Under the remote TPU tunnel, ``block_until_ready`` can return before
    execution completes — callers should pass a scalar device value whose
    ``float()`` forces the sync (e.g. the step loss).
    """

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(sync_value)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
