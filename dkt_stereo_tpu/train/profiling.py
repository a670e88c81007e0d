"""Profiling / tracing hooks (SURVEY.md §5: the reference has only wall-clock
FPS timing; this is the TPU-native equivalent plus real tracing).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-viewable trace of XLA ops, Pallas kernels and host callbacks.
- ``start_server(port)``: live profiling endpoint for ``tensorboard
  --logdir`` / ``xprof`` attach.
- ``step_timer``: warm-up-excluded steps/s meter matching the reference's
  FPS protocol (tools/evaluate_stereo.py:128-133).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    import jax

    return jax.profiler.start_server(port)


class StepTimer:
    """Running steps/s with the first ``warmup`` samples excluded."""

    def __init__(self, warmup: int = 50):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt

    @property
    def steps_per_sec(self) -> float:
        n = self.count - self.warmup
        return n / self.total if n > 0 and self.total > 0 else float("nan")
