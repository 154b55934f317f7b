"""Tracing / profiling — absent in the reference (SURVEY.md §5.1; it has only
tqdm bars). TPU-native additions: jax.profiler trace capture around training
windows and a lightweight step timer for images/sec reporting.
"""

from __future__ import annotations

import contextlib
import time
import typing as t

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> t.Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard's profile plugin
    or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock throughput over a sliding window of steps.

    Call ``tick(n_images)`` once per step; ``images_per_sec`` reports the
    windowed rate. Forces no device sync itself — pair with a periodic
    block_until_ready if exact step boundaries matter.
    """

    def __init__(self, window: int = 50):
        self.window = window
        self._times: t.List[float] = []
        self._images: t.List[int] = []

    def tick(self, n_images: int) -> None:
        self._times.append(time.perf_counter())
        self._images.append(n_images)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._images.pop(0)

    @property
    def images_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return sum(self._images[1:]) / max(dt, 1e-9)


@contextlib.contextmanager
def annotate(name: str) -> t.Iterator[None]:
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield
