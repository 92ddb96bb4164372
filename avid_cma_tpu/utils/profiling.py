"""Profiling & tracing utilities.

Capability reference: the reference has only wall-clock meters
(utils/metrics_utils.py:29-58; SURVEY §5 'Tracing/profiling: none').
TPU-native superset: XLA profiler traces viewable in TensorBoard/XProf,
a step-time tracker with MXU-utilization estimates, and annotation
contexts that show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture an XLA profiler trace (open with TensorBoard's profile
    plugin / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_trace(logdir: str) -> None:
    """Begin an XLA trace (explicit form of `trace` for loop-driven
    windows, e.g. run_pretraining's `profile_steps` config key)."""
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline (context manager). For a
    decorator use jax.profiler.annotate_function."""
    return jax.profiler.TraceAnnotation(name)


def start_server(port: int = 9999):
    """On-demand profiling server (connect with TensorBoard capture)."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Rolling step-time / throughput tracker with an optional FLOP model
    for utilization estimates."""

    def __init__(self, items_per_step: int, flops_per_item: Optional[float] = None,
                 window: int = 50):
        self.items = items_per_step
        self.flops = flops_per_item
        self.window = window
        self._times: list[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def step_time(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def items_per_sec(self) -> float:
        st = self.step_time
        return self.items / st if st else 0.0

    def utilization(self, peak_flops: float) -> Optional[float]:
        if self.flops is None or not self._times:
            return None
        return (self.items * self.flops / self.step_time) / peak_flops
