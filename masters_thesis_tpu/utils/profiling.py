"""Profiling hooks.

Reference: TensorBoard callback with update_freq='batch' and a commented-out
profile_batch (AttemptFour/main.py:202-211). TPU-native: the JAX profiler
(XPlane traces viewable in TensorBoard/Perfetto) plus a lightweight per-step
wall-time recorder.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a JAX profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Record wall-time of step windows (e.g. batches 200..220 like the
    reference's profile_batch) and dump simple stats."""

    def __init__(self, start_step: int = 0, end_step: int = 0):
        self.start_step = start_step
        self.end_step = end_step
        self.times: list[float] = []
        self._t = None

    def maybe_tick(self, step: int) -> None:
        now = time.perf_counter()
        active = self.start_step <= step <= self.end_step
        if self._t is not None and active:
            self.times.append(now - self._t)
        self._t = now if active else None

    def summary(self) -> dict:
        if not self.times:
            return {}
        times = sorted(self.times)
        n = len(times)
        return {
            "steps": n,
            "mean_s": sum(times) / n,
            "p50_s": times[n // 2],
            "p99_s": times[min(n - 1, int(n * 0.99))],
        }
