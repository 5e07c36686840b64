"""Tracing / profiling hooks (SURVEY.md §5).

The reference's observability is debug-utils object names for RenderDoc
captures plus a per-frame dt. TPU equivalents here:

- named jax.profiler scopes on pipeline stages (readable device traces)
- a trace context manager writing xplane/trace-json for TensorBoard
- FrameStats: the FPS/ms counter the reference computes but never shows
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


def stage_scope(name: str):
    """Name a pipeline stage in device traces (debug-label analog,
    render.cpp labelGPUResource)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class FrameStats:
    """Rolling frame-time statistics for the host loop."""

    window: int = 60
    _times: list = field(default_factory=list)
    _last: float | None = None

    def tick(self) -> float:
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        self._last = now
        if dt > 0:
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        return dt

    @property
    def ms_per_frame(self) -> float:
        if not self._times:
            return 0.0
        return 1e3 * sum(self._times) / len(self._times)

    @property
    def fps(self) -> float:
        ms = self.ms_per_frame
        return 1e3 / ms if ms > 0 else 0.0

    def summary(self) -> str:
        return f"{self.ms_per_frame:.2f} ms/frame ({self.fps:.1f} fps)"
