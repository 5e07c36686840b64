"""Double-buffered framebuffer readback.

The reference keeps 2 frames in flight (numFrames=2, main.cpp:38) with
fence/semaphore sync (FrameSync, render.h:348-352): the CPU records frame N
while the GPU finishes frame N−1. The JAX analog: dispatch of a jitted frame
is asynchronous, so we hold the previous frame's device array and only
synchronize (device→host DMA) one frame late — the host never blocks on the
frame it just submitted.
"""

from __future__ import annotations

import numpy as np


class DoubleBufferedReadback:
    """Submit device frames; get host copies one frame behind."""

    def __init__(self, depth: int = 2):
        assert depth >= 1
        self._depth = depth
        self._inflight: list = []

    def submit(self, device_image) -> np.ndarray | None:
        """Queue a (dispatched, not awaited) device array. Returns the host
        copy of the oldest in-flight frame once the pipeline is full."""
        self._inflight.append(device_image)
        if len(self._inflight) >= self._depth:
            oldest = self._inflight.pop(0)
            return np.asarray(oldest)  # blocks only on the old frame
        return None

    def flush(self) -> list[np.ndarray]:
        """Drain all in-flight frames (vkDeviceWaitIdle analog at shutdown)."""
        out = [np.asarray(x) for x in self._inflight]
        self._inflight.clear()
        return out
