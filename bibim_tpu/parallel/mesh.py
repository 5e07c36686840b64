"""Device mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_device_mesh(n_devices: int | None = None, axis_name: str = "rows") -> Mesh:
    """1D mesh over the first ``n_devices`` devices (framebuffer-row axis)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))
