"""Host-side (NumPy) twins of the math3d constructors.

Per-frame host code (camera matrices, projection, UI state) must not issue
eager device ops — on tunnel-attached TPUs each eager dispatch compiles and
round-trips. These mirror math3d exactly (same reference conventions,
vector_math.cpp) but stay on the CPU; the jitted frame function receives the
results as plain arrays.
"""

from __future__ import annotations

import numpy as np


def look_at(eye, target, up_axis=(0.0, 1.0, 0.0)) -> np.ndarray:
    """View matrix (vector_math.cpp:231-245); +Z-forward."""
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    up_axis = np.asarray(up_axis, np.float32)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(up_axis, fwd)
    right = right / np.linalg.norm(right)
    up = np.cross(fwd, right)
    up = up / np.linalg.norm(up)
    m = np.eye(4, dtype=np.float32)
    m[0, :3], m[1, :3], m[2, :3] = right, up, fwd
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def perspective(fov_degrees, aspect, near, far) -> np.ndarray:
    """Reversed-Z Vulkan projection (vector_math.cpp:247-260)."""
    d = 1.0 / np.tan(np.radians(fov_degrees) * 0.5)
    f_sub_n = far - near
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = d / aspect
    m[1, 1] = -d
    m[2, 2] = -near / f_sub_n
    m[2, 3] = near * far / f_sub_n
    m[3, 2] = 1.0
    return m
