"""Tangent-space generation (aiProcess_CalcTangentSpace analog).

Assimp computes per-corner tangents from triangle position/UV derivatives and
orthogonalizes against the vertex normal; the reference relies on this for
ShaderBall.fbx (scene.cpp:60-61) and the UV sphere does its own face-tangent
pass (render.cpp:1845-1861). Vectorized NumPy, one pass.
"""

from __future__ import annotations

import numpy as np


def compute_face_tangents(
    positions: np.ndarray, uvs: np.ndarray, indices: np.ndarray
) -> np.ndarray:
    """Per-triangle tangent from UV derivatives. (T,3)."""
    i0, i1, i2 = indices[:, 0], indices[:, 1], indices[:, 2]
    e1 = positions[i1] - positions[i0]
    e2 = positions[i2] - positions[i0]
    d1 = uvs[i1] - uvs[i0]
    d2 = uvs[i2] - uvs[i0]
    denom = d1[:, 0] * d2[:, 1] - d2[:, 0] * d1[:, 1]
    f = np.where(np.abs(denom) > 1e-20, 1.0 / np.where(denom == 0, 1, denom), 0.0)
    t = f[:, None] * (d2[:, 1:2] * e1 - d1[:, 1:2] * e2)
    return t.astype(np.float32)


def compute_corner_tangents(
    positions: np.ndarray,
    uvs: np.ndarray,
    normals: np.ndarray,
    indices: np.ndarray,
) -> np.ndarray:
    """Per-corner tangents: face tangent orthogonalized against the corner
    normal (Gram-Schmidt), normalized. Degenerate faces fall back to the
    reference default tangent (0,-1,0) (render.h:117)."""
    face_t = compute_face_tangents(positions, uvs, indices)  # (T,3)
    n_verts = positions.shape[0]
    corner_t = np.zeros((n_verts, 3), np.float32)
    flat = indices.reshape(-1)
    corner_t[flat] = np.repeat(face_t, 3, axis=0)  # de-indexed meshes: unique corners

    n = normals
    t = corner_t - n * np.sum(corner_t * n, axis=-1, keepdims=True)
    norm = np.linalg.norm(t, axis=-1, keepdims=True)
    ok = norm[:, 0] > 1e-12
    out = np.where(ok[:, None], t / np.where(norm == 0, 1, norm), np.float32([0, -1, 0]))
    return out.astype(np.float32)
