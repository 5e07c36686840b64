"""Packed mesh container.

The reference's vertex format is ``Vertex{Pos, UV, Normal, Tangent}``
(render.h:112-120) in interleaved buffers. On TPU we keep
structure-of-arrays NumPy buffers (one (N,k) array per attribute), which
XLA lays out efficiently and which feed the batched vertex-transform
matmuls directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Reference defaults (render.h:116-117): Normal=(0,0,-1), Tangent=(0,-1,0)
DEFAULT_NORMAL = (0.0, 0.0, -1.0)
DEFAULT_TANGENT = (0.0, -1.0, 0.0)


@dataclass
class Mesh:
    """Indexed triangle mesh with the standard vertex attributes.

    positions: (N,3) f32; uvs: (N,2) f32; normals/tangents: (N,3) f32;
    indices: (F,3) int32 triangle corner indices.
    """

    positions: np.ndarray
    uvs: np.ndarray
    normals: np.ndarray
    tangents: np.ndarray
    indices: np.ndarray
    colors: np.ndarray | None = None  # optional per-vertex color (GizmoVertex)
    name: str = ""

    @property
    def num_vertices(self) -> int:
        return int(self.positions.shape[0])

    @property
    def num_triangles(self) -> int:
        return int(self.indices.shape[0])

    def deindexed(self) -> "Mesh":
        """Flatten to one vertex record per triangle corner — the reference
        de-indexes ShaderBall.fbx this way (scene.cpp:63-79)."""
        idx = self.indices.reshape(-1)
        return Mesh(
            positions=self.positions[idx],
            uvs=self.uvs[idx],
            normals=self.normals[idx],
            tangents=self.tangents[idx],
            colors=None if self.colors is None else self.colors[idx],
            indices=np.arange(idx.size, dtype=np.int32).reshape(-1, 3),
            name=self.name,
        )


def make_mesh(
    positions,
    indices,
    uvs=None,
    normals=None,
    tangents=None,
    colors=None,
    name: str = "",
) -> Mesh:
    positions = np.asarray(positions, np.float32).reshape(-1, 3)
    n = positions.shape[0]
    indices = np.asarray(indices, np.int32).reshape(-1, 3)

    def _fill(arr, default, width):
        if arr is None:
            out = np.empty((n, width), np.float32)
            out[:] = default
            return out
        return np.asarray(arr, np.float32).reshape(n, width)

    return Mesh(
        positions=positions,
        uvs=_fill(uvs, (0.0, 0.0), 2),
        normals=_fill(normals, DEFAULT_NORMAL, 3),
        tangents=_fill(tangents, DEFAULT_TANGENT, 3),
        colors=None if colors is None else np.asarray(colors, np.float32).reshape(n, 3),
        indices=indices,
        name=name,
    )


def concat_meshes(meshes: list[Mesh], name: str = "") -> Mesh:
    """appendMesh analog (render.cpp:1728-1741): concatenates vertex arrays
    and rebases indices."""
    base = 0
    parts_idx = []
    for m in meshes:
        parts_idx.append(m.indices + base)
        base += m.num_vertices
    has_colors = all(m.colors is not None for m in meshes)
    return Mesh(
        positions=np.concatenate([m.positions for m in meshes]),
        uvs=np.concatenate([m.uvs for m in meshes]),
        normals=np.concatenate([m.normals for m in meshes]),
        tangents=np.concatenate([m.tangents for m in meshes]),
        colors=np.concatenate([m.colors for m in meshes]) if has_colors else None,
        indices=np.concatenate(parts_idx),
        name=name,
    )
