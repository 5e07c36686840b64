"""Procedural meshes (reference render.cpp:1743-1863), vectorized in NumPy.

Semantics match the reference exactly: same vertex order, UVs, winding, and
the UV-sphere's per-face tangent recompute pass.
"""

from __future__ import annotations

import numpy as np

from bibim_tpu.assets.mesh import Mesh, make_mesh
from bibim_tpu.utils.log import bb_assert


def generate_plane_mesh() -> Mesh:
    """XZ unit plane, +Y normal, 2 triangles (render.cpp:1743-1757)."""
    positions = [(-0.5, 0, -0.5), (-0.5, 0, 0.5), (0.5, 0, 0.5), (0.5, 0, -0.5)]
    uvs = [(0, 0), (0, 1), (1, 1), (1, 0)]
    normals = [(0, 1, 0)] * 4
    tangents = [(1, 0, 0)] * 4
    indices = [(0, 1, 2), (2, 3, 0)]
    return make_mesh(positions, indices, uvs, normals, tangents, name="plane")


def generate_quad_mesh() -> Mesh:
    """XY unit quad, -Z normal (render.cpp:1759-1772)."""
    positions = [(-0.5, -0.5, 0), (-0.5, 0.5, 0), (0.5, 0.5, 0), (0.5, -0.5, 0)]
    uvs = [(0, 0), (0, 1), (1, 1), (1, 0)]
    normals = [(0, 0, -1)] * 4
    tangents = [(1, 0, 0)] * 4
    indices = [(0, 1, 2), (2, 3, 0)]
    return make_mesh(positions, indices, uvs, normals, tangents, name="quad")


def generate_cube_mesh(size: float = 1.0) -> Mesh:
    """Axis-aligned cube of edge length ``size`` with per-face UVs.

    Not in the reference (its meshes are plane/quad/sphere + imports); added
    for benchmark config 2 (textured cube, BASELINE.md). Faces wind clockwise
    in the y-down framebuffer when viewed from outside, matching the pipeline
    cull convention.
    """
    h = 0.5 * size
    faces = []
    # (normal, u-axis, v-axis) per face; vertices ordered so screen-space
    # winding is CW (front) viewed from outside.
    axes = [
        ((0, 0, -1), (1, 0, 0), (0, 1, 0)),  # front (-Z, toward default camera)
        ((0, 0, 1), (-1, 0, 0), (0, 1, 0)),  # back
        ((-1, 0, 0), (0, 0, -1), (0, 1, 0)),  # left
        ((1, 0, 0), (0, 0, 1), (0, 1, 0)),  # right
        ((0, 1, 0), (1, 0, 0), (0, 0, 1)),  # top
        ((0, -1, 0), (1, 0, 0), (0, 0, -1)),  # bottom
    ]
    for n, u, v in axes:
        n = np.asarray(n, np.float32)
        u_ax = np.asarray(u, np.float32)
        v_ax = np.asarray(v, np.float32)
        center = n * h
        corners = [
            center - u_ax * h - v_ax * h,
            center - u_ax * h + v_ax * h,
            center + u_ax * h + v_ax * h,
            center + u_ax * h - v_ax * h,
        ]
        uvs = [(0, 1), (0, 0), (1, 0), (1, 1)]
        faces.append(
            make_mesh(
                corners,
                [(0, 1, 2), (2, 3, 0)],
                uvs=uvs,
                normals=[n] * 4,
                tangents=[u_ax] * 4,
            )
        )
    from bibim_tpu.assets.mesh import concat_meshes

    return concat_meshes(faces, name="cube")


def generate_uv_sphere_mesh(
    radius: float, horizontal_division: int, vertical_division: int
) -> Mesh:
    """UV sphere (render.cpp:1774-1863).

    Grid of (V+1) rings × (H+1) columns; rows sweep theta from -pi/2 (bottom)
    to +pi/2 (top); spherical mapping x = r cosθ cosφ, y = r sinθ,
    z = r cosθ sinφ. Pole rings emit degenerate-skipping index patterns, and
    a final pass rewrites tangents per face from UV derivatives — both as in
    the reference.
    """
    H, V = horizontal_division, vertical_division
    bb_assert(H >= 3 and V >= 2, "sphere needs >=3 horizontal, >=2 vertical divisions")

    v_idx = np.arange(V + 1, dtype=np.float32)
    h_idx = np.arange(H + 1, dtype=np.float32)
    theta = -0.5 * np.pi + np.pi * (v_idx / V)  # (V+1,)
    phi = 2.0 * np.pi * (h_idx / H)  # (H+1,)

    cos_t = np.cos(theta)[:, None]
    pos = np.stack(
        [
            radius * cos_t * np.cos(phi)[None, :],
            np.broadcast_to(radius * np.sin(theta)[:, None], (V + 1, H + 1)),
            radius * cos_t * np.sin(phi)[None, :],
        ],
        axis=-1,
    ).reshape(-1, 3)

    uv = np.stack(
        np.broadcast_arrays(h_idx[None, :] / H, v_idx[:, None] / V), axis=-1
    ).reshape(-1, 2)

    normals = pos / np.linalg.norm(pos, axis=-1, keepdims=True)

    # Ring tangents (overwritten by the per-face pass below for every vertex
    # that belongs to a face — kept for parity with the reference's ordering).
    ring_rad = 2.0 * np.pi * (np.arange(H, dtype=np.float32) / H)
    pole_rad = 2.0 * np.pi * ((np.arange(H, dtype=np.float32) + 0.5) / H)

    def _tan(rads):
        t = np.stack([-np.sin(rads), np.zeros_like(rads), np.cos(rads)], axis=-1)
        return t / np.linalg.norm(t, axis=-1, keepdims=True)

    ring_t, pole_t = _tan(ring_rad), _tan(pole_rad)
    col = np.arange(H + 1) % H
    tangents = np.tile(ring_t[col], (V + 1, 1)).reshape(V + 1, H + 1, 3)
    tangents[0] = pole_t[col]
    tangents[V] = pole_t[col]
    tangents = tangents.reshape(-1, 3)

    # Index pattern (render.cpp:1829-1843)
    tris = []
    for v in range(V):
        base = (H + 1) * v + np.arange(H)
        if v < V - 1:
            tris.append(np.stack([base, base + H + 1, base + H + 2], axis=-1))
        if v > 0:
            tris.append(np.stack([base + H + 2, base + 1, base], axis=-1))
    indices = np.concatenate(tris).astype(np.int32)

    # Per-face tangent recompute from UV derivatives (render.cpp:1845-1861):
    # each corner's tangent is overwritten by its face's tangent; faces later
    # in the list win for shared vertices — replicate by sequential assignment
    # order using np "last write wins" via reversed unique trick: iterate in
    # order with direct fancy-index assignment is NOT last-write-deterministic
    # in NumPy, so do it with an explicit loop over faces in order.
    i0, i1, i2 = indices[:, 0], indices[:, 1], indices[:, 2]
    e0 = pos[i2] - pos[i0]
    e1 = pos[i1] - pos[i0]
    duv0 = uv[i2] - uv[i0]
    duv1 = uv[i1] - uv[i0]
    f = 1.0 / (duv0[:, 0] * duv1[:, 1] - duv1[:, 0] * duv0[:, 1])
    face_t = f[:, None] * (duv1[:, 1:2] * e0 - duv0[:, 1:2] * e1)
    # Last write wins per vertex: process corners in face order.
    flat_idx = indices.reshape(-1)
    flat_t = np.repeat(face_t, 3, axis=0)
    # np advanced assignment applies in order for duplicate indices when done
    # via np.put-along semantics? Not guaranteed — emulate with unique last
    # occurrence instead:
    last_occurrence = np.full(pos.shape[0], -1, dtype=np.int64)
    last_occurrence[flat_idx] = np.arange(flat_idx.size)  # last write per index wins here
    touched = last_occurrence >= 0
    tangents[touched] = flat_t[last_occurrence[touched]]

    return make_mesh(pos, indices, uv, normals, tangents, name="uv_sphere")
