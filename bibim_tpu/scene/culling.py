"""Host-side instance frustum culling.

The reference recomputes every instance matrix on the CPU each frame
(scene.cpp:172-191); this is the same host pass doing one more standard
renderer job: dropping instances whose bounds cannot intersect the view
frustum before they reach the device. On TPU the win is structural —
triangle-rate stages (pair binning sort, record build) have STATIC
shapes, so off-screen instances cost full price unless the host trims
the instance list.

Static-shape discipline: the surviving count is padded up to a power-of-
two bucket with degenerate (all-zero) model matrices — every vertex of a
pad collapses to the projected world origin, so its triangles are
zero-area and fail the rasterizer's det > 0 front-face test — and a
moving camera only recompiles when the bucket changes (log2 many
specializations, like swapchain rebuilds on resize).

CAVEAT — shadows: culling uses the CAMERA frustum. An instance outside
the view can still cast a visible shadow; when rendering with
``enable_shadows``, either skip culling or cull against the union of the
camera frustum and the light's sweep of the visible volume. The bench
configs that cull render with shadows disabled.
"""

from __future__ import annotations

import numpy as np

from bibim_tpu.scene.scene import DrawBatch, SceneData


def _next_bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


_BOUNDS_CACHE: dict[int, tuple] = {}


def _local_bounds(batch: DrawBatch, pad: float):
    """Mesh-local AABB, cached per vertex buffer — computing it fresh
    would device->host transfer the whole vertex array every frame."""
    key = id(batch.positions)
    hit = _BOUNDS_CACHE.get(key)
    if hit is None:
        pos = np.asarray(batch.positions)
        hit = (pos.min(axis=0), pos.max(axis=0))
        if len(_BOUNDS_CACHE) > 256:
            _BOUNDS_CACHE.clear()
        _BOUNDS_CACHE[key] = hit
    return hit[0] - pad, hit[1] + pad


def visible_instances(batch: DrawBatch, view_proj: np.ndarray,
                      pad: float = 1e-3) -> np.ndarray:
    """(I,) bool — False only when the instance's transformed AABB is
    certainly outside the frustum (conservative plane rejection)."""
    lo, hi = _local_bounds(batch, pad)
    corners = np.stack(
        [
            np.where(np.arange(8) & 1, hi[0], lo[0]),
            np.where(np.arange(8) & 2, hi[1], lo[1]),
            np.where(np.arange(8) & 4, hi[2], lo[2]),
            np.ones(8),
        ],
        axis=-1,
    )  # (8, 4)
    model = np.asarray(batch.model)  # (I,4,4)
    world = np.einsum("ck,imk->icm", corners, model)  # (I,8,4)
    clip = world @ np.asarray(view_proj).T  # (I,8,4)
    x, y, z, w = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    out = (
        np.all(x > w, axis=1) | np.all(x < -w, axis=1)
        | np.all(y > w, axis=1) | np.all(y < -w, axis=1)
        | np.all(z > w, axis=1) | np.all(z < 0, axis=1)
        | np.all(w <= 0, axis=1)
    )
    return ~out


def cull_batch(batch: DrawBatch, view_proj: np.ndarray) -> DrawBatch:
    """Drop certainly-offscreen instances; pad survivors to a power-of-two
    bucket with degenerate matrices (static-shape recompile discipline)."""
    vis = visible_instances(batch, view_proj)
    n = int(vis.sum())
    if n == vis.shape[0]:
        return batch
    bucket = _next_bucket(max(n, 1))
    model = np.asarray(batch.model)
    inv = np.asarray(batch.inv_model)
    keep = np.flatnonzero(vis)
    new_model = np.zeros((bucket, 4, 4), np.float32)
    new_inv = np.zeros((bucket, 4, 4), np.float32)
    new_model[:n] = model[keep]
    new_inv[:n] = inv[keep]
    # Degenerate pads: a zero model collapses all vertices onto the
    # projected world origin → zero-area triangles fail det > 0; the
    # identity inverse keeps the normal matrix finite.
    new_inv[n:] = np.eye(4, dtype=np.float32)
    return batch._replace(model=new_model, inv_model=new_inv)


def cull_scene_instances(scene: SceneData, view: np.ndarray,
                         proj: np.ndarray) -> SceneData:
    """Frustum-cull every batch's instances for this frame's camera
    (host numpy; run per frame like the reference's instance update)."""
    vp = np.asarray(proj) @ np.asarray(view)
    return scene._replace(
        batches=tuple(cull_batch(b, vp) for b in scene.batches)
    )
