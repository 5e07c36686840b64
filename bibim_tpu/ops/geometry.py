"""Vertex stage: instance/view/projection transforms + triangle assembly.

Parity: gbuffer.vert / forward_brdf.vert — world = Model·p, clip =
Proj·View·world, world normal/tangent via transpose(mat3(InvModel)) — plus
the host-side index/instance flattening that Vulkan's input assembler did.

TPU mapping: all transforms are batched matmuls over (instances × vertices)
so they ride the MXU; triangle corner ids index the flattened vertex soup.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
from jax import lax

from bibim_tpu import math3d as m3
from bibim_tpu.scene.scene import DrawBatch

_HI = lax.Precision.HIGHEST


class TriangleSoup(NamedTuple):
    """Flattened, world/clip-space geometry for one frame."""

    clip: jnp.ndarray  # (N,4) clip-space positions
    world: jnp.ndarray  # (N,3) world-space positions
    normal: jnp.ndarray  # (N,3) world-space unit normals
    tangent: jnp.ndarray  # (N,3) world-space tangents (normal-matrix applied)
    uv: jnp.ndarray  # (N,2)
    color: jnp.ndarray  # (N,3) per-vertex flat color
    tris: jnp.ndarray  # (T,3) int32 corner ids into the N-arrays
    mat_id: jnp.ndarray  # (N,) int32 material index (per-draw binding analog)

    @property
    def num_triangles(self) -> int:
        return int(self.tris.shape[0])


class PlanarSoup(NamedTuple):
    """Corner-planar triangle soup: every channel is a tuple of three
    per-corner (T,) planes (corner index = position in the tuple).

    This is the triangle-rate twin of the pixel side's planar (NT, NPX)
    layout: (T, 3)-shaped arrays put the corner/channel axis in the
    128-lane minor dimension (3/128 lanes used — measured ~15 ms/stage at
    625k triangles), while (T,) planes are perfectly VPU-tiled. Built from
    host-precomputed corner planes (DrawBatch.corner_planes), so no
    strided de-interleave ever runs on device."""

    clip: tuple  # ((x0,x1,x2), (y...), (z...), (w...)) of (T,) planes
    world: tuple  # ((wx0..2), (wy..), (wz..))
    normal: tuple  # ((nx0..2), (ny..), (nz..))
    tangent: tuple
    uv: tuple  # ((u0..2), (v0..2))
    color: tuple  # ((r...), (g...), (b...))
    mat: jnp.ndarray  # (T,) f32 material id (corner-0 vertex)

    @property
    def num_triangles(self) -> int:
        return int(self.clip[0][0].shape[0])


def _apply_affine(rows, px, py, pz):
    """rows: (I, 4) matrix row (or (4,) scalars); p*: (F,) planes →
    (I, F) plane (w = 1 implicit)."""
    r = jnp.asarray(rows)
    if r.ndim == 1:
        return r[0] * px + r[1] * py + r[2] * pz + r[3]
    return (
        r[:, 0:1] * px[None, :] + r[:, 1:2] * py[None, :]
        + r[:, 2:3] * pz[None, :] + r[:, 3:4]
    )


def _transform_batch_planar_cat(batch: DrawBatch, view_proj: jnp.ndarray):
    """Corner-concatenated fast path of :func:`transform_batch_planar`.

    Identical per-element arithmetic (the three corners run through the
    SAME elementwise expressions, just concatenated into one (I, 3F)
    array — bit-exact vs the per-corner loop), but ~3× fewer XLA ops.
    The geometry stage is op-count-bound (~1.3 µs fixed cost per small
    dispatched op, tools/exp_bin.py), so op count IS the stage cost."""
    cp = batch.corner_planes
    num_i = batch.model.shape[0]
    pcat = cp["pos_cat"]
    num_f3 = pcat[0].shape[0]
    num_f = num_f3 // 3
    nmat = m3.normal_matrix(batch.inv_model)  # (I,3,3)

    px, py, pz = pcat
    w = tuple(
        _apply_affine(batch.model[:, r, :], px, py, pz) for r in range(3)
    )  # world x/y/z, each (I, 3F)
    clip = tuple(
        view_proj[m, 0] * w[0] + view_proj[m, 1] * w[1]
        + view_proj[m, 2] * w[2] + view_proj[m, 3]
        for m in range(4)
    )

    def rot(planes3):
        return tuple(
            nmat[:, r, 0:1] * planes3[0][None, :]
            + nmat[:, r, 1:2] * planes3[1][None, :]
            + nmat[:, r, 2:3] * planes3[2][None, :]
            for r in range(3)
        )

    def unit(v3):
        inv = jnp.reciprocal(jnp.maximum(jnp.sqrt(
            v3[0] * v3[0] + v3[1] * v3[1] + v3[2] * v3[2]
        ), 1e-20))
        return tuple(v3[k] * inv for k in range(3))

    normal = unit(rot(cp["normal_cat"]))
    tangent = unit(rot(cp["tangent_cat"]))

    def corner(x, c):  # (I, 3F) → corner c's flat (I*F,) plane
        return lax.slice_in_dim(x, c * num_f, (c + 1) * num_f,
                                axis=1).reshape(num_i * num_f)

    def flat(x):
        if x.ndim == 1:
            x = jnp.broadcast_to(x[None, :], (num_i, num_f))
        return x.reshape(num_i * num_f)

    def chan_cat(group):  # tuple of (I, 3F) → per-corner flat planes
        return tuple(
            tuple(corner(group[k], c) for c in range(3))
            for k in range(len(group))
        )

    return PlanarSoup(
        clip=chan_cat(clip),
        world=chan_cat(w),
        normal=chan_cat(normal),
        tangent=chan_cat(tangent),
        uv=tuple(
            tuple(flat(cp["uv"][k][c]) for c in range(3)) for k in range(2)
        ),
        color=tuple(
            tuple(flat(cp["color"][k][c]) for c in range(3)) for k in range(3)
        ),
        mat=jnp.zeros((num_i * num_f,), jnp.float32),
    )


def transform_batch_planar(batch: DrawBatch, view_proj: jnp.ndarray):
    """Corner-planar version of :func:`transform_batch`: same math
    (world = Model·p, clip = ViewProj·world, normal matrix on N/T +
    normalize), restated as dense (I, F) plane ops. Requires
    ``batch.corner_planes`` (built by batch_from_mesh)."""
    cp = batch.corner_planes
    if "pos_cat" in cp:
        return _transform_batch_planar_cat(batch, view_proj)
    num_i = batch.model.shape[0]
    num_f = cp["pos"][0][0].shape[0]
    nmat = m3.normal_matrix(batch.inv_model)  # (I,3,3)

    def flat(x):
        if x.ndim == 1:
            x = jnp.broadcast_to(x[None, :], (num_i, num_f))
        return x.reshape(num_i * num_f)

    clip_c, world_c, normal_c, tangent_c = [], [], [], []
    for c in range(3):
        px, py, pz = (cp["pos"][k][c] for k in range(3))
        w = tuple(
            _apply_affine(batch.model[:, r, :], px, py, pz) for r in range(3)
        )  # world x/y/z, each (I, F)
        clip_c.append(tuple(
            view_proj[m, 0] * w[0] + view_proj[m, 1] * w[1]
            + view_proj[m, 2] * w[2] + view_proj[m, 3]
            for m in range(4)
        ))
        world_c.append(w)

        def rot(planes3):
            return tuple(
                nmat[:, r, 0:1] * planes3[0][None, :]
                + nmat[:, r, 1:2] * planes3[1][None, :]
                + nmat[:, r, 2:3] * planes3[2][None, :]
                for r in range(3)
            )

        def unit(v3):
            inv = jnp.reciprocal(jnp.maximum(jnp.sqrt(
                v3[0] * v3[0] + v3[1] * v3[1] + v3[2] * v3[2]
            ), 1e-20))
            return tuple(v3[k] * inv for k in range(3))

        normal_c.append(unit(rot(tuple(cp["normal"][k][c] for k in range(3)))))
        tangent_c.append(unit(rot(tuple(cp["tangent"][k][c] for k in range(3)))))

    def chan(groups, k):
        # groups[c][k] → channel-major tuple of per-corner flat planes
        return tuple(flat(groups[c][k]) for c in range(3))

    return PlanarSoup(
        clip=tuple(chan(clip_c, m) for m in range(4)),
        world=tuple(chan(world_c, k) for k in range(3)),
        normal=tuple(chan(normal_c, k) for k in range(3)),
        tangent=tuple(chan(tangent_c, k) for k in range(3)),
        uv=tuple(
            tuple(flat(cp["uv"][k][c]) for c in range(3)) for k in range(2)
        ),
        color=tuple(
            tuple(flat(cp["color"][k][c]) for c in range(3)) for k in range(3)
        ),
        mat=jnp.zeros((num_i * num_f,), jnp.float32),
    )


def assemble_scene_planar(
    batches: Sequence[DrawBatch],
    view: jnp.ndarray,
    proj: jnp.ndarray,
    material_ids: Sequence[int] | None = None,
) -> PlanarSoup:
    """Corner-planar :func:`assemble_scene` (same draw-order semantics)."""
    view_proj = m3.matmul(proj, view)
    parts = [transform_batch_planar(b, view_proj) for b in batches]
    mats = []
    for bi, p in enumerate(parts):
        mid = 0.0 if material_ids is None else float(material_ids[bi])
        mats.append(jnp.full_like(p.mat, mid))

    def cat(field, k, c):
        return jnp.concatenate([getattr(p, field)[k][c] for p in parts])

    def chan(field, nk):
        return tuple(
            tuple(cat(field, k, c) for c in range(3)) for k in range(nk)
        )

    return PlanarSoup(
        clip=chan("clip", 4),
        world=chan("world", 3),
        normal=chan("normal", 3),
        tangent=chan("tangent", 3),
        uv=chan("uv", 2),
        color=chan("color", 3),
        mat=jnp.concatenate(mats),
    )


def planar_compat_clip(soup: PlanarSoup):
    """Materialize a legacy de-indexed (V=3T, 4) clip array + arange tris
    from corner planes — for the XLA fallback raster on CPU paths (the
    interleave relayout is cheap off-TPU)."""
    t = soup.clip[0][0].shape[0]
    clip = jnp.stack(
        [
            jnp.stack([soup.clip[k][c] for c in range(3)], axis=1).reshape(-1)
            for k in range(4)
        ],
        axis=-1,
    )
    tris = jnp.arange(3 * t, dtype=jnp.int32).reshape(-1, 3)
    return clip, tris


def transform_batch(batch: DrawBatch, view_proj: jnp.ndarray):
    """Transform one DrawBatch's V vertices by its I instances.

    Returns per-corner arrays flattened to (I*V, ...) plus (I*F, 3) indices.
    """
    num_i = batch.model.shape[0]
    num_v = batch.positions.shape[0]

    # world = Model · p  (gbuffer.vert:19) — (I,V,4)
    p4 = jnp.concatenate(
        [batch.positions, jnp.ones((num_v, 1), batch.positions.dtype)], axis=-1
    )
    world4 = jnp.einsum("vk,imk->ivm", p4, batch.model, precision=_HI)
    clip = jnp.einsum("ivk,mk->ivm", world4, view_proj, precision=_HI)

    # normalMat = transpose(mat3(InvModel)) (gbuffer.vert:24-27)
    nmat = m3.normal_matrix(batch.inv_model)  # (I,3,3)
    normal = jnp.einsum("vk,imk->ivm", batch.normals, nmat, precision=_HI)
    normal = m3.normalize_safe(normal)
    tangent = jnp.einsum("vk,imk->ivm", batch.tangents, nmat, precision=_HI)
    tangent = m3.normalize_safe(tangent)

    def flat(x):
        return x.reshape((num_i * num_v,) + x.shape[2:])

    tile2 = lambda a: jnp.broadcast_to(a[None], (num_i,) + a.shape).reshape(
        (num_i * a.shape[0],) + a.shape[1:]
    )

    offs = (jnp.arange(num_i, dtype=jnp.int32) * num_v)[:, None, None]
    tris = (batch.indices[None, :, :] + offs).reshape(-1, 3)

    return (
        flat(clip),
        flat(world4)[..., :3],
        flat(normal),
        flat(tangent),
        tile2(batch.uvs),
        tile2(batch.colors),
        tris,
    )


def assemble_scene(
    batches: Sequence[DrawBatch],
    view: jnp.ndarray,
    proj: jnp.ndarray,
    material_ids: Sequence[int] | None = None,
) -> TriangleSoup:
    """Transform and concatenate all draw batches into one triangle soup.

    Draw order is preserved (later batches win equal-depth ties, matching
    GPU submission order with GREATER_OR_EQUAL depth). ``material_ids``
    assigns each batch a material index — the per-draw material descriptor
    binding analog (scene.cpp:198-200); default all 0.
    """
    view_proj = m3.matmul(proj, view)
    parts = [transform_batch(b, view_proj) for b in batches]
    base = 0
    tris_all = []
    mat_all = []
    for bi, ((clip, _w, _n, _t, _uv, _c, tris), b) in enumerate(zip(parts, batches)):
        tris_all.append(tris + base)
        base += clip.shape[0]
        mid = 0 if material_ids is None else int(material_ids[bi])
        mat_all.append(jnp.full((clip.shape[0],), mid, jnp.int32))
    cat = lambda i: jnp.concatenate([p[i] for p in parts], axis=0)
    return TriangleSoup(
        clip=cat(0),
        world=cat(1),
        normal=cat(2),
        tangent=cat(3),
        uv=cat(4),
        color=cat(5),
        tris=jnp.concatenate(tris_all, axis=0),
        mat_id=jnp.concatenate(mat_all, axis=0),
    )
