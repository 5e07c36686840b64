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
