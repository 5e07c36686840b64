"""Scene data model: pytrees feeding the jitted frame function.

Parity: SceneBase + CommonSceneResources (scene.h:64-133) and the per-draw
vertex/instance buffer layout (render.h:96-136). A scene is

- a tuple of :class:`DrawBatch` pytrees (vertex SoA + instance matrices),
- a :class:`Lights` SoA,
- static metadata (render pass type, material selection) that shapes the
  compiled frame function.

Vulkan buffer objects collapse into device arrays: ``createVertexBuffer`` /
``createInstanceBuffer`` / ``updateInstanceBufferMemory`` (scene.h:87-132)
become `jnp.asarray` + functional updates of the scene pytree.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from bibim_tpu import math3d as m3
from bibim_tpu.assets.mesh import Mesh
from bibim_tpu.scene.lights import Lights, make_lights


class RenderPassType(IntEnum):
    FORWARD = 0
    DEFERRED = 1  # default (scene.h:77)


class DrawBatch(NamedTuple):
    """One draw call: shared mesh + I instances (render.h:96-136).

    Vertex attributes are SoA; instances carry ModelMat + InvModelMat like
    InstanceBlock (render.h:96-99). ``colors`` holds per-vertex flat colors
    (GizmoVertex, render.h:122-129); all-ones when unused.
    """

    positions: jnp.ndarray  # (V,3)
    uvs: jnp.ndarray  # (V,2)
    normals: jnp.ndarray  # (V,3)
    tangents: jnp.ndarray  # (V,3)
    colors: jnp.ndarray  # (V,3)
    indices: jnp.ndarray  # (F,3) int32
    model: jnp.ndarray  # (I,4,4)
    inv_model: jnp.ndarray  # (I,4,4)
    # Corner-planar twin of the vertex SoA for de-indexed meshes: channel →
    # per-channel tuple of three per-corner (F,) planes, de-interleaved on
    # the host (free) so the device-side triangle pipeline runs on dense
    # (T,) planes (see ops.geometry.PlanarSoup). None for hand-built
    # shared-vertex batches (they use the legacy (T,3) path).
    corner_planes: dict | None = None


def batch_from_mesh(mesh: Mesh, model: np.ndarray | None = None) -> DrawBatch:
    """Build a DrawBatch from a Mesh with I instance matrices ((I,4,4) or
    a single (4,4), default identity).

    The mesh is de-indexed host-side (vertices duplicated per corner,
    indices become an arange), mirroring the reference's own ShaderBall
    flattening (scene.cpp:63-79). This makes the whole scene's triangle
    list a global arange, so the per-frame corner fetches in
    triangle_setup / build_record_table are free reshapes instead of
    row gathers (~8 ns each on TPU — 30+ ms/frame for instanced scenes).
    """
    if model is None:
        model = np.eye(4, dtype=np.float32)[None]
    model = np.asarray(model, np.float32)
    if model.ndim == 2:
        model = model[None]
    # Host-side inverse (numpy): scene construction must not issue eager
    # device ops — on remote-attached TPUs each eager dispatch is costly.
    inv_model = np.linalg.inv(model.astype(np.float64)).astype(np.float32)
    colors = mesh.colors if mesh.colors is not None else np.ones_like(mesh.positions)

    flat = np.asarray(mesh.indices, np.int64).reshape(-1)

    def deindex(arr):
        return np.ascontiguousarray(np.asarray(arr)[flat])

    n_corners = flat.shape[0]

    def planes(arr, nk):
        # (V=3F, k) de-indexed array → channel-major ((c0,c1,c2) per
        # channel) of (F,) planes; numpy slicing = free.
        a = np.asarray(arr, np.float32)
        return tuple(
            tuple(jnp.asarray(np.ascontiguousarray(a[c::3, k]))
                  for c in range(3))
            for k in range(nk)
        )

    def planes_cat(arr, nk):
        # Channel-major (3F,) planes with the three corners concatenated.
        a = np.asarray(arr, np.float32)
        return tuple(
            jnp.asarray(np.concatenate([
                np.ascontiguousarray(a[c::3, k]) for c in range(3)
            ]))
            for k in range(nk)
        )

    d_pos = deindex(mesh.positions)
    d_uv = deindex(mesh.uvs)
    d_nrm = deindex(mesh.normals)
    d_tan = deindex(mesh.tangents)
    d_col = deindex(colors)
    return DrawBatch(
        positions=jnp.asarray(d_pos),
        uvs=jnp.asarray(d_uv),
        normals=jnp.asarray(d_nrm),
        tangents=jnp.asarray(d_tan),
        colors=jnp.asarray(d_col),
        indices=jnp.asarray(
            np.arange(n_corners, dtype=np.int32).reshape(-1, 3)
        ),
        model=jnp.asarray(model),
        inv_model=jnp.asarray(inv_model),
        corner_planes={
            "pos": planes(d_pos, 3),
            "uv": planes(d_uv, 2),
            "normal": planes(d_nrm, 3),
            "tangent": planes(d_tan, 3),
            "color": planes(d_col, 3),
            # Corner-CONCATENATED planes ([corner0 | corner1 | corner2],
            # (3F,) per channel): the per-frame transform chain runs ONCE
            # over all three corners instead of three times — identical
            # per-element expressions (bit-exact), ~3× fewer XLA ops (the
            # geometry stage is op-count-bound, not FLOP-bound:
            # tools/exp_bin.py measured assemble at 0.95 ms of ~1.3 µs
            # fixed cost per small op).
            "pos_cat": planes_cat(d_pos, 3),
            "normal_cat": planes_cat(d_nrm, 3),
            "tangent_cat": planes_cat(d_tan, 3),
        },
    )


class SceneData(NamedTuple):
    """The traced per-frame scene state."""

    batches: tuple[DrawBatch, ...]
    lights: Lights


@dataclass
class SceneBase:
    """Host-side scene controller (SceneBase, scene.h:75-84).

    ``update_gui`` mutates host settings, ``update_scene`` recomputes traced
    state (instance matrices — the updateInstanceBufferMemory analog), and
    ``scene_data`` packages the pytree for the frame function.
    """

    scene_render_pass_type: RenderPassType = RenderPassType.DEFERRED

    def update_gui(self, dt: float) -> None:  # pragma: no cover - interactive
        pass

    def update_scene(self, dt: float) -> None:
        pass

    def scene_data(self) -> SceneData:
        raise NotImplementedError

    @property
    def selected_material(self) -> int:
        return 0
