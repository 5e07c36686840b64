"""MeshScene — render any user-supplied OBJ or FBX file.

The "bring your own asset" path a reference user expects (the reference
imports arbitrary meshes through Assimp, main.cpp:216-283 / scene.cpp:57-86):
load the file, auto-frame a camera from its bounds, light it with the
ShaderBall three-light rig, shade PBR (or flat if the file bakes MTL
colors and has no UVs to speak of).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from bibim_tpu.scene.lights import LightType, make_lights
from bibim_tpu.scene.scene import SceneBase, SceneData, batch_from_mesh


def load_mesh_any(path: str):
    """OBJ or binary-FBX by extension."""
    p = Path(path)
    if p.suffix.lower() == ".obj":
        from bibim_tpu.assets.obj import load_obj

        return load_obj(p)
    if p.suffix.lower() == ".fbx":
        from bibim_tpu.assets.fbx import load_fbx_mesh

        return load_fbx_mesh(p)
    raise ValueError(f"unsupported mesh format: {p.suffix!r} (obj/fbx)")


@dataclass
class MeshScene(SceneBase):
    """One imported mesh, auto-framed. ``camera_hint`` gives (pos, look_at)
    for the host to aim the free-look camera."""

    path: str = ""
    scale: float = 1.0
    spin: bool = False
    angle: float = 0.0
    _batch: object = field(default=None, repr=False)
    _lights: object = field(default=None, repr=False)
    _bounds: tuple = field(default=None, repr=False)

    def __post_init__(self):
        mesh = load_mesh_any(self.path)
        lo = mesh.positions.min(axis=0)
        hi = mesh.positions.max(axis=0)
        center = (lo + hi) * 0.5
        radius = float(np.linalg.norm(hi - lo) * 0.5) or 1.0
        # Normalize into view: center at origin, radius ~1.5, pushed +Z.
        s = 1.5 / radius * self.scale
        self._norm_scale = s
        self._center = center
        self._batch = batch_from_mesh(mesh, self._model())
        self._bounds = (lo, hi)
        self._lights = make_lights(
            [
                dict(type=LightType.DIRECTIONAL, dir=(-0.3, -1.0, 0.5),
                     color=(1, 1, 1), intensity=2.5),
                dict(type=LightType.POINT, pos=(3, 3, 0), color=(1, 0.9, 0.8),
                     intensity=12.0),
                dict(type=LightType.POINT, pos=(-3, 2, 1),
                     color=(0.6, 0.7, 1.0), intensity=8.0),
            ]
        )

    def _model(self) -> np.ndarray:
        s = self._norm_scale
        a = np.radians(self.angle)
        c, sn = np.cos(a), np.sin(a)
        rot = np.array(
            [[c, 0, -sn, 0], [0, 1, 0, 0], [sn, 0, c, 0], [0, 0, 0, 1]],
            np.float32,
        )
        scale = np.diag([s, s, s, 1.0]).astype(np.float32)
        trans = np.eye(4, dtype=np.float32)
        trans[:3, 3] = -self._center
        place = np.eye(4, dtype=np.float32)
        place[2, 3] = 4.0  # push in front of the default camera (+Z look)
        return place @ rot @ scale @ trans

    def update_scene(self, dt: float) -> None:
        if self.spin:
            self.angle += 30.0 * dt
            model = self._model()[None]
            inv = np.linalg.inv(model.astype(np.float64)).astype(np.float32)
            self._batch = self._batch._replace(
                model=np.asarray(model, np.float32), inv_model=inv
            )

    def scene_data(self) -> SceneData:
        return SceneData(batches=(self._batch,), lights=self._lights)
