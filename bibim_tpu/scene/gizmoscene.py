"""GizmoScene — benchmark config 1 (BASELINE.md): gizmo.obj as the main
mesh, flat/Lambert shading, fixed camera.

Mirrors the reference gizmo viewport setup (gizmo.vert:12-27): camera 27
units back along +Z, 30° fov — but as a full-frame scene.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from bibim_tpu.assets.obj import load_obj
from bibim_tpu.scene.lights import make_lights
from bibim_tpu.scene.scene import SceneBase, SceneData, batch_from_mesh
from bibim_tpu.utils.config import get_resource_root

GIZMO_CAMERA_DISTANCE = 27.0
GIZMO_FOV_DEGREES = 30.0


@dataclass
class GizmoScene(SceneBase):
    _data: SceneData | None = field(default=None, repr=False)

    def __post_init__(self):
        mesh = load_obj(get_resource_root().common("gizmo.obj"))
        self._data = SceneData(
            batches=(batch_from_mesh(mesh),), lights=make_lights([])
        )

    def scene_data(self) -> SceneData:
        return self._data
