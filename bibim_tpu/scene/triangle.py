"""TriangleScene (reference scene.h:135-184).

Three hardcoded vertices at z=5 with one dim blue-ish directional light,
identity instance, material[0].
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from bibim_tpu.assets.mesh import make_mesh
from bibim_tpu.scene.lights import LightType, make_lights
from bibim_tpu.scene.scene import SceneBase, SceneData, batch_from_mesh


@dataclass
class TriangleScene(SceneBase):
    _data: SceneData | None = field(default=None, repr=False)

    def __post_init__(self):
        # scene.h:149-152: positions + UVs only; Normal/Tangent take the
        # Vertex defaults (0,0,-1)/(0,-1,0) (render.h:116-117).
        mesh = make_mesh(
            positions=[(0, 1, 5), (1, -1, 5), (-1, -1, 5)],
            indices=[(0, 1, 2)],
            uvs=[(0.5, 1), (1, 0), (0, 0)],
            name="triangle",
        )
        lights = make_lights(
            [
                dict(
                    type=LightType.DIRECTIONAL,
                    dir=(-1, -1, 0),
                    color=(0.0347, 0.0131, 0.2079),
                    intensity=10.0,
                )
            ]
        )
        self._data = SceneData(batches=(batch_from_mesh(mesh),), lights=lights)

    def scene_data(self) -> SceneData:
        return self._data

    @property
    def selected_material(self) -> int:
        return 0  # scene.h:176: MaterialDescriptorSets[0]
