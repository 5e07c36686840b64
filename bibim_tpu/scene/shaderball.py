"""ShaderBallScene (reference scene.cpp:12-211).

- 3 lights: warm directional + 2 point lights (scene.cpp:18-36).
- 100×-scaled ground plane at y=-10 (scene.cpp:49-51).
- ShaderBall.fbx de-indexed, N instances; per-frame model matrix
  ``translate(2i,-1,2) · rotY(angle) · rotX(-90) · scale(0.01)`` with inverse
  (scene.cpp:172-191); initial angle -90 (scene.h:207).
- GUI state: selected material (default 1, scene.h:213) + selected instance.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from bibim_tpu import math3d as m3
from bibim_tpu.assets.fbx import load_fbx_mesh
from bibim_tpu.assets.meshgen import generate_plane_mesh
from bibim_tpu.scene.lights import LightType, make_lights
from bibim_tpu.scene.scene import DrawBatch, SceneBase, SceneData, batch_from_mesh
from bibim_tpu.utils.config import get_resource_root


def shaderball_lights():
    d2r = np.pi / 180.0
    return make_lights(
        [
            dict(
                type=LightType.DIRECTIONAL,
                dir=(-1, -1, 0),
                color=(0.2347, 0.2131, 0.2079),
                intensity=10.0,
            ),
            dict(type=LightType.POINT, pos=(0, 2, 0), color=(1, 0.8, 0.8), intensity=50),
            dict(
                type=LightType.POINT,
                pos=(4, 2, 0),
                dir=(0, -1, 0),
                color=(0.8, 1, 0.8),
                intensity=50,
                inner_cutoff=30 * d2r,
                outer_cutoff=25 * d2r,
            ),
        ]
    )


def shaderball_instance_matrices(num_instances: int, angle_degrees):
    """Per-instance model matrices (scene.cpp:178-189), batched, host-side.

    Row i: translate(2i, -1, 2) · rotY(angle) · rotX(-90) · scale(0.01).
    Computed in numpy — the reference computes these on the CPU every frame
    and memcpys into a host-coherent buffer (scene.cpp:172-191); the analog
    here keeps per-frame scene updates off the device (no eager dispatches).
    """
    a = np.radians(float(angle_degrees))
    ca, sa = np.cos(a), np.sin(a)
    rot_y = np.array(
        [[ca, 0, -sa, 0], [0, 1, 0, 0], [sa, 0, ca, 0], [0, 0, 0, 1]], np.float64
    )
    rot_x_neg90 = np.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]], np.float64
    )
    rot = rot_y @ rot_x_neg90 * 0.01
    rot[3, 3] = 1.0
    model = np.tile(np.eye(4), (num_instances, 1, 1))
    model[:, :4, :4] = rot
    model[:, 0, 3] = 2.0 * np.arange(num_instances)
    model[:, 1, 3] = -1.0
    model[:, 2, 3] = 2.0
    inv = np.linalg.inv(model)
    return (
        jnp.asarray(model.astype(np.float32)),
        jnp.asarray(inv.astype(np.float32)),
    )


@dataclass
class ShaderBallScene(SceneBase):
    num_instances: int = 1
    selected_material_index: int = 1  # scene.h:213 GUI.SelectedMaterial = 1
    angle: float = -90.0  # scene.h:207
    spin: bool = False  # scene.cpp:175 has the 30°/s spin commented out
    # The ball (batch 0) is the interesting shadow caster; fitting the
    # light frustum's XY to it instead of the 100× ground plane gives the
    # shadow map ~70× more texels across the ball (the plane still
    # rasterizes into the map as an occluder/receiver).
    shadow_fit_batches = (0,)
    _plane: DrawBatch | None = field(default=None, repr=False)
    _ball: DrawBatch | None = field(default=None, repr=False)
    _lights: object = field(default=None, repr=False)

    def __post_init__(self):
        # translate(0,-10,0) · scale(100) (scene.cpp:49-51), host-side.
        plane_model = np.diag([100.0, 100.0, 100.0, 1.0]).astype(np.float32)
        plane_model[1, 3] = -10.0
        self._plane = batch_from_mesh(generate_plane_mesh(), plane_model)
        ball_mesh = load_fbx_mesh(get_resource_root().common("ShaderBall.fbx"))
        self._ball = batch_from_mesh(ball_mesh)
        self._lights = shaderball_lights()
        self.update_scene(0.0)

    def update_scene(self, dt: float) -> None:
        if self.spin:
            self.angle += 30.0 * dt
            if self.angle > 360.0:
                self.angle -= 360.0
        model, inv_model = shaderball_instance_matrices(self.num_instances, self.angle)
        self._ball = self._ball._replace(model=model, inv_model=inv_model)

    def scene_data(self) -> SceneData:
        # Draw order matters for equal-depth ties: ball first, then plane
        # (drawScene, scene.cpp:193-211).
        return SceneData(batches=(self._ball, self._plane), lights=self._lights)

    @property
    def selected_material(self) -> int:
        return self.selected_material_index
