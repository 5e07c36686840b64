"""CubeScene — benchmark config 2 (BASELINE.md): textured cubes with
uv_debug.png + texture.jpg, bilinear + mip-chain sampling, depth test.

Two unit cubes side by side, one per texture, over a point+directional light
pair so the depth test and both materials are exercised. Material 0 =
uv_debug.png albedo, material 1 = texture.jpg albedo; other maps neutral.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from bibim_tpu.assets.image import build_mip_pyramid, load_image_rgba8
from bibim_tpu.assets.meshgen import generate_cube_mesh
from bibim_tpu.scene.lights import LightType, make_lights
from bibim_tpu.scene.scene import SceneBase, SceneData, batch_from_mesh
from bibim_tpu.utils.config import get_resource_root


def _model(tx, ty, tz, angle_y_deg):
    a = np.radians(angle_y_deg)
    c, s = np.cos(a), np.sin(a)
    m = np.array(
        [[c, 0, -s, tx], [0, 1, 0, ty], [s, 0, c, tz], [0, 0, 0, 1]], np.float32
    )
    return m


@dataclass
class CubeScene(SceneBase):
    spin: bool = False
    angle: float = 25.0
    _cube_a: object = field(default=None, repr=False)
    _cube_b: object = field(default=None, repr=False)
    _lights: object = field(default=None, repr=False)

    def __post_init__(self):
        mesh = generate_cube_mesh(1.2)
        self._cube_a = batch_from_mesh(mesh, _model(-0.9, 0.0, 3.0, self.angle))
        self._cube_b = batch_from_mesh(mesh, _model(0.9, 0.0, 3.0, -self.angle))
        self._lights = make_lights(
            [
                dict(type=LightType.DIRECTIONAL, dir=(-0.5, -1, 0.5),
                     color=(1, 1, 1), intensity=3.0),
                dict(type=LightType.POINT, pos=(0, 2, 1), color=(1, 1, 1),
                     intensity=8.0),
            ]
        )

    def update_scene(self, dt: float) -> None:
        if self.spin:
            self.angle += 30.0 * dt
            self._cube_a = self._cube_a._replace(
                model=np.asarray(_model(-0.9, 0, 3.0, self.angle))[None]
            )

    def scene_data(self) -> SceneData:
        return SceneData(batches=(self._cube_a, self._cube_b), lights=self._lights)

    @property
    def material_ids(self) -> tuple[int, ...]:
        return (0, 1)


def cube_scene_materials(with_mips: bool = True, layout: str = "block"):
    """Materials for CubeScene: (uv_debug, texture.jpg) albedos.

    Returns a tuple usable as render_frame's ``materials`` — mip block
    tables when ``with_mips`` (one-gather trilinear + in-kernel 41-tap
    blend, the production path; ``layout="quad"`` keeps the paired
    mip-quad tables as the oracle form), MaterialTextures otherwise
    (level-0 bilinear, reference sampler parity)."""
    import jax.numpy as jnp

    from bibim_tpu.ops.texture_quad import (
        build_mip_block_tables, build_mip_quad_tables,
        merge_mip_block_materials, merge_mip_quad_materials,
    )
    from bibim_tpu.pipeline.framegraph import MaterialTextures

    build = (build_mip_block_tables if layout == "block"
             else build_mip_quad_tables)
    merge = (merge_mip_block_materials if layout == "block"
             else merge_mip_quad_materials)

    root = get_resource_root()
    uv_debug = load_image_rgba8(root.common("uv_debug.png"))
    photo = load_image_rgba8(root.common("texture.jpg"))

    def neutral(rgba):
        return np.tile(np.asarray(rgba, np.uint8), (4, 4, 1))

    n_metal = neutral((0, 0, 0, 255))
    n_rough = neutral((180, 180, 180, 255))
    n_ao = neutral((255, 255, 255, 255))
    n_norm = neutral((128, 128, 255, 255))
    n_height = neutral((0, 0, 0, 255))

    mats = []
    for albedo in (uv_debug, photo):
        if with_mips:
            alb_mips = build_mip_pyramid(albedo)
            mats.append(
                build({
                    "alb_r": [m[:, :, 0:1] for m in alb_mips],
                    "alb_g": [m[:, :, 1:2] for m in alb_mips],
                    "alb_b": [m[:, :, 2:3] for m in alb_mips],
                    "nrm_x": [n_norm[:, :, 0:1]],
                    "nrm_y": [n_norm[:, :, 1:2]],
                    "nrm_z": [n_norm[:, :, 2:3]],
                    "metallic": [n_metal],
                    "roughness": [n_rough],
                    "ao": [n_ao],
                    "height": [n_height],
                })
            )
        else:
            mats.append(
                MaterialTextures(
                    albedo=jnp.asarray(albedo),
                    metallic=jnp.asarray(n_metal),
                    roughness=jnp.asarray(n_rough),
                    ao=jnp.asarray(n_ao),
                    normal=jnp.asarray(n_norm),
                    height=jnp.asarray(n_height),
                )
            )
    if with_mips:
        return merge(tuple(mats))
    return tuple(mats)
