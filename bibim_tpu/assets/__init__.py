"""Asset / resource layer.

Replaces the reference's Assimp + stb_image + Win32-thread loading stack
(src/resource.*, src/scene.cpp:57-86, src/main.cpp:216-283, render.cpp:1243-1336)
with pure-Python importers producing packed NumPy/JAX arrays, a PIL-based
image decoder with mip pyramids, and a concurrent material-set loader.
"""

from bibim_tpu.assets.meshgen import (
    generate_plane_mesh,
    generate_quad_mesh,
    generate_uv_sphere_mesh,
)
from bibim_tpu.assets.mesh import Mesh
from bibim_tpu.assets.obj import load_obj
from bibim_tpu.assets.fbx import load_fbx_mesh
from bibim_tpu.assets.image import load_image_rgba8, build_mip_pyramid
from bibim_tpu.assets.materials import (
    PBRMapType,
    PBRMaterial,
    PBRMaterialSet,
    create_pbr_material_set,
)

__all__ = [
    "Mesh",
    "generate_plane_mesh",
    "generate_quad_mesh",
    "generate_uv_sphere_mesh",
    "load_obj",
    "load_fbx_mesh",
    "load_image_rgba8",
    "build_mip_pyramid",
    "PBRMapType",
    "PBRMaterial",
    "PBRMaterialSet",
    "create_pbr_material_set",
]
