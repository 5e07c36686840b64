"""Scene layer: pytree scene data + camera/input interaction state.

Parity targets: src/scene.h / src/scene.cpp (SceneBase, TriangleScene,
ShaderBallScene), src/camera.* (FreeLookCamera), src/input.* (Input),
render.h uniform blocks (Light, InstanceBlock, View/FrameUniformBlock).
"""

from bibim_tpu.scene.lights import LightType, Lights, MAX_NUM_LIGHTS, make_lights
from bibim_tpu.scene.scene import DrawBatch, SceneData, RenderPassType, SceneBase
from bibim_tpu.scene.camera import FreeLookCamera
from bibim_tpu.scene.input import Input
from bibim_tpu.scene.triangle import TriangleScene
from bibim_tpu.scene.shaderball import ShaderBallScene

__all__ = [
    "LightType",
    "Lights",
    "MAX_NUM_LIGHTS",
    "make_lights",
    "DrawBatch",
    "SceneData",
    "RenderPassType",
    "SceneBase",
    "FreeLookCamera",
    "Input",
    "TriangleScene",
    "ShaderBallScene",
]
