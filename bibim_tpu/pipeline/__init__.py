"""The jit-compiled frame function (reference recordCommand + render pass,
main.cpp:54-177 / :415-675)."""

from bibim_tpu.pipeline.framegraph import (
    FrameParams,
    GBufferViz,
    MaterialTextures,
    OverlayResources,
    RenderSettings,
    ViewBlock,
    material_textures_from_set,
    render_frame,
)

__all__ = [
    "FrameParams",
    "GBufferViz",
    "MaterialTextures",
    "OverlayResources",
    "RenderSettings",
    "ViewBlock",
    "material_textures_from_set",
    "render_frame",
]
