"""The jit-compiled frame function (reference recordCommand + render pass,
main.cpp:54-177 / :415-675)."""

from bibim_tpu.pipeline.framegraph import (
    FrameParams,
    GBufferViz,
    MaterialMips,
    MaterialTextures,
    OverlayResources,
    RenderSettings,
    ViewBlock,
    make_overlay_resources,
    material_mips_from_set,
    material_quads_from_set,
    material_textures_from_set,
    render_frame,
)

__all__ = [
    "FrameParams",
    "GBufferViz",
    "MaterialMips",
    "MaterialTextures",
    "OverlayResources",
    "RenderSettings",
    "ViewBlock",
    "make_overlay_resources",
    "material_mips_from_set",
    "material_quads_from_set",
    "material_textures_from_set",
    "render_frame",
]
