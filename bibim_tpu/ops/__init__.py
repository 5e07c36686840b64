"""Device-side render ops — the TPU analog of the reference's GPU programs.

Each module replaces a GLSL stage or fixed-function unit (src/shaders/*,
Vulkan rasterizer state in render.cpp createPipeline):

- :mod:`geometry`   — vertex transforms + triangle assembly (gbuffer.vert)
- :mod:`raster`     — tile-binned visibility-buffer rasterizer (the
  fixed-function rasterizer + reversed-Z GREATER_OR_EQUAL depth test)
- :mod:`interpolate`— perspective-correct attribute interpolation
- :mod:`texture`    — bilinear/mip texture sampling (uSamplers)
- :mod:`shading`    — Cook-Torrance GGX lighting (brdf.glsl / brdf.frag)
- :mod:`tonemap`    — exposure tone mapping (hdr_tone_mapping.frag)
- :mod:`lines`      — line-segment overlay rasterization (tbn.geom analog)
"""
