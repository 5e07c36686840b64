"""bibim_tpu — a TPU-native physically-based renderer.

A from-scratch rebuild of the capabilities of chromedays/bibim-renderer
(a C++17 / Vulkan 1.2 deferred PBR renderer) as an idiomatic JAX / XLA /
Pallas framework for TPU hardware.

Layer map (mirrors SURVEY.md section 7):

- :mod:`bibim_tpu.math3d`    — vector/matrix conventions (reference src/vector_math.*)
- :mod:`bibim_tpu.utils`     — logging, timing, config, enum arrays (src/util.*, src/enum_array.h, src/resource.cpp)
- :mod:`bibim_tpu.assets`    — mesh importers (OBJ/FBX), image decode, procedural
  meshes, PBR material sets (src/resource.*, Assimp usage in src/scene.cpp / src/main.cpp)
- :mod:`bibim_tpu.scene`     — scene pytrees, lights, camera, input
  (src/scene.*, src/camera.*, src/input.*)
- :mod:`bibim_tpu.ops`       — the GPU-program layer: vertex transform, tile
  rasterizer, texture sampling, GGX shading, tone mapping (src/shaders/*)
- :mod:`bibim_tpu.pipeline`  — the jit-compiled frame function / frame graph
  (src/main.cpp recordCommand + render pass)
- :mod:`bibim_tpu.parallel`  — multi-chip framebuffer sharding over a device mesh
- :mod:`bibim_tpu.host`      — frame loop, double-buffered readback, PNG output,
  settings state (src/main.cpp frame loop, ImGui toggles)
- :mod:`bibim_tpu.testing`   — NumPy oracle rasterizer/shader for golden tests
"""

from bibim_tpu.version import __version__

__all__ = ["__version__"]
