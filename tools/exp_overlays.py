"""Attribute the non-raster, non-sampling frame cost: overlays, outputs
mode, forward vs deferred. Run: python tools/exp_overlays.py"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 1920, 1080


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams,
        RenderSettings,
        ViewBlock,
        make_overlay_resources,
        material_quads_from_set,
        render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera(pos=np.zeros(3, np.float32))
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material)
    )
    overlay = make_overlay_resources()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    view_block = ViewBlock(view=view, proj=proj,
                           view_pos=jnp.asarray(cam.pos),
                           enable_normal_map=jnp.int32(0))
    frame_params = FrameParams(enable_tone_mapping=jnp.int32(1),
                               exposure=jnp.float32(1.0))
    data = scene.scene_data()
    print(f"device: {jax.devices()[0]}", flush=True)

    def run(tag, ov=overlay, **kw):
        settings = RenderSettings(width=WIDTH, height=HEIGHT,
                                  outputs="image", **kw)
        fn = functools.partial(render_frame, settings=settings)
        out = fn(data, view_block, frame_params, mats, ov)
        np.asarray(jax.device_get(out["image"][0, 0]))
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(data, view_block, frame_params, mats, ov)
        np.asarray(jax.device_get(out["image"][0, 0]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag:40s} {dt:8.2f} ms", flush=True)

    run("baseline (image outputs)")
    run("no light spheres", show_lights=False)
    run("no gizmo", show_gizmo=False)
    run("no overlays", ov=None)
    run("forward path", deferred=False)
    run("no srgb", srgb_output=False)
    run("flat shading (no sample/ggx)", shading="flat")


if __name__ == "__main__":
    main()
