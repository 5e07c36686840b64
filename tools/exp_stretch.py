"""Attribute the 4K stretch config's frame cost (feature toggles).
Run: python tools/exp_stretch.py"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops.ibl import make_ibl
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock,
        make_overlay_resources, material_quads_from_set, render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    w, h = 3840, 2160
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material)
    )
    overlay = make_overlay_resources()
    ibl = jax.device_put(make_ibl())
    vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()),
                   proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
                   view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    data = scene.scene_data()
    print(f"device: {jax.devices()[0]}", flush=True)

    base = dict(width=w, height=h, outputs="image",
                enable_shadows=True, enable_ibl=True,
                span_cap=32, overflow_cap=256,
                max_candidates=320, raster_passes=2,
                shadow_passes=14, overlay_max_tiles=1024,
                live_tile_cap=4096, raster_tile_cap=4608)

    def run(tag, ov=overlay, use_ibl=True, **over):
        s = RenderSettings(**{**base, **over})
        fn = functools.partial(render_frame, settings=s)
        args = (data, vb, fp, mats, ov)
        kw = {"ibl": ibl} if use_ibl else {}
        out = fn(*args, **kw)
        np.asarray(jax.device_get(out["image"][0, 0]))
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*args, **kw)
        np.asarray(jax.device_get(out["image"][0, 0]))
        print(f"{tag:40s} {(time.perf_counter() - t0) / 5 * 1e3:8.2f} ms",
              flush=True)

    run("baseline (full stretch)")
    run("no shadows", enable_shadows=False)
    run("no ibl", enable_ibl=False, use_ibl=False)
    run("no overlays", ov=None, show_lights=False, show_gizmo=False)
    run("shadow_passes=4", shadow_passes=4)
    run("no shadows, no ibl", enable_shadows=False, enable_ibl=False,
        use_ibl=False)


if __name__ == "__main__":
    main()
