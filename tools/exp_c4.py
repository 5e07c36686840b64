"""Config-4 (64-instance) raster-settings sweep on the real TPU.
Run: python tools/exp_c4.py"""

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
        FrameParams, RenderSettings, ViewBlock,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene(num_instances=64)
    cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material)
    )
    vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()),
                   proj=m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0),
                   view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    data = scene.scene_data()
    from bibim_tpu.scene.culling import cull_scene_instances
    data = cull_scene_instances(
        data, np.asarray(cam.get_view_matrix()),
        np.asarray(m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)))
    print("instances after cull:",
          [b.model.shape[0] for b in data.batches], flush=True)
    print(f"device: {jax.devices()[0]}", flush=True)

    def run(tag, **kw):
        import dataclasses

        s = RenderSettings(width=WIDTH, height=HEIGHT, outputs="full",
                           show_gizmo=False, show_lights=False,
                           live_tile_cap=768, **kw)
        fn = functools.partial(render_frame, settings=s)
        try:
            out = fn(data, vb, fp, mats, None)
            d = out["bin_diag"]
            drops = tuple(int(x) for x in jax.device_get(
                (d.dropped_overflow, d.dropped_cap, d.dropped_pairs,
                 d.dropped_tiles)))
        except Exception as e:  # noqa: BLE001
            print(f"{tag:42s} FAILED: {str(e).splitlines()[0][:70]}",
                  flush=True)
            return
        np.asarray(jax.device_get(out["image"][0, 0]))
        s_img = dataclasses.replace(s, outputs="image")
        fn_i = functools.partial(render_frame, settings=s_img)
        out = fn_i(data, vb, fp, mats, None)
        np.asarray(jax.device_get(out["image"][0, 0]))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn_i(data, vb, fp, mats, None)
        np.asarray(jax.device_get(out["image"][0, 0]))
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{tag:42s} {dt:8.2f} ms  drops={drops}", flush=True)

    bench = dict(max_candidates=1024, raster_passes=3, span_cap=4,
                 raster_tile_cap=896, pair_budget=131072)
    run("bench (1024c x 3p span4 rcap896 pb128k)", **bench)
    run("2 passes", max_candidates=1024, raster_passes=2, span_cap=4,
        raster_tile_cap=896, pair_budget=131072)
    run("1 pass 2048c", max_candidates=2048, raster_passes=1, span_cap=4,
        raster_tile_cap=896, pair_budget=131072)
    run("1 pass 1024c", max_candidates=1024, raster_passes=1, span_cap=4,
        raster_tile_cap=896, pair_budget=131072)
    run("pb 65536", max_candidates=1024, raster_passes=3, span_cap=4,
        raster_tile_cap=896, pair_budget=65536)
    run("rcap 640", max_candidates=1024, raster_passes=3, span_cap=4,
        raster_tile_cap=640, pair_budget=131072)


if __name__ == "__main__":
    main()
