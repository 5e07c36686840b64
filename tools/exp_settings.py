"""Settings-sweep experiments on the real 1080p ShaderBall frame (TPU).

Usage: python tools/exp_settings.py  [then read the table]

Sweeps raster capacity knobs whose costs are static-shape-driven:
  * max_candidates x raster_passes (resolve matmul K = oc + maxc)
  * span_cap (binning sort length = T x span_cap)
Reports full-frame ms and the BinDiag drop counters for each point
(honest capacity accounting: a faster setting that drops geometry loses).
"""

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

    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    scene = ShaderBallScene(num_instances=n_inst)
    cam = FreeLookCamera(
        pos=np.array([8.0, 6.0, -14.0], np.float32) if n_inst > 1
        else np.zeros(3, np.float32)
    )
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
    print(f"device: {jax.devices()[0]} instances={n_inst}", flush=True)

    def run(tag, **kw):
        settings = RenderSettings(width=WIDTH, height=HEIGHT,
                                  outputs="full", **kw)
        fn = functools.partial(render_frame, settings=settings)
        try:
            out = fn(data, view_block, frame_params, mats, overlay)
            d = out["bin_diag"]
            drops = tuple(
                int(x) for x in jax.device_get(
                    (d.dropped_overflow, d.dropped_cap, d.dropped_pairs))
            )
        except Exception as e:  # noqa: BLE001
            print(f"{tag:44s} FAILED: {str(e).splitlines()[0][:80]}",
                  flush=True)
            return
        np.asarray(jax.device_get(out["image"][0, 0]))
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(data, view_block, frame_params, mats, overlay)
        np.asarray(jax.device_get(out["image"][0, 0]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag:44s} {dt:8.2f} ms  drops={drops}", flush=True)

    base = dict(max_candidates=320 if n_inst == 1 else 1024,
                span_cap=16 if n_inst == 1 else 8)
    run("baseline (320c x 1p, span16)", **base)
    run("maxc=128 passes=3", max_candidates=128, raster_passes=3,
        span_cap=base["span_cap"])
    run("maxc=128 passes=2", max_candidates=128, raster_passes=2,
        span_cap=base["span_cap"])
    run("maxc=64  passes=4", max_candidates=64, raster_passes=4,
        span_cap=base["span_cap"])
    run("maxc=64  passes=2", max_candidates=64, raster_passes=2,
        span_cap=base["span_cap"])
    run("span_cap=8", max_candidates=base["max_candidates"], span_cap=8)
    run("span_cap=4", max_candidates=base["max_candidates"], span_cap=4)
    run("maxc=128 passes=2 span4", max_candidates=128, raster_passes=2,
        span_cap=4)
    run("overlay_cands=64", overlay_candidates=64, **base)
    run("maxc=64 passes=2 span4 ovl64", max_candidates=64,
        raster_passes=2, span_cap=4, overlay_candidates=64)
    run("tile_h=16", tile_h=16, **base)
    run("tile_h=32", tile_h=32, **base)
    run("tile_h=16 maxc=512", tile_h=16, max_candidates=512,
        span_cap=base["span_cap"])
    run("tile_h=32 maxc=1024 span8", tile_h=32, max_candidates=1024,
        span_cap=8)


if __name__ == "__main__":
    main()
