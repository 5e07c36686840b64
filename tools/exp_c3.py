"""Headline (config-3) settings micro-sweep around the bench defaults.
Run: python tools/exp_c3.py"""

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
        make_overlay_resources, material_quads_from_set, render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material)
    )
    overlay = make_overlay_resources()
    vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()),
                   proj=m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0),
                   view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    data = scene.scene_data()
    print(f"device: {jax.devices()[0]}", flush=True)

    def run(tag, **kw):
        import dataclasses

        base = dict(width=WIDTH, height=HEIGHT, outputs="image",
                    live_tile_cap=896, raster_tile_cap=1024)
        s = RenderSettings(**{**base, **kw})
        fn = functools.partial(render_frame, settings=s)
        sv = dataclasses.replace(s, outputs="full")
        out = render_frame(data, vb, fp, mats, overlay, sv)
        d = out["bin_diag"]
        drops = tuple(int(x) for x in jax.device_get(
            (d.dropped_overflow, d.dropped_cap, d.dropped_pairs,
             d.dropped_tiles)))
        out = fn(data, vb, fp, mats, overlay)
        np.asarray(jax.device_get(out["image"][0, 0]))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(data, vb, fp, mats, overlay)
        np.asarray(jax.device_get(out["image"][0, 0]))
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{tag:44s} {dt:8.2f} ms  drops={drops}", flush=True)

    run("bench (live896 rcap1024)")
    run("live 1024", live_tile_cap=1024)
    run("rcap 1152", raster_tile_cap=1152)
    run("overlay cands 256", overlay_candidates=256)
    run("span8 oc128", span_cap=8, overflow_cap=128)
    run("pair_budget 163840", pair_budget=163840)
    run("overlay tiles 384", overlay_max_tiles=384)


if __name__ == "__main__":
    main()
