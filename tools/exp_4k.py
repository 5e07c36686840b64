"""Config-5 (4K + shadows + IBL) stage decomposition, scan-amortized.

BENCH r2 has the 4K stretch at ~92 ms. Attribute it: main raster,
coverage-compacted sampling, shadow-map build, fused shade+IBL, and the
image-space tail (untile + overlays + sRGB encode), plus a lax.top_k
scaling probe (the span-class binning idea needs top_k over the
triangle axis).

Run: python tools/exp_4k.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

W, H = 3840, 2160
SCAN_ITERS = 4


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3
    print(f"{name:52s} {dt:9.3f} ms", flush=True)
    return out


def scan_n(body):
    @jax.jit
    def run():
        def step(carry, _):
            return body(carry)

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.ibl import make_ibl
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, make_overlay_resources,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.pipeline.framegraph import (
        _shadow_map_planar, _use_planar,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    data = scene.scene_data()
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material))
    ibl = jax.device_put(make_ibl())
    overlay = make_overlay_resources()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, W / H, 0.1, 1000.0)
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    base = RenderSettings(width=W, height=H, outputs="image",
                          enable_shadows=True, enable_ibl=True,
                          span_cap=32, shadow_candidates=2048,
                          shadow_passes=3, overlay_max_tiles=1024)
    settings, probe = autotune_settings(data, vb, base, margin=1.05)
    print("probe:", probe, flush=True)
    print("derived:", {k: getattr(settings, k) for k in (
        "max_candidates", "raster_passes", "span_cap", "overflow_cap",
        "pair_budget", "live_tile_cap", "raster_tile_cap")}, flush=True)

    def frame_body(carry):
        out = render_frame(data, vb,
                           FrameParams(fp.enable_tone_mapping,
                                       fp.exposure + carry),
                           mats, overlay, settings, ibl=ibl)
        img = out["image"]
        return jnp.sum(img[:1, :1]).astype(jnp.float32) * 1e-30, img[:1, :1]

    timeit("full 4K frame (scan-honest)", scan_n(frame_body))

    live_cap = settings.live_tile_cap or (settings.tiles_x
                                          * settings.tiles_y)

    def raster(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, W, H)
        rec = fused.build_record_table_planar(setup, psoup)
        px, zkey, diag = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=settings.max_candidates,
            span_cap=settings.span_cap, overflow_cap=settings.overflow_cap,
            pair_budget=settings.pair_budget,
            raster_tile_cap=settings.raster_tile_cap,
            passes=settings.raster_passes,
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, live_cap)
        return jax.tree_util.tree_map(lambda p: p[ids], px), psoup

    def raster_body(carry):
        px, _ = raster(view + carry)
        return jnp.sum(px.depth[:1, :1]) * 1e-30, px.depth[:1, :1]

    timeit("geom+raster+compact (4K)", scan_n(raster_body))

    px, psoup = jax.jit(raster)(view)
    print(f"compact slots: {px.uv[0].shape}", flush=True)

    def sample_body(carry):
        out = tq.sample_material(mats, px.uv[0] + carry, px.uv[1], 8, 128)
        leaf = out["roughness"]
        return jnp.sum(leaf[:1, :1]) * 1e-30, leaf[:1, :1]

    timeit("material sample (compact 4K)", scan_n(sample_body))

    def shadow_body(carry):
        ps = jax.tree_util.tree_map(
            lambda x: x, psoup
        )
        smap, _ = _shadow_map_planar(psoup, data.lights, settings)
        return (jnp.sum(smap.quads[:1, :1]) * 1e-30 + carry * 0,
                smap.quads[:1, :1])

    timeit("shadow map build (1024²)", scan_n(shadow_body))

    # top_k scaling probe for span-class binning
    for t, k in ((16384, 2048), (157696, 8192), (630784, 16384)):
        keys = jnp.asarray(
            (np.random.default_rng(0).integers(0, 1 << 30, t)
             ).astype(np.int32))

        def topk_body(carry, keys=keys, k=k):
            got, _ = lax.top_k(keys + jnp.minimum(carry.astype(jnp.int32),
                                                  0), k)
            return jnp.sum(got[:1]).astype(jnp.float32) * 1e-30, got[:1]

        timeit(f"lax.top_k T={t//1024}k k={k//1024}k", scan_n(topk_body))


if __name__ == "__main__":
    main()
