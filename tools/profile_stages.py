"""Per-stage timing of the 1080p ShaderBall frame on the real TPU.

Run on the bench device:  python tools/profile_stages.py [n_instances]

Round-2 methodology: every number is SUSTAINED on-device time — the
stage runs 8 times inside one jit (lax.scan) with a FULL-output
reduction chained through the carry (constant-input scans get CSE'd and
sliced outputs get DCE'd — tools/exp_harness.py is the control), so the
~2.5 ms tunnel dispatch RTT and dead-code artifacts are both excluded.
Capacities come from the same autotune probe production uses.
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

WIDTH, HEIGHT = 1920, 1080
SCAN_ITERS = 8


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, iters=4):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    ms = (time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3
    print(f"{name:48s} {ms:8.2f} ms", flush=True)
    return ms


def scan8(body):
    """body(carry) -> (full_reduction_carry, small_keep)."""

    @jax.jit
    def run():
        def step(carry, _):
            return body(carry)

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def dep_f(x):
    """Chain a full reduction of ``x`` into the next iteration."""
    return (jnp.sum(x.astype(jnp.float32)) * 1e-30).astype(jnp.float32)


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.ops.shading_pallas import shade_tonemap_pallas
    from bibim_tpu.pipeline import (
        FrameParams,
        RenderSettings,
        ViewBlock,
        make_overlay_resources,
        material_quads_from_set,
        render_frame,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    print(f"device: {jax.devices()[0]}, instances: {n_inst}", flush=True)
    scene = ShaderBallScene(num_instances=n_inst)
    cam = FreeLookCamera(
        pos=np.array([8.0, 6.0, -14.0], np.float32) if n_inst > 1
        else np.zeros(3, np.float32)
    )
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    view_block = ViewBlock(view=view, proj=proj,
                           view_pos=jnp.asarray(cam.pos),
                           enable_normal_map=jnp.int32(0))
    frame_params = FrameParams(enable_tone_mapping=jnp.int32(1),
                               exposure=jnp.float32(1.0))
    data = scene.scene_data()
    if n_inst > 1:
        data = cull_scene_instances(data, np.asarray(view), np.asarray(proj))
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material)
    )
    overlay = make_overlay_resources()
    settings, probe = autotune_settings(
        data, view_block,
        RenderSettings(width=WIDTH, height=HEIGHT, outputs="image"),
        margin=1.05,
    )
    print("probe:", probe, flush=True)
    print("derived:", {k: getattr(settings, k) for k in (
        "max_candidates", "raster_passes", "span_cap", "span_mid_cap",
        "overflow_cap", "pair_budget", "live_tile_cap",
        "raster_tile_cap")}, flush=True)

    def frame_body(carry):
        out = render_frame(
            data, view_block,
            FrameParams(frame_params.enable_tone_mapping,
                        frame_params.exposure + carry),
            mats, overlay, settings,
        )
        img = out["image"]
        return dep_f(img), img[:1, :1]

    full_ms = timeit("full render_frame (sustained)", scan8(frame_body))

    # Frame-removal attribution (round-5 correction): the standalone
    # stage scans BELOW are upper bounds — frozen-stream harnesses
    # inflate gather stages up to ~5x their in-frame cost
    # (docs/PERFORMANCE.md round-5; tools/exp_overlap.py --frame).
    # The honest in-frame numbers are full-frame deltas:
    maps = tq.pack_material_maps(create_pbr_material_set(),
                                 scene.selected_material)
    small_maps = {k: np.ascontiguousarray(
        img[::max(1, img.shape[0] // 32), ::max(1, img.shape[1] // 32)])
        for k, img in maps.items()}
    mats_small = jax.device_put(tq.build_quad_tables(small_maps))

    def removal_body(m, ov):
        def body(carry):
            out = render_frame(
                data, view_block,
                FrameParams(frame_params.enable_tone_mapping,
                            frame_params.exposure + carry),
                m, ov, settings,
            )
            img = out["image"]
            return dep_f(img), img[:1, :1]
        return body

    small_ms = timeit("  frame w/ 32^2 materials (no big gather)",
                      scan8(removal_body(mats_small, overlay)))
    noov_ms = timeit("  frame w/o overlays",
                     scan8(removal_body(mats, None)))
    print(f"{'  => in-frame material gather (delta)':48s} "
          f"{full_ms - small_ms:8.2f} ms", flush=True)
    print(f"{'  => in-frame overlays (delta)':48s} "
          f"{full_ms - noov_ms:8.2f} ms", flush=True)

    def geom(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        return rec, setup

    def geom_body(carry):
        rec, _ = geom(view + carry)
        return dep_f(rec), rec[:1, :1]

    timeit("geometry+setup+record", scan8(geom_body))

    rec, setup = jax.jit(geom)(view)

    def raster_body(carry):
        px, zkey, _ = fused.raster_fused_pallas(
            rec * (1.0 + carry), setup, WIDTH, HEIGHT,
            max_candidates=settings.max_candidates,
            span_cap=settings.span_cap,
            span_mid_cap=settings.span_mid_cap,
            overflow_cap=settings.overflow_cap,
            pair_budget=settings.pair_budget,
            raster_tile_cap=settings.raster_tile_cap,
            passes=settings.raster_passes,
        )
        return dep_f(px.depth), px.depth[:1, :1]

    timeit("bin+sort+gather+kernel (raster)", scan8(raster_body))

    live_cap = settings.live_tile_cap or (settings.tiles_x
                                          * settings.tiles_y)

    @jax.jit
    def compact(rec, setup):
        px, _, _ = fused.raster_fused_pallas(
            rec, setup, WIDTH, HEIGHT,
            max_candidates=settings.max_candidates,
            span_cap=settings.span_cap,
            span_mid_cap=settings.span_mid_cap,
            overflow_cap=settings.overflow_cap,
            pair_budget=settings.pair_budget,
            raster_tile_cap=settings.raster_tile_cap,
            passes=settings.raster_passes,
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, live_cap)
        return jax.tree_util.tree_map(lambda p: p[ids], px)

    px_c = compact(rec, setup)
    print(f"compact slots: {px_c.uv[0].shape}", flush=True)

    def sample_body(carry):
        out = tq.sample_material(mats, px_c.uv[0] + carry, px_c.uv[1],
                                 settings.tile_h, settings.tile_w)
        dep = sum(dep_f(v) for v in out.values()).astype(jnp.float32)
        return dep, out["roughness"][:1, :1]

    timeit("material sample (compact)", scan8(sample_body))

    valid = px_c.tri_id >= 0

    def shade_body(carry):
        ldr = shade_tonemap_pallas(
            px_c.world, px_c.normal, px_c.color,
            px_c.uv[0] * 0, px_c.uv[0] * 0 + 0.5 + carry,
            px_c.uv[0] * 0 + 1, valid, data.lights, view_block.view_pos,
            jnp.int32(0), jnp.float32(1.0), quantize=False, tonemap=False,
        )
        return sum(dep_f(c) for c in ldr).astype(jnp.float32), \
            ldr[0][:1, :1]

    timeit("fused GGX shade (compact)", scan8(shade_body))


if __name__ == "__main__":
    main()
