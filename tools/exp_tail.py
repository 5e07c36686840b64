"""Cumulative attribution of the production 1080p frame AFTER the fused
sampled-shade change: raster -> compact -> sampled-shade kernel ->
q16+tonemap -> scatter-back -> light spheres -> untile+gizmo+srgb+u8.

Run: python tools/exp_tail.py
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


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:52s} {(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:9.3f} ms",
          flush=True)


def scanned(fn):
    @jax.jit
    def run(*args):
        def body(carry, _):
            out = fn(*args, carry)
            leaves = jax.tree_util.tree_leaves(out)
            dep = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-30
            return dep.astype(jnp.float32).reshape(()), leaves[0].ravel()[:1]

        _, outs = lax.scan(body, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.ops.tonemap import srgb_encode, to_u8, tone_map
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, make_overlay_resources,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.pipeline.framegraph import (
        _q16, _sampled_hdr, _composite_light_spheres, _composite_gizmo,
        _untile,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    data = scene.scene_data()
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    mats = jax.device_put(material_quads_from_set(
        create_pbr_material_set(), scene.selected_material))
    overlay = make_overlay_resources()
    s, _ = autotune_settings(
        data, vb,
        RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                       overlay_candidates=256, overlay_max_tiles=384),
        margin=1.05,
    )

    def raster(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        return fused.raster_fused_pallas(
            rec, setup, WIDTH, HEIGHT, tile_h=s.tile_h, tile_w=s.tile_w,
            max_candidates=s.max_candidates, span_cap=s.span_cap,
            pair_budget=s.pair_budget, passes=s.raster_passes,
            raster_tile_cap=s.raster_tile_cap, span_mid_cap=s.span_mid_cap,
        )

    nt_full = s.tiles_x * s.tiles_y

    def stage(upto):
        def f(view_m, carry):
            px, zkey, diag = raster(view_m * (1 + carry * 0))
            if upto == "raster":
                return px, zkey
            live = jnp.any(px.tri_id >= 0, axis=1)
            ids, _ = fused._compact_tile_list(live, s.live_tile_cap)
            pxc = jax.tree_util.tree_map(lambda p: p[ids], px)
            if upto == "compact":
                return pxc, zkey
            hdr3 = _sampled_hdr(pxc, mats, data.lights, vb, s, None, True)
            if upto == "shade":
                return hdr3, zkey
            hdr3 = _q16(hdr3, s.quantize_fp16)
            ldr3 = tuple(tone_map(c, fp.enable_tone_mapping, fp.exposure)
                         for c in hdr3)
            if upto == "tonemap":
                return ldr3, zkey
            npx_c = ldr3[0].shape[1]
            ldr3 = tuple(
                jnp.zeros((nt_full, npx_c), c.dtype).at[ids].set(c)
                for c in ldr3)
            if upto == "scatter":
                return ldr3, zkey
            view_proj = m3.matmul(proj, view_m)
            ldr3, _ = _composite_light_spheres(ldr3, zkey, data.lights,
                                               overlay, view_proj, s)
            if upto == "overlay":
                return ldr3, zkey
            ldr3_img = tuple(_untile(c, s) for c in ldr3)
            ldr3_img, _ = _composite_gizmo(ldr3_img, view_m, proj, overlay,
                                           s)
            out3 = tuple(srgb_encode(c) for c in ldr3_img)
            return to_u8(jnp.stack(out3, axis=-1))

        return f

    for st in ("raster", "compact", "shade", "tonemap", "scatter",
               "overlay", "full"):
        timeit(f"... upto {st}", scanned(stage(st)), view)

    def prod(view_m, carry):
        fpc = FrameParams(fp.enable_tone_mapping, fp.exposure + carry)
        return render_frame(data, ViewBlock(view_m, proj, vb.view_pos,
                                            vb.enable_normal_map),
                            fpc, mats, overlay, s)["image"]

    timeit("render_frame production (control)", scanned(prod), view)


if __name__ == "__main__":
    main()
