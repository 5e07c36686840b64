"""Cumulative attribution of the raster_resolve stage (round 2, post
corner-cat + group-batch + bitonic sort): geometry -> record table ->
binning -> pair-record gather -> full fused kernel. Each step keeps its
predecessors live (scan harness, full-output carry, rule 8).

Run: python tools/exp_chain.py
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
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    data = scene.scene_data()
    view_block = ViewBlock(view=view, proj=proj,
                           view_pos=jnp.asarray(cam.pos),
                           enable_normal_map=jnp.int32(0))
    s, probe = autotune_settings(
        data, view_block,
        RenderSettings(width=WIDTH, height=HEIGHT, outputs="image"),
        margin=1.05,
    )
    print("settings:", {k: getattr(s, k) for k in (
        "max_candidates", "raster_passes", "span_cap", "span_mid_cap",
        "pair_budget", "raster_tile_cap", "live_tile_cap")}, flush=True)

    def rec_of(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        return fused.build_record_table_planar(setup, psoup), setup

    maxc = ((s.max_candidates + 7) // 8) * 8

    def c1(view_m, carry):
        return rec_of(view_m * (1 + carry * 0))

    def c2(view_m, carry):
        rec, setup = rec_of(view_m * (1 + carry * 0))
        out = fused.bin_pairs(setup, WIDTH, HEIGHT, s.tile_h, s.tile_w,
                              s.span_cap, 64, maxc * s.raster_passes,
                              pair_budget=s.pair_budget,
                              span_mid_cap=s.span_mid_cap)
        return rec, out[:5]

    def c3(view_m, carry):
        rec, setup = rec_of(view_m * (1 + carry * 0))
        sorted_tri, starts, counts, big_ids, n_big, diag, ty, tx = (
            fused.bin_pairs(setup, WIDTH, HEIGHT, s.tile_h, s.tile_w,
                            s.span_cap, 64, maxc * s.raster_passes,
                            pair_budget=s.pair_budget,
                            span_mid_cap=s.span_mid_cap))
        pair_rec = rec[sorted_tri]
        return pair_rec, starts, counts, big_ids

    def c4(view_m, carry):
        rec, setup = rec_of(view_m * (1 + carry * 0))
        return fused.raster_fused_pallas(
            rec, setup, WIDTH, HEIGHT, tile_h=s.tile_h, tile_w=s.tile_w,
            max_candidates=s.max_candidates, span_cap=s.span_cap,
            pair_budget=s.pair_budget, passes=s.raster_passes,
            raster_tile_cap=s.raster_tile_cap,
            span_mid_cap=s.span_mid_cap,
        )

    timeit("1 geometry+setup+record", scanned(c1), view)
    timeit("2 ... + bin_pairs", scanned(c2), view)
    timeit("3 ... + pair-record gather", scanned(c3), view)
    timeit("4 ... + fused kernel (full raster stage)", scanned(c4), view)


if __name__ == "__main__":
    main()
