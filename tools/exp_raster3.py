"""Attribute the 3.6 ms raster stage: binning vs kernel, and the kernel's
sensitivity to the resolve row count (oc+maxc).

The autotuned max_candidates=320 is sized by the DENSEST tile (probe max
266) while the average bin-live tile has ~16 candidates — every tile
pays a (384, 64)x(384, NPX) 3-way bf16-split resolve. If the kernel
time scales strongly with maxc, a two-class density split (most tiles
at maxc=64, the few dense tiles at 320) is the next headline lever.

Run: python tools/exp_raster3.py
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
    return out


def scanned(fn):
    @jax.jit
    def run(rec, setup):
        def body(carry, _):
            out = fn(rec * (1.0 + carry), setup)
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
    settings, probe = autotune_settings(
        data, view_block,
        RenderSettings(width=WIDTH, height=HEIGHT, outputs="image"),
        margin=1.05,
    )
    print("probe:", probe, flush=True)

    @jax.jit
    def geom(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        return rec, setup

    rec, setup = geom(view)

    def bin_only(rec_in, setup_in):
        out = fused.bin_pairs(
            setup_in, WIDTH, HEIGHT, settings.tile_h, settings.tile_w,
            settings.span_cap, 64,
            settings.max_candidates,
            pair_budget=settings.pair_budget,
            span_mid_cap=settings.span_mid_cap,
        )
        # keep the (rec * ...) carry dependency alive through a cheap use
        return out[:5] + (rec_in[:1, :1],)

    timeit("bin_pairs only (sort binning)", scanned(bin_only), rec, setup)

    def raster(maxc, tile_cap, passes=1):
        def fn(rec_in, setup_in):
            px, zkey, diag = fused.raster_fused_pallas(
                rec_in, setup_in, WIDTH, HEIGHT,
                max_candidates=maxc,
                span_cap=settings.span_cap,
                span_mid_cap=settings.span_mid_cap,
                overflow_cap=settings.overflow_cap,
                pair_budget=settings.pair_budget,
                raster_tile_cap=tile_cap,
                passes=passes,
            )
            return px.depth, px.uv[0], zkey, diag.dropped_cap
        return fn

    mc = settings.max_candidates
    cap = settings.raster_tile_cap
    timeit(f"raster maxc={mc} cap={cap} (production)",
           scanned(raster(mc, cap)), rec, setup)
    timeit("raster maxc=128 (timing probe; drops dense tiles)",
           scanned(raster(128, cap)), rec, setup)
    timeit("raster maxc=64  (timing probe; drops dense tiles)",
           scanned(raster(64, cap)), rec, setup)
    timeit("raster maxc=64 passes=2 (window chain)",
           scanned(raster(64, cap, passes=2)), rec, setup)

    # How many tiles would the dense class hold?
    out = fused.bin_pairs(
        setup, WIDTH, HEIGHT, settings.tile_h, settings.tile_w,
        settings.span_cap, 64, mc, pair_budget=settings.pair_budget,
        span_mid_cap=settings.span_mid_cap,
    )
    counts = np.asarray(out[2])
    for t in (32, 64, 128, 192):
        print(f"tiles with count > {t}: {(counts > t).sum()}", flush=True)
    print(f"bin-live tiles: {(counts > 0).sum()}, max count: {counts.max()}",
          flush=True)


if __name__ == "__main__":
    main()
