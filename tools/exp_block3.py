"""Block-table sampling, round 3: the full-lane Pallas blend.

exp_block2.py showed the 4x4 neighborhood-block table wins the gather 2x
(5.2 -> 2.5 ms) but the XLA 25-tap blend eats the saving (production
sampling stage 7.84 -> 8.47 ms). sample_table_block_pallas moves the
blend into one Pallas pass: gathered rows transpose once to
(NT, 128, NPX) and every tap is a full-lane sublane select in VMEM.

This measures, on the production-shaped compacted uv stream (autotuned
caps, full-output scan dependency per tools/exp_harness.py):

  - quad path (current production): one 4.19M-row gather + dense blend
  - block + XLA blend (the measured regression, as control)
  - block + Pallas blend (the candidate)
  - gather-only + transpose-only costs, to attribute the parts

Run: python tools/exp_block3.py
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
    dt = (time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3
    print(f"{name:56s} {dt:9.3f} ms", flush=True)
    return out


def scanned(fn):
    """Scan with a FULL-output reduction chained into the carry (sliced
    outputs get DCE'd — tools/exp_harness.py)."""

    @jax.jit
    def run(table, u, v):
        def body(carry, _):
            out = fn(table, u + carry, v)
            dep = sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(out)
            ) * 1e-30
            leaf0 = jax.tree_util.tree_leaves(out)[0]
            return dep.astype(jnp.float32).reshape(()), leaf0[:1, :1]

        _, outs = lax.scan(body, jnp.float32(0), None, length=SCAN_ITERS)
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
    settings, _ = autotune_settings(
        data, view_block,
        RenderSettings(width=WIDTH, height=HEIGHT, outputs="image"),
        margin=1.05,
    )
    live_cap = settings.live_tile_cap

    @jax.jit
    def get_uv(batches):
        psoup = assemble_scene_planar(batches, view, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
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
        return px.uv[0][ids], px.uv[1][ids]

    u, v = get_uv(data.batches)
    print(f"compact stream: {u.shape} ({u.size} slots)", flush=True)

    maps = tq.pack_material_maps(create_pbr_material_set(),
                                 scene.selected_material)
    quad_tables = tq.build_quad_tables(maps)
    block_tables = tq.build_quad_tables(maps, block_threshold=tq.SMALL_ROWS)
    big_quad = [t for t in quad_tables
                if t.height * t.width > tq.SMALL_ROWS][0]
    big_block = [t for t in block_tables
                 if isinstance(t, tq.BlockTable)][0]
    big_quad = jax.device_put(big_quad)
    big_block = jax.device_put(big_block)
    print(f"big group: {big_quad.height}x{big_quad.width} "
          f"present={big_quad.present}", flush=True)

    timeit("quad path (production gather+blend)",
           scanned(tq.sample_table_xla), big_quad, u, v)
    timeit("block + XLA blend (control)",
           scanned(tq.sample_table_block), big_block, u, v)
    timeit("block + PALLAS blend (candidate)",
           scanned(tq.sample_table_block_pallas), big_block, u, v)

    # Attribution: gather-only and gather+transpose.
    h, w, b = big_block.height, big_block.width, tq.BLOCK_B
    nbx = w // b

    def gather_only(table, uu, vv):
        uf = uu.reshape(-1)
        vf = vv.reshape(-1)
        x0 = jnp.remainder(jnp.floor(uf * w - 0.5).astype(jnp.int32), w)
        y0 = jnp.remainder(jnp.floor(vf * h - 0.5).astype(jnp.int32), h)
        return table.blocks[(y0 // b) * nbx + (x0 // b)]

    def gather_transpose(table, uu, vv):
        q = gather_only(table, uu, vv)
        nt, npx = uu.shape
        return jnp.transpose(q.reshape(nt, npx, 128), (0, 2, 1))

    timeit("  block gather only", scanned(gather_only), big_block, u, v)
    timeit("  block gather + (NT,128,NPX) transpose",
           scanned(gather_transpose), big_block, u, v)

    # Correctness on the real stream: pallas vs quad oracle.
    want = jax.jit(tq.sample_table_xla)(big_quad, u, v)
    got = jax.jit(tq.sample_table_block_pallas)(big_block, u, v)
    for slot in big_quad.present:
        err = float(jnp.max(jnp.abs(want[slot] - got[slot])))
        print(f"max |quad-{slot}| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
