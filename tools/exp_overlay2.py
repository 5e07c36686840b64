"""Attribute the light-sphere overlay composite (~1 ms on the headline
frame): legacy geometry/record build vs binning vs compaction/gathers vs
the compact kernel.

Run: python tools/exp_overlay2.py
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
    from bibim_tpu.ops.raster import triangle_setup
    from bibim_tpu.pipeline import (
        RenderSettings, make_overlay_resources,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    data = scene.scene_data()
    overlay = make_overlay_resources()
    s = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                       overlay_candidates=256, overlay_max_tiles=384)
    lights = data.lights
    num_l = lights.num_lights
    vs = overlay.sphere_positions
    nv = vs.shape[0]
    nt = s.tiles_x * s.tiles_y
    npx = s.tile_h * s.tile_w
    rng = np.random.default_rng(0)
    ldr3 = tuple(jnp.asarray(rng.uniform(0, 1, (nt, npx)).astype(np.float32))
                 for _ in range(3))
    zkey = jnp.zeros((nt, npx), jnp.int32)
    view_proj = m3.matmul(proj, view)

    def geom(vp, carry):
        vp = vp * (1 + carry * 0)
        world = (vs[None, :, :] + lights.pos[:, None, :]).reshape(-1, 3)
        p4 = jnp.concatenate([world, jnp.ones_like(world[..., :1])], -1)
        clip = jnp.einsum("vk,mk->vm", p4, vp,
                          precision=jax.lax.Precision.HIGHEST)
        offs = (jnp.arange(num_l, dtype=jnp.int32) * nv)[:, None, None]
        tris = (overlay.sphere_tris[None] + offs).reshape(-1, 3)
        colors = jnp.broadcast_to(lights.color[:, None, :],
                                  (num_l, nv, 3)).reshape(-1, 3)
        setup = triangle_setup(clip, tris, WIDTH, HEIGHT)
        zeros2 = jnp.zeros((world.shape[0], 2), jnp.float32)
        zeros3 = jnp.zeros_like(world)
        rec = fused.build_record_table(setup, tris, zeros2, zeros3, zeros3,
                                       world, colors)
        return rec, setup

    def c1(vp, carry):
        return geom(vp, carry)

    def c2(vp, carry):
        rec, setup = geom(vp, carry)
        out = fused.bin_pairs(setup, WIDTH, HEIGHT, s.tile_h, s.tile_w,
                              32, 512, 256, pair_budget=65536,
                              span_mid_cap=256)
        return rec, out[:5]

    def c3(vp, carry):
        rec, setup = geom(vp, carry)
        ldr, diag = fused.composite_overlay_pallas(
            rec, setup, ldr3, zkey, WIDTH, HEIGHT,
            tile_h=s.tile_h, tile_w=s.tile_w, max_candidates=256,
            overflow_cap=512, span_cap=32, max_tiles=384,
            span_mid_cap=256)
        return ldr

    def c3b(vp, carry):
        rec, setup = geom(vp, carry)
        ldr, diag = fused.composite_overlay_pallas(
            rec, setup, ldr3, zkey, WIDTH, HEIGHT,
            tile_h=s.tile_h, tile_w=s.tile_w, max_candidates=64,
            overflow_cap=64, span_cap=32, max_tiles=64,
            span_mid_cap=256)
        return ldr

    timeit("1 overlay geometry + record (legacy layout)", scanned(c1),
           view_proj)
    timeit("2 ... + bin_pairs(span-class)", scanned(c2), view_proj)
    timeit("3 full composite (oc=512 maxc=256 tiles=384)", scanned(c3),
           view_proj)
    timeit("3b full composite (oc=64 maxc=64 tiles=64)", scanned(c3b),
           view_proj)


if __name__ == "__main__":
    main()
