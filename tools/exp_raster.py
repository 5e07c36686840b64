"""Decompose the fused-raster stage cost on the real headline frame.

BENCH r1 attributes ~6.9 ms to "raster_resolve" (geometry + binning +
pair-record gather + the Pallas kernel) — more than half the 12.2 ms
frame. This script times the parts standalone with in-jit scan
amortization (8 dependent iterations per dispatch, CLAUDE.md rule 5) at
the production headline caps, plus candidate-capacity and record-packing
variants, to find where the milliseconds actually are.

Run: python tools/exp_raster.py
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
from jax import lax

WIDTH, HEIGHT = 1920, 1080
SCAN_ITERS = 8
PAIR_BUDGET = 163840
RASTER_TILE_CAP = 1024


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
    print(f"{name:52s} {dt:9.3f} ms", flush=True)
    return out


def dep_i32(carry):
    """int32 zero that the compiler cannot constant-fold (carry is a
    runtime value), so scan iterations stay data-dependent."""
    return jnp.minimum(carry.astype(jnp.int32), 0)


def scan8(body):
    """8 dependent iterations; ``body(carry) -> (new_carry, keep)``."""

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
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    data = scene.scene_data()
    batches = jax.device_put(data.batches)

    def geom(view_m):
        psoup = assemble_scene_planar(batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        return rec, setup

    def geom_body(carry):
        rec, _ = geom(view + carry)
        return jnp.sum(rec[:1, :1]) * 1e-30, rec[:1, :1]

    timeit("geometry+setup+record (625k tri)", scan8(geom_body))

    rec, setup = jax.jit(geom)(view)
    print(f"record table: {rec.shape}", flush=True)

    def bins(setup, maxc=320):
        return fused.bin_pairs(setup, WIDTH, HEIGHT, 8, 128, 16, 64, maxc,
                               pair_budget=PAIR_BUDGET)

    def bins_body(carry):
        s = setup._replace(
            bbox=(setup.bbox[0] + dep_i32(carry), *setup.bbox[1:])
        )
        out = bins(s)
        return jnp.sum(out[1][:1]).astype(jnp.float32) * 1e-30, out[1][:1]

    timeit("bin_pairs (sort 625k*16 span slots)", scan8(bins_body))

    sorted_tri, starts, counts, big_ids, n_big, diag, ty, tx = jax.jit(
        bins)(setup)
    n_live = int(jax.device_get(jnp.sum(counts)))
    print(f"live pairs: {n_live}, bin-live tiles: "
          f"{int(jax.device_get(jnp.sum((counts > 0).astype(jnp.int32))))}",
          flush=True)

    def gather_body(carry):
        out = rec[sorted_tri + dep_i32(carry)]
        return jnp.sum(out[:1, :1]) * 1e-30, out[:1, :1]

    timeit(f"pair record gather ({PAIR_BUDGET//1024}k x 512B)",
           scan8(gather_body))

    # Half-packed proxy: 2 records per 128-lane row — half rows and bytes.
    rec64 = rec[:, :64].reshape(-1, 128)
    half_idx = sorted_tri[::2] // 2

    def gather64_body(carry):
        out = rec64[half_idx + dep_i32(carry)]
        return jnp.sum(out[:1, :1]) * 1e-30, out[:1, :1]

    timeit("  half-packed proxy (82k x 512B rows)", scan8(gather64_body))

    def raster_body(maxc, passes):
        def body(carry):
            px, zkey, d = fused.raster_fused_pallas(
                rec * (1.0 + carry), setup, WIDTH, HEIGHT,
                max_candidates=maxc, raster_tile_cap=RASTER_TILE_CAP,
                pair_budget=PAIR_BUDGET, passes=passes,
            )
            return (jnp.sum(px.depth[:1, :1]) * 1e-30, px.depth[:1, :1])

        return body

    timeit("raster_fused 320x1 (production)", scan8(raster_body(320, 1)))
    timeit("raster_fused 128x3", scan8(raster_body(128, 3)))
    timeit("raster_fused 64x5", scan8(raster_body(64, 5)))
    timeit("raster_fused 320x1 full grid (no tile cap)", scan8(
        lambda carry: (lambda px, zkey, d:
                       (jnp.sum(px.depth[:1, :1]) * 1e-30,
                        px.depth[:1, :1]))(
            *fused.raster_fused_pallas(
                rec * (1.0 + carry), setup, WIDTH, HEIGHT,
                max_candidates=320, pair_budget=PAIR_BUDGET))))

    for maxc, passes in ((128, 3), (64, 5)):
        _, _, d = jax.jit(functools.partial(
            fused.raster_fused_pallas, width=WIDTH, height=HEIGHT,
            max_candidates=maxc, raster_tile_cap=RASTER_TILE_CAP,
            pair_budget=PAIR_BUDGET, passes=passes))(rec, setup)
        print(f"{maxc}x{passes} drops:",
              {k: int(jax.device_get(getattr(d, k)))
               for k in ("dropped_overflow", "dropped_cap",
                         "dropped_pairs", "dropped_tiles")}, flush=True)


if __name__ == "__main__":
    main()
