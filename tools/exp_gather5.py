"""Gather rate vs index-stream ORDER on the real 4K uv stream.

tools/exp_gather4k.py: random indices gather at a flat ~11 ns/slot from
the 4.19M-row table, but SORTED indices run ~15 ns — structure hurts.
The real 4K stream (2× magnified vs 1080p) is full of runs of identical
indices; if that is why sampling measures ~19 ns/slot, a static
block-interleave permutation (view (N,) as (A, B), transpose) breaks the
runs for the gather and costs one cheap inverse relayout of the blended
(N, C) output.

Run: python tools/exp_gather5.py
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

SCAN_ITERS = 8


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
    print(f"{name:56s} {dt:9.3f} ms", flush=True)
    return dt


def scan8(body):
    @jax.jit
    def run():
        def step(carry, _):
            return body(carry)

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def real_stream(width, height, live_cap, pair_budget, raster_cap):
    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, width / height, 0.1, 1000.0)
    data = scene.scene_data()

    @jax.jit
    def get_uv(batches):
        psoup = assemble_scene_planar(batches, view, proj, None)
        setup = triangle_setup_planar(psoup.clip, width, height)
        rec = fused.build_record_table_planar(setup, psoup)
        px, _, _ = fused.raster_fused_pallas(
            rec, setup, width, height, max_candidates=320, span_cap=16,
            pair_budget=pair_budget, raster_tile_cap=raster_cap,
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, live_cap)
        return px.uv[0][ids], px.uv[1][ids]

    return get_uv(data.batches)


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.pipeline import material_quads_from_set
    from bibim_tpu.scene import ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    mats = material_quads_from_set(create_pbr_material_set(),
                                   ShaderBallScene().selected_material)
    big = [t for t in mats if t.height * t.width > tq.SMALL_ROWS][0]
    table = big.quads  # (4.19M, 4) i32
    Wt, Ht = big.width, big.height

    def dep(carry):
        return jnp.minimum(carry.astype(jnp.int32), 0)

    for label, (w, h, cap, pb, rc) in (
        ("1080p", (1920, 1080, 832, 24576, 1024)),
        ("4K", (3840, 2160, 3200, 32768, 3328)),
    ):
        u, v = real_stream(w, h, cap, pb, rc)
        n = u.size
        uf, vf = u.reshape(-1), v.reshape(-1)
        fx = uf * Wt - 0.5
        fy = vf * Ht - 0.5
        x0 = jnp.remainder(jnp.floor(fx).astype(jnp.int32), Wt)
        y0 = jnp.remainder(jnp.floor(fy).astype(jnp.int32), Ht)
        idx = y0 * Wt + x0
        dup = float(jnp.mean((idx[1:] == idx[:-1]).astype(jnp.float32)))
        print(f"{label}: {n/1e6:.2f}M slots, consecutive-dup rate "
              f"{dup:.2f}", flush=True)

        def body(carry, idx=idx):
            q = table[idx + dep(carry)]
            s = jnp.sum(q, dtype=jnp.int32)
            return (s & 1).astype(jnp.float32) * 1e-30, s

        ms = timeit(f"{label} real-stream gather", scan8(body))
        print(f"    {ms * 1e6 / n:.2f} ns/slot", flush=True)

        # Block-interleave: (A, B) transpose breaks runs.
        b_dim = 8192
        a_dim = n // b_dim
        idx_t = idx[: a_dim * b_dim].reshape(a_dim, b_dim).T.reshape(-1)

        def body_t(carry, idx_t=idx_t):
            q = table[idx_t + dep(carry)]
            s = jnp.sum(q, dtype=jnp.int32)
            return (s & 1).astype(jnp.float32) * 1e-30, s

        ms = timeit(f"{label} interleaved gather", scan8(body_t))
        print(f"    {ms * 1e6 / n:.2f} ns/slot", flush=True)

        # Interleave + gather + un-interleave of the output rows (the
        # production-shaped variant: blend consumes original order).
        def body_u(carry, idx_t=idx_t):
            q = table[idx_t + dep(carry)]  # (n, 4) rows in interleaved order
            q = q.reshape(b_dim, a_dim, 4).transpose(1, 0, 2).reshape(-1, 4)
            s = jnp.sum(q, dtype=jnp.int32)
            return (s & 1).astype(jnp.float32) * 1e-30, s

        ms = timeit(f"{label} interleave+gather+restore", scan8(body_u))
        print(f"    {ms * 1e6 / n:.2f} ns/slot", flush=True)


if __name__ == "__main__":
    main()
