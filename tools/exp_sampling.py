"""Material-sample packing variants measured on the REAL frame's uv planes.

Builds the 1080p ShaderBall frame, extracts the fused raster's planar
(u, v) outputs, and times bilinear material sampling under candidate
table packings (synthetic index streams in bench_gather2.py mispredict
the real mix of background zeros + plane coherence + ball scatter):

  A. current: (4M, 32) u8 quad rows, one gather/px
  B. i32-packed: (4M, 8) i32 rows (same bytes, 8 lanes), unpack via shifts
  C. k=2 u8: (2M, 64) u8 rows, dense sub-row select
  D. k=2 i32: (2M, 16) i32 rows
  E. k=4 i32: (1M, 32) i32 rows

Run: python tools/exp_sampling.py
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
    print(f"{name:46s} {dt:9.3f} ms/frame-sample", flush=True)
    return out


def scanned(fn):
    @jax.jit
    def run(table, u, v):
        def body(carry, _):
            out = fn(table, u + carry * 1e-7, v)
            return jnp.sum(out[:1, :1]) * 1e-30, out

        _, outs = lax.scan(body, jnp.float32(0), None, length=SCAN_ITERS)
        return outs[-1]

    return run


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.geometry import assemble_scene
    from bibim_tpu.ops.raster import triangle_setup
    from bibim_tpu.pipeline import material_quads_from_set
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera(pos=np.zeros(3, np.float32))
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    data = scene.scene_data()

    @jax.jit
    def get_uv(batches):
        soup = assemble_scene(batches, view, proj, None)
        setup = triangle_setup(soup.clip, soup.tris, WIDTH, HEIGHT,
                               sequential=True)
        rec = fused.build_record_table(
            setup, soup.tris, soup.uv, soup.normal, soup.tangent,
            soup.world, soup.color, soup.mat_id, sequential=True)
        px, _, _ = fused.raster_fused_pallas(rec, setup, WIDTH, HEIGHT,
                                             max_candidates=320, span_cap=16)
        return px.uv[0], px.uv[1], px.tri_id

    u, v, tri = get_uv(data.batches)
    cov = float(jnp.mean((tri >= 0).astype(jnp.float32)))
    print(f"coverage: {cov:.3f}", flush=True)

    mats = material_quads_from_set(create_pbr_material_set(),
                                   scene.selected_material)
    big = [t for t in mats if t.height * t.width > tq.SMALL_ROWS]
    assert len(big) == 1, [t.present for t in mats]
    table = big[0]
    h, w = table.height, table.width
    quads_np = np.asarray(jax.device_get(table.quads))  # (HW, 4*C) u8
    rows, rb = quads_np.shape
    print(f"big table: {rows} rows x {rb} u8, present={table.present}",
          flush=True)

    def footprint(u, v):
        fx = u * w - 0.5
        fy = v * h - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        x0i = jnp.remainder(x0.astype(jnp.int32), w)
        y0i = jnp.remainder(y0.astype(jnp.int32), h)
        return y0i * w + x0i, fx - x0, fy - y0

    def blend(q, tx, ty, c):
        w00 = ((1 - tx) * (1 - ty))[:, None]
        w01 = (tx * (1 - ty))[:, None]
        w10 = ((1 - tx) * ty)[:, None]
        w11 = (tx * ty)[:, None]
        return (q[:, :c] * w00 + q[:, c:2 * c] * w01
                + q[:, 2 * c:3 * c] * w10 + q[:, 3 * c:] * w11)

    c = rb // 4

    # A. current
    def cur(table, u, v):
        idx, tx, ty = footprint(u.reshape(-1), v.reshape(-1))
        q = table[idx].astype(jnp.float32) * (1 / 255.0)
        return blend(q, tx, ty, c)

    timeit("A current (HW x 32u8)", scanned(cur), jnp.asarray(quads_np),
           u, v)

    # B. i32-packed
    t_i32 = jnp.asarray(
        np.ascontiguousarray(quads_np).view(np.int32)
    )  # (rows, rb/4) i32, little-endian byte packs

    def unpack(qi):  # (N, rb/4) i32 -> (N, rb) f32
        parts = [((qi >> (8 * b)) & 0xFF).astype(jnp.float32)
                 for b in range(4)]
        return jnp.stack(parts, axis=-1).reshape(qi.shape[0], -1)

    def i32p(table, u, v):
        idx, tx, ty = footprint(u.reshape(-1), v.reshape(-1))
        q = unpack(table[idx]) * (1 / 255.0)
        return blend(q, tx, ty, c)

    timeit("B i32-packed (HW x 8i32)", scanned(i32p), t_i32, u, v)

    # C/D/E: k-block variants
    def kblock(k, as_i32):
        if as_i32:
            tb = jnp.asarray(
                np.ascontiguousarray(
                    quads_np.reshape(rows // k, k * rb)
                ).view(np.int32)
            )
        else:
            tb = jnp.asarray(quads_np.reshape(rows // k, k * rb))

        def fn(table, u, v):
            idx, tx, ty = footprint(u.reshape(-1), v.reshape(-1))
            blk = table[idx // k]
            q = unpack(blk) if as_i32 else blk.astype(jnp.float32)
            q = q.reshape(-1, k, rb)
            sub = (idx % k)[:, None, None]
            oh = lax.broadcasted_iota(jnp.int32, (1, k, 1), 1) == sub
            q = jnp.sum(jnp.where(oh, q, 0.0), axis=1) * (1 / 255.0)
            return blend(q, tx, ty, c)

        return tb, fn

    for k, as_i32, tag in ((2, False, "C k=2 u8 (HW/2 x 64u8)"),
                           (2, True, "D k=2 i32 (HW/2 x 16i32)"),
                           (4, True, "E k=4 i32 (HW/4 x 32i32)")):
        tb, fn = kblock(k, as_i32)
        timeit(tag, scanned(fn), tb, u, v)

    # F. bf16 rows (u8 values are bf16-exact; no unpack ops needed)
    t_bf16 = jnp.asarray(quads_np.astype(np.float32)).astype(jnp.bfloat16)

    def bf(table, u, v):
        idx, tx, ty = footprint(u.reshape(-1), v.reshape(-1))
        q = table[idx].astype(jnp.float32) * (1 / 255.0)
        return blend(q, tx, ty, c)

    timeit("F bf16 (HW x 16bf16)", scanned(bf), t_bf16, u, v)

    # G. covered-pixels-only gather cost probe: clamp miss pixels' indices
    # to 0 explicitly (they already are) vs spreading them randomly — how
    # much does the miss concentration save?
    # correctness spot check (A vs D)
    a = cur(jnp.asarray(quads_np), u, v)
    tb, fn = kblock(2, True)
    d = fn(tb, u, v)
    err = float(jnp.max(jnp.abs(a - d)))
    print(f"max |A-D| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
