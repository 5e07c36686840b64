"""Neighborhood-block gather tables for the big MRAO sampling stage.

The headline frame's dominant cost is ONE row-gather per covered pixel
from the merged metallic/roughness/ao quad table: 2048^2 = 4.19M rows sits
in the slow gather regime (~11 ns/row random; ~4.5 ns for tables <= 2^19
rows — tools/bench_gather.py). A *neighborhood block table* stores one row
per BxBy texel block containing the (Bx+1)x(By+1) wrap-correct texel
neighborhood, so ANY bilinear footprint whose top-left tap falls in the
block is served by that single row:

  rows = H*W/(Bx*By)   (4x4 -> 262k rows = 2^18: the fast regime)
  row bytes = (Bx+1)*(By+1)*C  (<= 512 B keeps gather cost row-count-bound)

The bilinear blend becomes a dense per-pixel weighted sum over the block
taps (wx outer wy, at most 2 nonzero per axis). This script measures, on
the REAL 1080p ShaderBall frame's PRODUCTION-SHAPED uv stream (coverage-
compacted to the live-tile list, exactly what render_frame samples):

  A  current quad table (4.19M x 4 i32)          [the 5.3 ms stage]
  B* block variants (Bx,By) x {u8, i32} rows x blend formulations

plus the covered-pixel occupancy of the compacted stream (how much a
pixel-level — rather than tile-level — compaction could still save).

Run: python tools/exp_block.py
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
LIVE_TILE_CAP = 896  # bench.py headline setting
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
    print(f"{name:52s} {dt:9.3f} ms/frame-sample", flush=True)
    return out


def scanned(fn):
    @jax.jit
    def run(table, u, v):
        def body(carry, _):
            out = fn(table, u + carry, v)
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
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import material_quads_from_set
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    data = scene.scene_data()

    @jax.jit
    def get_uv(batches):
        psoup = assemble_scene_planar(batches, view, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        px, _, _ = fused.raster_fused_pallas(
            rec, setup, WIDTH, HEIGHT, max_candidates=320, span_cap=16,
            pair_budget=163840, raster_tile_cap=1024,
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, LIVE_TILE_CAP)
        return (px.uv[0][ids], px.uv[1][ids], px.tri_id[ids],
                jnp.sum(live, dtype=jnp.int32),
                jnp.sum((px.tri_id >= 0).astype(jnp.int32)))

    u, v, tri, n_live, n_cov = get_uv(data.batches)
    slots = u.shape[0] * u.shape[1]
    print(f"live tiles: {int(n_live)} (cap {LIVE_TILE_CAP}); covered px "
          f"{int(n_cov)} / {slots} compacted slots "
          f"({100 * int(n_cov) / slots:.1f}% occupancy) "
          f"/ {WIDTH * HEIGHT} frame px", flush=True)

    mats = material_quads_from_set(create_pbr_material_set(),
                                   scene.selected_material)
    big = [t for t in mats if t.height * t.width > tq.SMALL_ROWS]
    assert len(big) == 1, [t.present for t in mats]
    table = big[0]
    H, W = table.height, table.width
    qnp = np.asarray(jax.device_get(table.quads))
    if qnp.dtype == np.int32:
        qnp = np.ascontiguousarray(qnp).view(np.uint8)
    rows, rb = qnp.shape
    C = rb // 4
    print(f"big table: {rows} rows x {rb} B, C={C}, "
          f"present={table.present}", flush=True)
    # Recover the raw texel image from the t00 slice of the quad rows.
    tex = qnp[:, :C].reshape(H, W, C)

    def footprint(uu, vv):
        fx = uu * W - 0.5
        fy = vv * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        x0i = jnp.remainder(x0.astype(jnp.int32), W)
        y0i = jnp.remainder(y0.astype(jnp.int32), H)
        return x0i, y0i, fx - x0, fy - y0

    # ---- A. current int32 quad table --------------------------------------
    t_cur = jnp.asarray(np.ascontiguousarray(qnp).view(np.int32))

    def unpack(qi):
        parts = [((qi >> (8 * b)) & 0xFF).astype(jnp.float32)
                 for b in range(4)]
        return jnp.stack(parts, axis=-1).reshape(qi.shape[0], -1)

    def cur(table, uu, vv):
        x0, y0, tx, ty = footprint(uu.reshape(-1), vv.reshape(-1))
        q = unpack(table[y0 * W + x0]) * (1 / 255.0)
        w00 = ((1 - tx) * (1 - ty))[:, None]
        w01 = (tx * (1 - ty))[:, None]
        w10 = ((1 - tx) * ty)[:, None]
        w11 = (tx * ty)[:, None]
        return (q[:, :C] * w00 + q[:, C:2 * C] * w01
                + q[:, 2 * C:3 * C] * w10 + q[:, 3 * C:] * w11)

    ref = timeit("A current quad (4.19M x 4i32)", scanned(cur), t_cur, u, v)

    # ---- block tables -----------------------------------------------------
    def build_block(bx, by):
        """Rows: one per (by, bx) block; row = [c-of-tap for tap (j, i)
        in row-major (Sy, Sx)] x C channels, wrap-correct."""
        sx, sy = bx + 1, by + 1
        nby, nbx = H // by, W // bx
        ay = (np.arange(nby) * by)[:, None]
        ax = (np.arange(nbx) * bx)[None, :]
        taps = [tex[(ay + j) % H, (ax + i) % W]
                for j in range(sy) for i in range(sx)]
        # (nby, nbx, Sy*Sx*C)
        blk = np.concatenate(taps, axis=-1)
        return blk.reshape(nby * nbx, sy * sx * C)

    def block_fn(bx, by, as_i32, blend_kind):
        sx, sy = bx + 1, by + 1
        nbx = W // bx
        raw = build_block(bx, by)
        L = raw.shape[1]
        if as_i32:
            pad = (-L) % 4
            if pad:
                raw = np.pad(raw, ((0, 0), (0, pad)))
            tb = jnp.asarray(np.ascontiguousarray(raw).view(np.int32))
        else:
            tb = jnp.asarray(raw)

        def fn(table, uu, vv):
            x0, y0, tx, ty = footprint(uu.reshape(-1), vv.reshape(-1))
            idx = (y0 // by) * nbx + (x0 // bx)
            lx = x0 % bx
            ly = y0 % by
            q = unpack(table[idx]) if as_i32 \
                else table[idx].astype(jnp.float32)
            q = q[:, :sy * sx * C] * (1 / 255.0)
            ix = lax.broadcasted_iota(jnp.int32, (x0.shape[0], sx), 1)
            iy = lax.broadcasted_iota(jnp.int32, (x0.shape[0], sy), 1)
            wx = (jnp.where(ix == lx[:, None], (1 - tx)[:, None], 0.0)
                  + jnp.where(ix == lx[:, None] + 1, tx[:, None], 0.0))
            wy = (jnp.where(iy == ly[:, None], (1 - ty)[:, None], 0.0)
                  + jnp.where(iy == ly[:, None] + 1, ty[:, None], 0.0))
            if blend_kind == "slices":
                out = jnp.zeros((x0.shape[0], C), jnp.float32)
                for j in range(sy):
                    acc = jnp.zeros((x0.shape[0], C), jnp.float32)
                    for i in range(sx):
                        t0 = (j * sx + i) * C
                        acc = acc + q[:, t0:t0 + C] * wx[:, i:i + 1]
                    out = out + acc * wy[:, j:j + 1]
                return out
            # reshape-reduce: full-lane multiply, then tap reduction
            w2 = (wy[:, :, None] * wx[:, None, :]).reshape(
                x0.shape[0], sy * sx)
            prod = q.reshape(-1, sy * sx, C) * w2[:, :, None]
            return jnp.sum(prod, axis=1)

        return tb, fn

    variants = [
        (4, 4, True, "slices"),
        (4, 4, True, "reduce"),
        (4, 4, False, "slices"),
        (4, 2, True, "slices"),
        (2, 2, True, "slices"),
        (8, 2, True, "slices"),
        (8, 4, True, "slices"),
        (8, 8, True, "slices"),
    ]
    results = {}
    for bx, by, as_i32, kind in variants:
        sx, sy = bx + 1, by + 1
        nrows = (H // by) * (W // bx)
        tag = (f"B {bx}x{by} ({nrows // 1024}k x {sy * sx * C}B "
               f"{'i32' if as_i32 else 'u8'} {kind})")
        tb, fn = block_fn(bx, by, as_i32, kind)
        out = timeit(tag, scanned(fn), tb, u, v)
        results[(bx, by, as_i32, kind)] = (tb, fn)
        del out

    # correctness: A vs 4x4 slices
    tb, fn = results[(4, 4, True, "slices")]
    a = cur(t_cur, u, v)
    b = fn(tb, u, v)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"max |A - B4x4| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
