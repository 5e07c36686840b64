"""Block-table sampling, round 2: isolate gather vs blend cost.

exp_block.py measured u8 4x4 neighborhood-block rows at 4.87 ms vs 5.18
current — the row-count win exists but the 25-tap blend eats most of it.
This run separates the parts on the same production-shaped uv stream:

  - gather-only cost of the current (4.19M row) vs block (262k row) table
  - u8 rows padded to 128 B (lane-aligned) vs raw 100 B
  - blend formulations: exact-oracle-order tap accumulation (pixel-major)
    vs transpose-to-planar accumulation (full-lane VPU, same fp order)
  - two parallel half-stream gathers (does the gather engine overlap?)

Run: python tools/exp_block2.py
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
LIVE_TILE_CAP = 896
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
    @jax.jit
    def run(table, u, v):
        def body(carry, _):
            out = fn(table, u + carry, v)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf[:1].astype(jnp.float32)).reshape(()) * 1e-30, \
                leaf[:1]

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
        return px.uv[0][ids], px.uv[1][ids]

    u, v = get_uv(data.batches)

    mats = material_quads_from_set(create_pbr_material_set(),
                                   scene.selected_material)
    big = [t for t in mats if t.height * t.width > tq.SMALL_ROWS][0]
    H, W = big.height, big.width
    qnp = np.asarray(jax.device_get(big.quads))
    if qnp.dtype == np.int32:
        qnp = np.ascontiguousarray(qnp).view(np.uint8)
    C = qnp.shape[1] // 4
    tex = qnp[:, :C].reshape(H, W, C)
    print(f"big table: {H}x{W}, C={C}", flush=True)

    def footprint(uu, vv):
        fx = uu * W - 0.5
        fy = vv * H - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        x0i = jnp.remainder(x0.astype(jnp.int32), W)
        y0i = jnp.remainder(y0.astype(jnp.int32), H)
        return x0i, y0i, fx - x0, fy - y0

    t_cur = jnp.asarray(np.ascontiguousarray(qnp).view(np.int32))

    def cur_gather_only(table, uu, vv):
        x0, y0, _, _ = footprint(uu.reshape(-1), vv.reshape(-1))
        return table[y0 * W + x0]

    timeit("current gather-only (4.19M x 4i32)", scanned(cur_gather_only),
           t_cur, u, v)

    # Block table 4x4 (5x5 neighborhood), u8 rows [j][i][c].
    B, S = 4, 5
    nby, nbx = H // B, W // B
    ay = (np.arange(nby) * B)[:, None]
    ax = (np.arange(nbx) * B)[None, :]
    taps = [tex[(ay + j) % H, (ax + i) % W] for j in range(S)
            for i in range(S)]
    blk_raw = np.concatenate(taps, axis=-1).reshape(nby * nbx, S * S * C)
    blk_pad = np.pad(blk_raw, ((0, 0), (0, 128 - blk_raw.shape[1])))
    t_raw = jnp.asarray(blk_raw)
    t_pad = jnp.asarray(blk_pad)

    def blk_gather_only(table, uu, vv):
        x0, y0, _, _ = footprint(uu.reshape(-1), vv.reshape(-1))
        return table[(y0 // B) * nbx + (x0 // B)]

    timeit("block gather-only (262k x 100B u8)", scanned(blk_gather_only),
           t_raw, u, v)
    timeit("block gather-only (262k x 128B u8 pad)",
           scanned(blk_gather_only), t_pad, u, v)

    def weights(x0, y0, tx, ty):
        lx = x0 % B
        ly = y0 % B
        ix = lax.broadcasted_iota(jnp.int32, (x0.shape[0], S), 1)
        iy = lax.broadcasted_iota(jnp.int32, (x0.shape[0], S), 1)
        wx = (jnp.where(ix == lx[:, None], (1 - tx)[:, None], 0.0)
              + jnp.where(ix == lx[:, None] + 1, tx[:, None], 0.0))
        wy = (jnp.where(iy == ly[:, None], (1 - ty)[:, None], 0.0)
              + jnp.where(iy == ly[:, None] + 1, ty[:, None], 0.0))
        return wx, wy

    def blk_exact(table, uu, vv):
        """Row-major tap accumulation — same fp order as the quad oracle
        (live taps appear in w00,w01,w10,w11 order; dead taps add 0.0)."""
        x0, y0, tx, ty = footprint(uu.reshape(-1), vv.reshape(-1))
        q = table[(y0 // B) * nbx + (x0 // B)].astype(jnp.float32)
        q = q * (1.0 / 255.0)
        wx, wy = weights(x0, y0, tx, ty)
        out = jnp.zeros((x0.shape[0], C), jnp.float32)
        for j in range(S):
            for i in range(S):
                t0 = (j * S + i) * C
                out = out + q[:, t0:t0 + C] * (
                    wy[:, j:j + 1] * wx[:, i:i + 1]
                )
        return out

    timeit("block u8 + exact-order pixel-major blend", scanned(blk_exact),
           t_raw, u, v)

    def blk_planar(table, uu, vv):
        """Transpose the gathered rows once, blend planar (full lanes)."""
        x0, y0, tx, ty = footprint(uu.reshape(-1), vv.reshape(-1))
        q = table[(y0 // B) * nbx + (x0 // B)]  # (N, 100) u8
        qT = q.T.astype(jnp.float32) * (1.0 / 255.0)  # (100, N)
        wx, wy = weights(x0, y0, tx, ty)
        wxT = wx.T  # (S, N)
        wyT = wy.T
        out = [jnp.zeros((1, x0.shape[0]), jnp.float32) for _ in range(C)]
        for j in range(S):
            for i in range(S):
                w = wyT[j:j + 1] * wxT[i:i + 1]
                for c in range(C):
                    row = (j * S + i) * C + c
                    out[c] = out[c] + qT[row:row + 1] * w
        return jnp.concatenate(out, axis=0)

    timeit("block u8 + transpose planar blend", scanned(blk_planar),
           t_raw, u, v)

    # Does the gather engine overlap two independent streams?
    n = u.size
    uf = u.reshape(-1)
    vf = v.reshape(-1)

    def split_gather(table, uu, vv):
        x0, y0, _, _ = footprint(uu.reshape(-1), vv.reshape(-1))
        idx = y0 * W + x0
        a = table[idx[: n // 2]]
        b = table[idx[n // 2:]]
        return a, b

    timeit("current gather split in 2 (overlap test)",
           scanned(split_gather), t_cur, u, v)

    # correctness: exact-order block vs the production oracle
    oracle = tq.sample_table_xla(big, u, v)
    got = jax.jit(blk_exact)(t_raw, u, v)
    for k, slot in enumerate(big.present):
        err = float(jnp.max(jnp.abs(
            oracle[slot].reshape(-1) - got[:, k]
        )))
        print(f"max |oracle-{slot}| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
