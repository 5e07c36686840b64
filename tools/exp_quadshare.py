"""Quad-shared block-row gathers: can one gather serve a 2x2 screen quad?

The 4K sampling stage is gather-issue-bound: one 128 B block-row fetch per
covered pixel (~2.4-2.7 ns/slot, docs/PERFORMANCE.md). Adjacent pixels'
bilinear footprints usually land in the SAME 4x4 texel block when the uv
derivative is small (4K magnification), so a single row could serve a
whole 2x2 screen quad — a 4x cut in gather queries. Exactness requires
the shared row's tap window to cover every quad member's 2x2 footprint:

  window 5x5 (current 128 B rows): all four bases in ONE 4-texel block
  window 8x8 (256 B rows):         per-axis base spread <= 3 from the
                                   min-base pixel's block origin

Violating quads need a per-pixel fallback, which only pays if compacted
at TILE granularity (two live-tile lists) — so the decision numbers are:

  1. per-axis base-spread distribution of 2x2 quads on the REAL stream
  2. fraction of live tiles where EVERY quad is clean (window 5 / 8)
  3. coherent gather rate: N x 128 B (today) vs N/4 x 256 B (shared)

Run: python tools/exp_quadshare.py [--w 3840 --h 2160]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SCAN_ITERS = 8
TILE_H, TILE_W = 8, 128


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
    print(f"{name:56s} {dt:9.3f} ms/frame", flush=True)
    return out


def scanned(fn):
    @jax.jit
    def run(table, u, v):
        def body(carry, _):
            out = fn(table, u + carry, v)
            return jnp.sum(out[..., :1, :1]) * 1e-30, out

        _, outs = lax.scan(body, jnp.float32(0), None, length=SCAN_ITERS)
        return outs[-1]

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--h", type=int, default=2160)
    args = ap.parse_args()
    W, H = args.w, args.h

    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import (RenderSettings, ViewBlock,
                                    material_quads_from_set)
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}  frame {W}x{H}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, W / H, 0.1, 1000.0)
    data = scene.scene_data()
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    # Mirror bench_stretch_4k's base (span_cap=32: the 4K ground-plane
    # triangles overflow the default 16 and get DROPPED, halving coverage)
    base = RenderSettings(width=W, height=H, outputs="image", span_cap=32)
    s, _ = autotune_settings(data, vb, base, margin=1.05)
    print(f"caps: live={s.live_tile_cap} raster={s.raster_tile_cap} "
          f"pairs={s.pair_budget}", flush=True)

    @jax.jit
    def get_uv(batches):
        psoup = assemble_scene_planar(batches, view, proj, None)
        setup = triangle_setup_planar(psoup.clip, W, H)
        rec = fused.build_record_table_planar(setup, psoup)
        px, _, diag = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=s.max_candidates,
            span_cap=s.span_cap, pair_budget=s.pair_budget,
            raster_tile_cap=s.raster_tile_cap,
            span_mid_cap=s.span_mid_cap,
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, s.live_tile_cap)
        return (px.uv[0][ids], px.uv[1][ids], px.tri_id[ids],
                jnp.sum(live, dtype=jnp.int32), diag)

    u, v, tri, n_live, diag = get_uv(data.batches)
    nt, npx = u.shape
    print(f"live tiles {int(n_live)} / cap {nt}; slots {nt * npx}; "
          f"drops ovf={int(diag.dropped_overflow)} "
          f"cap={int(diag.dropped_cap)} pairs={int(diag.dropped_pairs)}",
          flush=True)

    mats = material_quads_from_set(create_pbr_material_set(),
                                   scene.selected_material)
    big = [t for t in mats
           if t.height * t.width > tq.SMALL_ROWS and not
           isinstance(t, tq.BlockTable)]
    blocks = [t for t in mats if isinstance(t, tq.BlockTable)]
    table = blocks[0] if blocks else big[0]
    TH, TW = table.height, table.width
    print(f"table {TH}x{TW} present={table.present}", flush=True)

    # ---- footprint stats on the real stream -------------------------------
    cov = np.asarray(tri >= 0)
    uf = np.asarray(u, np.float64)
    vf = np.asarray(v, np.float64)
    fx = uf * TW - 0.5
    fy = vf * TH - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)

    def quadify(p):
        # (nt, 1024) -> (nt, 4, 2, 64, 2): tile rows pair, cols pair
        return p.reshape(nt, TILE_H // 2, 2, TILE_W // 2, 2)

    qc = quadify(cov)
    any_cov = qc.any(axis=(2, 4))
    # spread relative to the quad's covered-min base (uncovered members
    # excluded: their uv is never read)
    BIG = 1 << 40

    def spread(b):
        qb = quadify(b)
        mn = np.where(qc, qb, BIG).min(axis=(2, 4))
        mx = np.where(qc, qb, -BIG).max(axis=(2, 4))
        return np.where(any_cov, mx - mn, 0)

    sx = spread(x0)
    sy = spread(y0)
    ncg = any_cov.sum()
    print(f"covered quads: {ncg} / {any_cov.size}", flush=True)
    for name, sp in (("x", sx), ("y", sy)):
        qs = sp[any_cov]
        hist = [(qs <= k).mean() for k in (0, 1, 2, 3, 4, 6, 8, 16)]
        print(f"base spread {name}: P<=0/1/2/3/4/6/8/16 = "
              + "/".join(f"{p:.3f}" for p in hist), flush=True)

    b = tq.BLOCK_B

    # window 5 (current rows): all bases in one block
    def same_block(q):
        mn = q.min(axis=(2, 4))
        mx = np.where(quadify(cov), q, -BIG).max(axis=(2, 4))
        return (mx <= mn) | ~any_cov

    clean5 = same_block(quadify(np.where(cov, x0 // b, BIG))) \
        & same_block(quadify(np.where(cov, y0 // b, BIG)))
    # window 8 (256 B rows): spread <= 3 AND min-base block origin covers
    # max tap: taps [4B .. 4B+7] cover bases [4B .. 4B+6] -> spread from
    # block-aligned origin: (max_base - 4*(min_base//4)) <= 6
    def fits8(b0):
        qb = quadify(np.where(cov, b0, BIG))
        mn = qb.min(axis=(2, 4))
        mx = np.where(quadify(cov), b0.reshape(qb.shape), -BIG).max(
            axis=(2, 4))
        return (mx - (mn // b) * b <= b + 2) | ~any_cov

    clean8 = fits8(x0) & fits8(y0)
    tile_has_cov = cov.reshape(nt, -1).any(axis=1)
    for name, cl in (("win5", clean5), ("win8", clean8)):
        qfrac = (cl & any_cov).sum() / max(ncg, 1)
        tclean = (cl.all(axis=(1, 2)) & tile_has_cov).sum()
        print(f"{name}: clean covered-quad frac {qfrac:.3f}; "
              f"fully-clean live tiles {tclean} / {int(tile_has_cov.sum())}",
              flush=True)

    # ---- gather timings ----------------------------------------------------
    if not blocks:
        print("no BlockTable bound; skipping timing", flush=True)
        return
    nbx = TW // b
    rows128 = table.blocks  # (R, 128) u8

    def g_full(tbl, uu, vv):
        ffx = uu.reshape(-1) * TW - 0.5
        ffy = vv.reshape(-1) * TH - 0.5
        xi = jnp.remainder(jnp.floor(ffx).astype(jnp.int32), TW)
        yi = jnp.remainder(jnp.floor(ffy).astype(jnp.int32), TH)
        q = tbl[(yi // b) * nbx + (xi // b)]
        return jnp.transpose(q.reshape(nt, npx, 128), (0, 2, 1))

    timeit(f"full gather {nt*npx//1000}k x 128B + transpose",
           scanned(g_full), rows128, u, v)

    # shared: one gather per quad (idx from quad pixel (0,0)), lane-repeat
    rows256 = jnp.asarray(
        np.pad(np.asarray(jax.device_get(rows128)), ((0, 0), (0, 128))))

    def quad_ref_idx(uu, vv):
        ffx = uu * TW - 0.5
        ffy = vv * TH - 0.5
        xi = jnp.remainder(jnp.floor(ffx).astype(jnp.int32), TW)
        yi = jnp.remainder(jnp.floor(ffy).astype(jnp.int32), TH)
        idx = ((yi // b) * nbx + (xi // b)).reshape(
            nt, TILE_H // 2, 2, TILE_W // 2, 2)
        return idx[:, :, 0, :, 0].reshape(-1)  # (nt*256,)

    def g_quad(tbl, uu, vv):
        ref = quad_ref_idx(uu, vv)
        q = tbl[ref]  # (nt*256, rb)
        rb = q.shape[-1]
        qq = q.reshape(nt, TILE_H // 2, TILE_W // 2, rb)
        qq = jnp.broadcast_to(qq[:, :, None, :, None, :],
                              (nt, TILE_H // 2, 2, TILE_W // 2, 2, rb))
        return jnp.transpose(qq.reshape(nt, npx, rb), (0, 2, 1))

    timeit(f"quad gather {nt*npx//4096}k x 128B + expand+transpose",
           scanned(g_quad), rows128, u, v)
    timeit(f"quad gather {nt*npx//4096}k x 256B + expand+transpose",
           scanned(g_quad), rows256, u, v)

    # quad gather without the expand (pure fetch cost)
    def g_quad_raw(tbl, uu, vv):
        q = tbl[quad_ref_idx(uu, vv)]
        return q.reshape(nt, -1, q.shape[-1])

    timeit("quad gather 256B, no expand", scanned(g_quad_raw), rows256, u, v)
    timeit("quad gather 128B, no expand", scanned(g_quad_raw), rows128, u, v)


if __name__ == "__main__":
    main()
