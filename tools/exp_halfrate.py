"""Ceiling probe for half-rate material sampling (VERDICT r2 lever 1b).

The headline sampling stage is issue-bound on ONE block-row gather per
compacted covered pixel (852k slots, ~2.4 ms — docs/PERFORMANCE.md).
Half-rate sampling gathers only even-x pixels and reconstructs odd-x
in-kernel by neighbor average — a QUERY-COUNT lever. This probe
measures, on the real headline frame:
  1. the gather+transpose cost at full vs half slot count (the ceiling),
  2. the per-tile UV-gradient census: what fraction of live tiles are
     low-gradient (rho < thresh texels/px), i.e. reconstructable with
     sub-quantization error,
  3. the end-to-end production sampling stage at both rates.

Run: python tools/exp_halfrate.py
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


def timeit(name, fn, iters=4):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    print(f"{name:56s} "
          f"{(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:8.2f} ms",
          flush=True)
    return out


def scan8(body):
    @jax.jit
    def run():
        def step(carry, _):
            return body(carry)

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def dep_f(x):
    return (jnp.sum(x.astype(jnp.float32)) * 1e-30).astype(jnp.float32)


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import (
        RenderSettings, ViewBlock, material_quads_from_set,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    data = scene.scene_data()
    s, _ = autotune_settings(
        data, vb,
        RenderSettings(width=WIDTH, height=HEIGHT, outputs="image"),
        margin=1.05,
    )
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material))
    big = [t for t in mats if isinstance(t, tq.BlockTable)]
    print("bindings:", [(type(t).__name__, getattr(t, "present", None),
                         getattr(t, "height", None)) for t in mats],
          flush=True)

    # Production pixels: raster + coverage compaction at the derived cap.
    def pixels(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        px, zkey, diag = fused.raster_fused_pallas(
            rec, setup, WIDTH, HEIGHT,
            max_candidates=s.max_candidates, span_cap=s.span_cap,
            span_mid_cap=s.span_mid_cap, overflow_cap=s.overflow_cap,
            pair_budget=s.pair_budget, raster_tile_cap=s.raster_tile_cap,
            dense_tile_cap=s.dense_tile_cap, passes=s.raster_passes,
            drop_fields=("depth", "cr", "cg", "cb", "matf", "b0", "b1"),
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, s.live_tile_cap)
        return jax.tree_util.tree_map(lambda p: p[ids], px)

    px = jax.jit(pixels)(view)
    u, v = px.uv
    nl, npx = u.shape
    print(f"live tiles: {nl}, slots: {nl * npx}", flush=True)

    # 2. UV-gradient census per live tile against the big table dims.
    if big:
        h, w = big[0].height, big[0].width
        lod = tq.quad_lod_planar(u, v, s.tile_h, s.tile_w, h, w)
        rho = np.asarray(2.0 ** jax.device_get(lod))
        hit = np.asarray(px.tri_id >= 0)
        rho = np.where(hit, rho, 0.0)
        tile_max = rho.max(axis=1)
        for thresh in (0.5, 1.0, 2.0, 4.0):
            frac = float((tile_max < thresh).mean())
            print(f"tiles with max texel-rate < {thresh}: {frac:6.1%}",
                  flush=True)

        # (A gather+transpose-only probe was tried here and removed: its
        # dep_f reduction over the 109 MB qt intermediate — which
        # production consumes in-kernel instead — dominated the timing.)

    # 3. End-to-end sampled-shade stage both rates (sample only; the
    # fused kernel path is measured by bench stages).
    # Rate-reduced streams keep the standard (8, 128) tile shape (the
    # Pallas kernels hard-require it): every ``step``-th pixel, folded
    # back into full 1024-px tiles — same row count / coherence class
    # as an in-kernel even-x scheme, so the gather cost is the ceiling.
    def decim(step):
        nl2 = nl // step
        return (u[:, ::step].reshape(nl2, npx),
                v[:, ::step].reshape(nl2, npx))

    def sample_at(name, step):
        ud, vd = decim(step)

        def body(carry):
            out = tq.sample_material(
                mats, ud + carry, vd, s.tile_h, s.tile_w, use_pallas=True)
            dep = sum(dep_f(p) for p in out.values())
            return dep, (out["alb_r"][:1, :1],)

        timeit(name, scan8(body))

    # Row decimation (scanline interlace): drops every other TILE ROW
    # instead of every other pixel — the gather stream keeps full
    # x-adjacency, which 128 B-row gathers are sensitive to
    # (docs/PERFORMANCE.md coherence cliff).
    def decim_rows(step):
        nl2 = nl // step
        return (
            u.reshape(nl, s.tile_h, s.tile_w)[:, ::step, :]
            .reshape(nl2, npx),
            v.reshape(nl, s.tile_h, s.tile_w)[:, ::step, :]
            .reshape(nl2, npx),
        )

    def sample_rows_at(name, step):
        ud, vd = decim_rows(step)

        def body(carry):
            out = tq.sample_material(
                mats, ud + carry, vd, s.tile_h, s.tile_w, use_pallas=True)
            dep = sum(dep_f(p) for p in out.values())
            return dep, (out["alb_r"][:1, :1],)

        timeit(name, scan8(body))

    # Truncation control: HALF the tiles at FULL adjacency — separates
    # the query-count lever from any stream-adjacency sensitivity.
    def sample_trunc(name, frac):
        nt = int(nl * frac)
        ut, vt = u[:nt], v[:nt]

        def body(carry):
            out = tq.sample_material(
                mats, ut + carry, vt, s.tile_h, s.tile_w, use_pallas=True)
            dep = sum(dep_f(p) for p in out.values())
            return dep, (out["alb_r"][:1, :1],)

        timeit(name, scan8(body))

    for rep in (1, 2):
        print(f"-- pass {rep}", flush=True)
        sample_at("sample_material FULL", 1)
        sample_trunc("sample_material TRUNC 1/2 (control)", 0.5)
        sample_trunc("sample_material TRUNC 1/4 (control)", 0.25)
        sample_at("sample_material HALF (cols)", 2)
        sample_at("sample_material QUARTER (cols)", 4)
        sample_rows_at("sample_material HALF (rows)", 2)
        sample_rows_at("sample_material QUARTER (rows)", 4)

    # Reconstruct cost model: sample even-x, average neighbors for odd-x
    # entirely in XLA (the in-kernel version would be cheaper still).
    ud2, vd2 = decim(2)

    def recon_body(carry):
        out = tq.sample_material(
            mats, ud2 + carry, vd2, s.tile_h, s.tile_w, use_pallas=True)
        full = {}
        for kname, p in out.items():
            left = p.reshape(nl // 2 * 2, npx // 2)
            right = jnp.concatenate([left[:, 1:], left[:, -1:]], axis=1)
            mid = 0.5 * (left + right)
            full[kname] = jnp.stack([left, mid], axis=-1).reshape(nl, npx)
        dep = sum(dep_f(p) for p in full.values())
        return dep, (full["alb_r"][:1, :1],)

    timeit("sample HALF + XLA interleave reconstruct", scan8(recon_body))
    timeit("sample HALF + XLA interleave reconstruct (rep)", scan8(recon_body))


if __name__ == "__main__":
    main()
