"""Measure pair/quad-rate sampling WINDOW ESCAPES on the real headline
frame: the pixels whose bilinear footprint falls outside their group
rep's gathered (B+1)^2 texel window (ops/texture_quad.block_prep
pair_rows) and therefore get edge-clamped taps — the only pixels that
are not bit-exact. An exact-residual design needs: how many escape, and
how they cluster (per tile / per group) so the compaction level and
capacity can be chosen from data.

Run: python tools/exp_escape.py [width height] [--stretch]
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def escape_masks(u, v, valid, h, w, pair_rows, tile_w):
    """Replicates block_prep's window math; returns (escape, any_v) at
    pixel rate in GROUP-major layout plus group shape info."""
    from bibim_tpu.ops.texture_quad import BLOCK_B, pair_factors

    b = BLOCK_B
    nt, npx = u.shape
    ry, rx = pair_factors(pair_rows)
    uf = u.reshape(-1)
    vf = v.reshape(-1)
    fx = uf * w - 0.5
    fy = vf * h - 0.5
    x0i = jnp.remainder(jnp.floor(fx).astype(jnp.int32), w)
    y0i = jnp.remainder(jnp.floor(fy).astype(jnp.int32), h)
    rows = npx // tile_w
    hp, wp = rows // ry, tile_w // rx

    def groups(p):
        return p.reshape(nt, hp, ry, wp, rx)

    x0p, y0p = groups(x0i.reshape(nt, npx)), groups(y0i.reshape(nt, npx))
    vp = groups(valid.reshape(nt, npx))
    members = [(i, j) for i in range(ry) for j in range(rx)]
    big = jnp.int32(1 << 30)

    def rep(p):
        mn_cov = jnp.full((nt, hp, wp), big)
        mn_all = None
        anyv = jnp.zeros((nt, hp, wp), jnp.bool_)
        for i, j in members:
            m, vm = p[:, :, i, :, j], vp[:, :, i, :, j]
            mn_cov = jnp.minimum(mn_cov, jnp.where(vm, m, big))
            mn_all = m if mn_all is None else jnp.minimum(mn_all, m)
            anyv = anyv | vm
        return jnp.where(anyv, mn_cov, mn_all), anyv

    xr, anyv = rep(x0p)
    yr, _ = rep(y0p)
    bx = (xr // b) * b
    by = (yr // b) * b
    esc = jnp.zeros((nt, hp, wp), jnp.bool_)
    for i, j in members:
        cx = jnp.remainder(x0p[:, :, i, :, j] - bx + w // 2, w) - w // 2
        cy = jnp.remainder(y0p[:, :, i, :, j] - by + h // 2, h) - h // 2
        inw = (cx >= 0) & (cx <= b - 1) & (cy >= 0) & (cy <= b - 1)
        esc = esc | (vp[:, :, i, :, j] & ~inw)
    return esc, anyv  # per GROUP: any member escapes / any member covered


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.pipeline.framegraph import _assemble_and_raster
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    stretch = "--stretch" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    width = int(argv[0]) if argv else (3840 if stretch else 1920)
    height = int(argv[1]) if len(argv) > 1 else (2160 if stretch else 1080)
    print(f"device: {jax.devices()[0]}  {width}x{height}", flush=True)

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    base = RenderSettings(width=width, height=height, outputs="image",
                          overlay_candidates=256, overlay_max_tiles=384)
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, width / height, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    data = scene.scene_data()
    s, _ = autotune_settings(data, vb, base, margin=1.05)

    @jax.jit
    def probe():
        px, zkey, diag, soup, psoup = _assemble_and_raster(data, vb, s)
        valid = px.tri_id >= 0
        u, v = px.uv
        out = {"covered": jnp.sum(valid), "slots": valid.size}
        for level in (1, 2):
            esc, anyv = escape_masks(u, v, valid, 2048, 2048, level,
                                     s.tile_w)
            # per-tile escape-group counts
            per_tile = jnp.sum(esc.reshape(esc.shape[0], -1), axis=1)
            out[f"esc_groups_{level}"] = jnp.sum(esc)
            out[f"cov_groups_{level}"] = jnp.sum(anyv)
            out[f"tiles_with_esc_{level}"] = jnp.sum(per_tile > 0)
            out[f"per_tile_{level}"] = per_tile
        out["n_tiles"] = px.tri_id.shape[0]
        return out

    r = jax.device_get(probe())
    cov = int(r["covered"])
    print(f"slots={int(r['slots'])} covered={cov} "
          f"({100.0 * cov / int(r['slots']):.1f}%) tiles={int(r['n_tiles'])}")
    for level, name in ((1, "pair"), (2, "quad")):
        eg = int(r[f"esc_groups_{level}"])
        cg = int(r[f"cov_groups_{level}"])
        tw = int(r[f"tiles_with_esc_{level}"])
        pt = np.asarray(r[f"per_tile_{level}"])
        ry, rx = (2, 1) if level == 1 else (2, 2)
        gsz = ry * rx
        print(f"[{name}] esc groups {eg}/{cg} covered groups "
              f"({100.0 * eg / max(cg, 1):.2f}%)  "
              f"<= {eg * gsz} px ({100.0 * eg * gsz / max(cov, 1):.2f}% of "
              f"covered)")
        print(f"       tiles with any escape: {tw}/{len(pt)} "
              f"({100.0 * tw / len(pt):.1f}%)  per-tile esc-group "
              f"max={int(pt.max())} p50={int(np.median(pt[pt > 0])) if tw else 0} "
              f"p90={int(np.percentile(pt[pt > 0], 90)) if tw else 0}")


if __name__ == "__main__":
    main()
