"""Measure the shadow-PCF tile-classification opportunity (config 5).

The 4K stretch config pays one ~4.4 ns row gather per compacted slot for
PCF (ops/shadow.py shadow_factor). Idea: classify each live tile (or
8×128 sub-row) as trivially-lit / trivially-occluded / mixed using a
conservative min/max query over its shadow-map footprint, and run the
fine per-slot gather only on the mixed groups (compact-list pattern).

This tool runs the REAL config-5 raster + shadow map once, ships the
per-slot light-space coordinates to the host, and reports — at tile and
sub-row granularity, with exact-rect and mip-4-cell-conservative
min/max — what fraction of the PCF gather a classifier would skip.

Run: python tools/exp_shadowclass.py [width height]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.pipeline.framegraph import (
        _assemble_and_raster,
        _shadow_map_planar,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    w = int(sys.argv[1]) if len(sys.argv) > 2 else 3840
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 2160
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    base = RenderSettings(width=w, height=h, outputs="image",
                          enable_shadows=True, enable_ibl=True,
                          span_cap=32,
                          shadow_candidates=2048, shadow_passes=3,
                          overlay_max_tiles=1024)
    data = scene.scene_data()
    settings, _ = autotune_settings(data, vb, base, margin=1.05)
    print(f"live_tile_cap={settings.live_tile_cap} "
          f"shadow_size={settings.shadow_size}", flush=True)

    @jax.jit
    def probe(scene_data, view_block):
        px, _zkey, _diag, _soup, psoup = _assemble_and_raster(
            scene_data, view_block, settings
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _dropped = fused._compact_tile_list(
            live, settings.live_tile_cap
        )
        wx, wy, wz = (p[ids] for p in px.world)
        valid = (px.tri_id >= 0)[ids]
        smap, _sh_diag = _shadow_map_planar(psoup, scene_data.lights,
                                            settings)
        s = smap.size
        vp = smap.light_vp
        cx = vp[0, 0] * wx + vp[0, 1] * wy + vp[0, 2] * wz + vp[0, 3]
        cy = vp[1, 0] * wx + vp[1, 1] * wy + vp[1, 2] * wz + vp[1, 3]
        cz = vp[2, 0] * wx + vp[2, 1] * wy + vp[2, 2] * wz + vp[2, 3]
        fx = (cx * 0.5 + 0.5) * s - 0.5
        fy = (cy * 0.5 + 0.5) * s - 0.5
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, s - 1)
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, s - 1)
        ref = cz + settings.shadow_bias
        inside = (
            (cx >= -1.0) & (cx <= 1.0) & (cy >= -1.0) & (cy <= 1.0)
            & (cz >= 0.0) & (cz <= 1.0)
        )
        d_img = smap.quads[:, 0].reshape(s, s)
        return (x0.astype(jnp.int16), y0.astype(jnp.int16),
                ref.astype(jnp.float32), inside, valid, d_img)

    x0, y0, ref, inside, valid, d = (np.asarray(a) for a in
                                     probe(data, vb))
    s = d.shape[0]
    nt, npx = x0.shape
    print(f"slots={nt * npx} covered={int(valid.sum())}", flush=True)

    # min/max mip chains of the raw depth image (level 0 = d).
    mins, maxs = [d], [d]
    while mins[-1].shape[0] > 1:
        a = mins[-1]
        mins.append(np.minimum.reduceat(
            np.minimum.reduceat(a, np.arange(0, a.shape[0], 2), axis=0),
            np.arange(0, a.shape[1], 2), axis=1))
        b = maxs[-1]
        maxs.append(np.maximum.reduceat(
            np.maximum.reduceat(b, np.arange(0, b.shape[0], 2), axis=0),
            np.arange(0, b.shape[1], 2), axis=1))

    def classify(group_slots):
        """Classify groups of `group_slots` consecutive slots per tile."""
        g = npx // group_slots
        X0 = x0.reshape(nt * g, group_slots)
        Y0 = y0.reshape(nt * g, group_slots)
        R = ref.reshape(nt * g, group_slots)
        IN = (inside & valid).reshape(nt * g, group_slots)
        V = valid.reshape(nt * g, group_slots)
        any_in = IN.any(axis=1)
        all_in = (~V | IN).all(axis=1)  # every valid slot is inside

        big = np.float64(1e30)
        xlo = np.where(IN, X0, big).min(axis=1).astype(np.int64)
        xhi = np.minimum(np.where(IN, X0, -big).max(axis=1) + 1,
                         s - 1).astype(np.int64)
        ylo = np.where(IN, Y0, big).min(axis=1).astype(np.int64)
        yhi = np.minimum(np.where(IN, Y0, -big).max(axis=1) + 1,
                         s - 1).astype(np.int64)
        rmin = np.where(IN, R, big).min(axis=1)
        rmax = np.where(IN, R, -big).max(axis=1)

        out = {}
        for mode in ("exact", "mip"):
            lit = np.zeros(nt * g, bool)
            occ = np.zeros(nt * g, bool)
            for i in np.nonzero(any_in)[0]:
                if mode == "exact":
                    blk = d[ylo[i]:yhi[i] + 1, xlo[i]:xhi[i] + 1]
                    dmin, dmax = blk.min(), blk.max()
                else:
                    span = max(xhi[i] - xlo[i] + 1, yhi[i] - ylo[i] + 1)
                    lv = min(int(np.ceil(np.log2(span))) if span > 1
                             else 0, len(mins) - 1)
                    c0x, c1x = xlo[i] >> lv, xhi[i] >> lv
                    c0y, c1y = ylo[i] >> lv, yhi[i] >> lv
                    dmin = mins[lv][c0y:c1y + 1, c0x:c1x + 1].min()
                    dmax = maxs[lv][c0y:c1y + 1, c0x:c1x + 1].max()
                lit[i] = dmax <= rmin[i]
                occ[i] = all_in[i] and dmin > rmax[i]
            lit |= ~any_in  # no inside slots → fully lit
            mixed = ~(lit | occ)
            out[mode] = (lit.mean(), occ.mean(), mixed.mean())
            print(f"  group={group_slots:4d} {mode:5s}: "
                  f"lit {lit.mean():6.1%}  occ {occ.mean():6.1%}  "
                  f"mixed {mixed.mean():6.1%}  "
                  f"(PCF gather kept: {mixed.mean():6.1%})", flush=True)
        return out

    for gs in (1024, 128):
        classify(gs)


if __name__ == "__main__":
    main()
