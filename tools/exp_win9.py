"""Wide-window exact quad sampling feasibility probe.

Tile-routed exact quad sampling died at the headline camera: 93% of LIVE
tiles contain at least one group whose footprint escapes the 5×5 shared
window (BENCH r4a: routing cost +0.3 ms for nothing). A (B+1+E)² window
at the same stride-4 anchors covers group spreads up to 3+E − (m%4)
waste: at E=4 (9×9 taps) any spread ≤ 4 is exact — and the measured
texel rate is ρ ≈ 2-4. Two questions decide feasibility:

1. ESCAPE: what fraction of covered groups / live tiles still escape a
   7×7 / 9×9 window on the real frame?
2. GATHER: what does the quad-rate row gather cost at 256 B / 384 B /
   512 B rows (the 9×9 table needs 324→384 B) on the REAL rep-row
   stream vs the current 128 B?

Run: python tools/exp_win9.py [--stretch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.texture_quad import (
        BLOCK_B, _footprint_ints, _rep_min, pair_factors,
    )
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.pipeline.framegraph import _assemble_and_raster
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    stretch = "--stretch" in sys.argv
    width, height = (3840, 2160) if stretch else (1920, 1080)
    h = w = 2048
    print(f"device: {jax.devices()[0]}  {width}x{height}", flush=True)

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    base = RenderSettings(width=width, height=height, outputs="image")
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, width / height, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    data = scene.scene_data()
    s, _ = autotune_settings(data, vb, base, margin=1.05)

    pair = 2
    ry, rx = pair_factors(pair)
    b = BLOCK_B

    @jax.jit
    def reps():
        px, *_ = _assemble_and_raster(data, vb, s)
        valid = px.tri_id >= 0
        u, v = px.uv
        nt, npx = u.shape
        live = jnp.any(valid, axis=1)
        ids, _ = fused._compact_tile_list(live, min(nt, 4096))
        u, v, valid = u[ids], v[ids], valid[ids]
        ntc = u.shape[0]
        x0i, y0i, _, _ = _footprint_ints(u, v, h, w)
        rows = npx // s.tile_w
        hp = rows // ry

        def groups(p):
            return p.reshape(ntc, hp, ry, s.tile_w // rx, rx)

        x0p, y0p, vp = groups(x0i), groups(y0i), groups(valid)
        xr = _rep_min(x0p, vp)
        yr = _rep_min(y0p, vp)
        bx, by = (xr // b) * b, (yr // b) * b
        out = {"rep_rows": (yr // b) * (w // b) + (xr // b),
               "live": jnp.sum(live)}
        for ext in (0, 2, 4, 6):
            esc = None
            anyv = None
            for i in range(ry):
                for j in range(rx):
                    cx = jnp.remainder(
                        x0p[:, :, i, :, j] - bx + w // 2, w) - w // 2
                    cy = jnp.remainder(
                        y0p[:, :, i, :, j] - by + h // 2, h) - h // 2
                    inw = ((cx >= 0) & (cx <= b - 1 + ext)
                           & (cy >= 0) & (cy <= b - 1 + ext))
                    e = vp[:, :, i, :, j] & ~inw
                    vv = vp[:, :, i, :, j]
                    esc = e if esc is None else (esc | e)
                    anyv = vv if anyv is None else (anyv | vv)
            out[f"esc{5 + ext}"] = jnp.sum(esc)
            out[f"cov{5 + ext}"] = jnp.sum(anyv)
            out[f"etile{5 + ext}"] = jnp.sum(jnp.any(
                esc.reshape(esc.shape[0], -1), axis=1))
        return out

    r = jax.device_get(reps())
    live = int(r["live"])
    print(f"live tiles {live}")
    for ext in (0, 2, 4, 6):
        win = 5 + ext
        e, c, t = (int(r[f"esc{win}"]), int(r[f"cov{win}"]),
                   int(r[f"etile{win}"]))
        print(f"win {win}x{win}: esc groups {e}/{c} "
              f"({100.0 * e / max(c, 1):.2f}%)  esc tiles {t}/{live} "
              f"({100.0 * t / max(live, 1):.1f}%)", flush=True)

    # Gather-rate sweep on the REAL rep-row stream.
    rep_rows = jnp.asarray(np.asarray(r["rep_rows"]).reshape(-1))
    nq = rep_rows.shape[0]
    nrows = (h // b) * (w // b)
    for lanes, label in ((32, "128B"), (64, "256B"), (96, "384B"),
                         (128, "512B")):
        tab = jnp.arange(nrows * lanes, dtype=jnp.int32).reshape(
            nrows, lanes)

        @jax.jit
        def g(idx, tab=tab):
            def step(carry, _):
                rows = tab[(idx + carry) % nrows]
                red = jnp.sum(rows, dtype=jnp.int32)
                return red & 1, red
            _, outs = jax.lax.scan(step, jnp.int32(0), None, length=8)
            return outs

        out = g(rep_rows)
        np.asarray(jax.device_get(out))[:1]
        t0 = time.perf_counter()
        for _ in range(4):
            out = g(rep_rows)
        np.asarray(jax.device_get(out).ravel()[:1])
        dt = (time.perf_counter() - t0) / 4 / 8
        print(f"gather {label}: {dt * 1e3:.3f} ms for {nq} rows "
              f"({dt / nq * 1e9:.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
