"""Measure packed shadow-PCF gather variants on the REAL config-5 stream.

The PCF tap gathers from the (S², 4) f32 quad table — S=1024 puts it at
2^20 rows, above the ~4.5 ns/row fast regime (CLAUDE.md rule 1). Packing
p texel-neighborhoods per row shrinks the table to S²/p rows at
2·(p+1)·4 B/row (40 B for p=4 — below the 64 B coherence cliff measured
for 128 B f32 rows), at the cost of an in-row select per tap.

Times, on the real compacted 4K slot stream (dispatch loop, 20 iters):
  V0  current (S², 4) f32 quad rows
  V2  p=2: (S²/2, 8) f32 rows  [a0 a1 a2 _  b0 b1 b2 _]
  V4  p=4: (S²/4, 12) f32 rows [a0..a4 _ b0..b4 _]
each including the FULL bilinear-PCF arithmetic + select chains, reduced
to one scalar (no DCE), indices fed as device arrays.

Run: python tools/exp_shadowpack.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax

    np.asarray(jax.device_get(x.ravel()[:1]))


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

    w, h = 3840, 2160
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
    s = settings.shadow_size

    @jax.jit
    def probe(scene_data, view_block):
        px, _zkey, _diag, _soup, psoup = _assemble_and_raster(
            scene_data, view_block, settings
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, settings.live_tile_cap)
        wx, wy, wz = (p[ids] for p in px.world)
        smap, _sh = _shadow_map_planar(psoup, scene_data.lights, settings)
        vp = smap.light_vp
        cx = vp[0, 0] * wx + vp[0, 1] * wy + vp[0, 2] * wz + vp[0, 3]
        cy = vp[1, 0] * wx + vp[1, 1] * wy + vp[1, 2] * wz + vp[1, 3]
        cz = vp[2, 0] * wx + vp[2, 1] * wy + vp[2, 2] * wz + vp[2, 3]
        fx = (cx * 0.5 + 0.5) * s - 0.5
        fy = (cy * 0.5 + 0.5) * s - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, s - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, s - 1)
        inside = (
            (cx >= -1.0) & (cx <= 1.0) & (cy >= -1.0) & (cy <= 1.0)
            & (cz >= 0.0) & (cz <= 1.0)
        )
        d_img = smap.quads[:, 0].reshape(s, s)
        return x0i, y0i, tx, ty, cz + settings.shadow_bias, inside, d_img

    x0, y0, tx, ty, ref, inside, d_dev = probe(data, vb)
    # Re-put as plain input arrays (no residency games).
    x0, y0, tx, ty, ref, inside = (
        jax.device_put(np.asarray(jax.device_get(a)))
        for a in (x0, y0, tx, ty, ref, inside))
    d = np.asarray(jax.device_get(d_dev))
    n = x0.size
    print(f"slots={n} shadow_size={s}", flush=True)

    # ---- build the three tables on the host ----
    def nb(y, x):
        """d at clamped (y, x) — vectorized over index grids."""
        return d[np.minimum(y, s - 1), np.minimum(x, s - 1)]

    yy, xx = np.mgrid[0:s, 0:s]
    quads = np.stack([nb(yy, xx), nb(yy, xx + 1),
                      nb(yy + 1, xx), nb(yy + 1, xx + 1)],
                     axis=-1).reshape(s * s, 4)

    def packed(p, width):
        xb = np.arange(0, s, p)
        yyp, xxp = np.mgrid[0:s, 0:len(xb)]
        rows = np.zeros((s, len(xb), width), np.float32)
        for j in range(p + 1):
            rows[:, :, j] = nb(yyp, xxp * p + j)
            rows[:, :, (width // 2) + j] = nb(yyp + 1, xxp * p + j)
        return rows.reshape(s * (s // p), width)

    pack2 = packed(2, 8)
    pack4 = packed(4, 12)

    t_quads = jax.device_put(quads.astype(np.float32))
    t_p2 = jax.device_put(pack2)
    t_p4 = jax.device_put(pack4)

    def pcf(q00, q01, q10, q11):
        lit = lambda q: (q <= ref).astype(jnp.float32)
        top = lit(q00) * (1.0 - tx) + lit(q01) * tx
        bot = lit(q10) * (1.0 - tx) + lit(q11) * tx
        vis = top * (1.0 - ty) + bot * ty
        return jnp.sum(jnp.where(inside, vis, 1.0))

    @jax.jit
    def v0(t):
        q = t[(y0 * s + x0).reshape(-1)].reshape(x0.shape + (4,))
        return pcf(q[..., 0], q[..., 1], q[..., 2], q[..., 3])

    def make_packed_fn(p, width):
        half = width // 2

        @jax.jit
        def vp_fn(t):
            idx = (y0 * (s // p) + (x0 >> int(np.log2(p)))).reshape(-1)
            q = t[idx].reshape(x0.shape + (width,))
            o = x0 & (p - 1)

            def sel(base):
                acc = jnp.zeros_like(tx)
                for k in range(p):
                    acc = jnp.where(o == k, q[..., base + k], acc)
                return acc

            def sel1(base):
                acc = jnp.zeros_like(tx)
                for k in range(p):
                    acc = jnp.where(o == k, q[..., base + k + 1], acc)
                return acc

            return pcf(sel(0), sel1(0), sel(half), sel1(half))

        return vp_fn

    v2 = make_packed_fn(2, 8)
    v4 = make_packed_fn(4, 12)

    ref_vals = {}
    for name, fn, t in (("V0 quad 2^20x16B", v0, t_quads),
                        ("V2 p2   2^19x32B", v2, t_p2),
                        ("V4 p4   2^18x48B", v4, t_p4)):
        out = fn(t)
        sync(out)
        ref_vals[name] = float(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(t)
        sync(out)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{name}: {ms:8.3f} ms ({ms * 1e6 / n:.2f} ns/slot) "
              f"sum={float(out):.1f}", flush=True)
    vals = list(ref_vals.values())
    print(f"agreement: max|dv|={max(abs(v - vals[0]) for v in vals):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
