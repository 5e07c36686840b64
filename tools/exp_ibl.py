"""Where the config-5 IBL stage's ~6.3 ms goes at 4K — and whether a
factorized (separable row/column) one-hot select beats the flat
(rows, npx) one-hot for the 2048-row gloss table.

The small-table MXU kernel (texture_quad.sample_rows_small_pallas) builds
a (rows, npx) one-hot on the VPU and contracts it on the MXU. For the
32x64 gloss map the build is rows=2048 compares per pixel while the dot
is 16x2048x2 FLOP/px — comparable costs. Factorizing the select as
  stage 1 (MXU): contract the column axis W with a (W, npx) one-hot
               -> per-pixel (H*4C, npx) intermediate
  stage 2 (VPU): select the row axis H with H compare-FMA rows
cuts the VPU build from rows*npx to (W + H*4C_present)*npx at identical
MXU FLOPs. Exactness: u8 texels are bf16-exact, both one-hots are exact,
so the factorized result must be bitwise equal.

Components timed (scan harness, full-output carry chaining, real
compacted 4K slot planes):
  ibl_full        the whole ibl_ambient chain
  uv_math         normalize/reflect/equirect-uv (runs before sampling)
  sample_irr      512-row irradiance sample (flat one-hot kernel)
  sample_gloss    2048-row gloss sample (flat one-hot kernel)
  sample_rough    512-row rough sample (flat one-hot kernel)
  combine         post-sample Karis + lerp + kd/ks combine
  gloss_fact_gN   factorized-select gloss sample, g tiles/step

Run: python tools/exp_ibl.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCAN_ITERS = 8


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.ibl import _dir_to_uv, _sample_env, ibl_ambient, make_ibl
    from bibim_tpu.ops.shading_planar import dot3, normalize3
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.pipeline.framegraph import _assemble_and_raster
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
    base = RenderSettings(width=w, height=h, outputs="image", span_cap=32)
    data = scene.scene_data()
    s, _ = autotune_settings(data, vb, base, margin=1.05)
    ibl = jax.device_put(make_ibl())

    live_cap = s.live_tile_cap or (s.tiles_x * s.tiles_y)

    @jax.jit
    def probe(scene_data, view_block):
        px, _z, _d, _soup, _psoup = _assemble_and_raster(
            scene_data, view_block, s)
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, live_cap)
        return jax.tree_util.tree_map(lambda p: p[ids], px)

    px_c = probe(data, vb)
    nt, npx = px_c.uv[0].shape
    print(f"compacted slots: {nt} tiles x {npx} px = {nt * npx / 1e6:.2f} M",
          flush=True)

    # Synthetic material planes (perturbed through the carry, so nothing
    # is constant-folded).
    albedo = tuple(jnp.clip(px_c.uv[c % 2] * 0.5 + 0.25, 0.0, 1.0)
                   for c in range(3))
    met = jnp.clip(px_c.uv[0] * 0.3, 0.0, 1.0)
    rough = jnp.clip(px_c.uv[1] * 0.6 + 0.2, 0.04, 1.0)
    ao = jnp.ones_like(met)
    view_dir = tuple(vb.view_pos[c] - px_c.world[c] for c in range(3))

    def timed(name, make_body):
        @jax.jit
        def run():
            def step(carry, _):
                out = make_body(carry)
                leaves = jax.tree_util.tree_leaves(out)
                dep = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                return (dep * 1e-30).reshape(()), leaves[0].ravel()[:1]

            _, outs = lax.scan(step, jnp.float32(0), None,
                               length=SCAN_ITERS)
            return outs

        out = run()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = run()
        sync(out)
        ms = (time.perf_counter() - t0) / 4 / SCAN_ITERS * 1e3
        print(f"{name:24s} {ms:8.3f} ms", flush=True)
        return ms

    timed("ibl_full", lambda c: ibl_ambient(
        ibl, tuple(n + c for n in px_c.normal), view_dir, albedo, met,
        rough, ao, s.tile_h, s.tile_w, use_pallas=True))

    from bibim_tpu.ops.ibl import make_ibl_sh

    ibl_sh = jax.device_put(make_ibl_sh())
    timed("ibl_sh_full", lambda c: ibl_ambient(
        ibl_sh, tuple(n + c for n in px_c.normal), view_dir, albedo, met,
        rough, ao, s.tile_h, s.tile_w))

    def uv_math(c):
        n = normalize3(tuple(p + c for p in px_c.normal))
        v = normalize3(view_dir)
        ndv = jnp.maximum(dot3(n, v), 0.0)
        r = tuple(2.0 * ndv * n[k] - v[k] for k in range(3))
        ui, vi = _dir_to_uv(n)
        ur, vr = _dir_to_uv(normalize3(r))
        return ui, vi, ur, vr, ndv

    timed("uv_math", uv_math)

    ui, vi, ur, vr, ndv = jax.jit(uv_math)(jnp.float32(0))

    timed("sample_irr", lambda c: _sample_env(
        ibl.irradiance, ui + c, vi, ibl.hdr_scale, s.tile_h, s.tile_w, True))
    timed("sample_gloss", lambda c: _sample_env(
        ibl.spec_gloss, ur + c, vr, ibl.hdr_scale, s.tile_h, s.tile_w, True))
    timed("sample_rough", lambda c: _sample_env(
        ibl.spec_rough, ur + c, vr, ibl.hdr_scale, s.tile_h, s.tile_w, True))

    irr = jax.jit(lambda: _sample_env(ibl.irradiance, ui, vi, ibl.hdr_scale,
                                      s.tile_h, s.tile_w, True))()
    sg = jax.jit(lambda: _sample_env(ibl.spec_gloss, ur, vr, ibl.hdr_scale,
                                     s.tile_h, s.tile_w, True))()
    sr = jax.jit(lambda: _sample_env(ibl.spec_rough, ur, vr, ibl.hdr_scale,
                                     s.tile_h, s.tile_w, True))()

    def combine(c):
        ndv_c = ndv + c
        spec_env = tuple(sg[k] * (1.0 - rough) + sr[k] * rough
                         for k in range(3))
        f0 = tuple(0.04 * (1.0 - met) + albedo[k] * met for k in range(3))
        rx = rough * -1.0 + 1.0
        ry = rough * -0.0275 + 0.0425
        rz = rough * -0.572 + 1.04
        rw = rough * 0.022 - 0.04
        a004 = jnp.minimum(rx * rx, jnp.exp2(-9.28 * ndv_c)) * rx + ry
        brdf_scale = -1.04 * a004 + rz
        brdf_bias = jnp.maximum(1.04 * a004 + rw, 0.0)
        ks = tuple(f0[k] * brdf_scale + brdf_bias for k in range(3))
        kd = tuple((1.0 - f0[k]) * (1.0 - met) for k in range(3))
        return tuple((kd[k] * albedo[k] * irr[k] + spec_env[k] * ks[k]) * ao
                     for k in range(3))

    timed("combine", combine)

    # ---- Factorized-select gloss sample -----------------------------------
    table = None
    for t in ibl.spec_gloss:
        table = t
    H, W = table.height, table.width
    rows = H * W
    cpad = table.quads.shape[1] // 4
    present = table.present
    texT = (table.quads.astype(jnp.float32)
            .reshape(H, W, 4 * cpad).transpose(1, 0, 2)
            .reshape(W, H * 4 * cpad))

    def fact_kernel(idx_ref, tx_ref, ty_ref, texT_ref, *out_refs, g,
                    tile_h, tile_w):
        npx_k = g * tile_h * tile_w
        idx = idx_ref[...].reshape(1, npx_k)
        tx = tx_ref[...].reshape(1, npx_k)
        ty = ty_ref[...].reshape(1, npx_k)
        ix = idx % W
        iy = idx // W
        oh_x = (lax.broadcasted_iota(jnp.int32, (W, npx_k), 0)
                == ix).astype(jnp.float32)
        inter = lax.dot_general(
            texT_ref[:, :], oh_x,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H*4C, npx): inter[h*4C+j] = tex[h, ix, j]
        ohy = [(iy == hh).astype(jnp.float32) for hh in range(H)]

        def qrow(j):
            acc = inter[j:j + 1, :] * ohy[0]
            for hh in range(1, H):
                acc = acc + inter[hh * 4 * cpad + j:hh * 4 * cpad + j + 1,
                                  :] * ohy[hh]
            return acc

        def qf(tap, ci):
            return qrow(tap * cpad + ci) * (1.0 / 255.0)

        for k, out in enumerate(out_refs):
            out[...] = tq._blend(qf, tx, ty, k).reshape(g, tile_h, tile_w)

    def sample_fact(u, v, g):
        idx, tx, ty = tq._footprint(u, v, H, W)
        nt_pad = -(-nt // g) * g
        if nt_pad != nt:
            pad = ((0, nt_pad - nt), (0, 0))
            idx = jnp.pad(idx, pad)
            tx = jnp.pad(tx, pad)
            ty = jnp.pad(ty, pad)
        kernel = functools.partial(fact_kernel, g=g, tile_h=s.tile_h,
                                   tile_w=s.tile_w)
        plane = pl.BlockSpec((g, s.tile_h, s.tile_w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(nt_pad // g,),
            in_specs=[plane, plane, plane,
                      pl.BlockSpec(texT.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[plane] * len(present),
            out_shape=[jax.ShapeDtypeStruct((nt_pad, s.tile_h, s.tile_w),
                                            jnp.float32)] * len(present),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(idx.reshape(nt_pad, s.tile_h, s.tile_w),
          tx.reshape(nt_pad, s.tile_h, s.tile_w),
          ty.reshape(nt_pad, s.tile_h, s.tile_w),
          texT)
        return {sl: p.reshape(nt_pad, npx)[:nt]
                for sl, p in zip(present, out)}

    # Exactness vs the flat-one-hot kernel.
    ref = jax.jit(lambda: tq.sample_table_small_pallas(
        table, ur, vr, s.tile_h, s.tile_w))()
    got = jax.jit(lambda: sample_fact(ur, vr, 4))()
    for sl in present:
        np.testing.assert_array_equal(np.asarray(ref[sl]),
                                      np.asarray(got[sl]))
    print("factorized == flat one-hot: bitwise equal", flush=True)

    for g in (4, 8):
        timed(f"gloss_fact_g{g}",
              lambda c, g=g: sample_fact(ur + c, vr, g))


if __name__ == "__main__":
    main()
