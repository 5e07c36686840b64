"""Config-2 (textured cube, trilinear mips, 720p) stage decomposition.

The scene is 24 triangles, yet BENCH r2 reports ~12 ms — the raster is
trivial, so the cost must be in the trilinear multi-material sampler or
the per-pixel machinery around it. Scan-amortized honest timings.

Run: python tools/exp_cube.py
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

W, H = 1280, 720
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
    print(f"{name:52s} {dt:9.3f} ms", flush=True)
    return out


def scan8(body):
    @jax.jit
    def run():
        def step(carry, _):
            return body(carry)

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, render_frame,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera
    from bibim_tpu.scene.cube import CubeScene, cube_scene_materials

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = CubeScene()
    data = scene.scene_data()
    mats = jax.device_put(cube_scene_materials(with_mips=True))
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, W / H, 0.1, 1000.0)
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    base = RenderSettings(width=W, height=H, outputs="image",
                          batch_material_ids=scene.material_ids,
                          show_gizmo=False, show_lights=False)
    settings, probe = autotune_settings(data, vb, base, margin=1.05)
    print("probe:", probe, flush=True)
    for t in mats:
        print("table:", type(t).__name__, t.quads.shape, t.quads.dtype,
              "paired" if getattr(t, "paired", False) else "", t.present,
              flush=True)

    def frame_body(carry):
        out = render_frame(
            data, vb, FrameParams(fp.enable_tone_mapping,
                                  fp.exposure + carry),
            mats, None, settings,
        )
        img = out["image"]
        dep = (jnp.sum(img, dtype=jnp.int32) & 1).astype(jnp.float32)
        return dep * 1e-30, img[:1, :1]

    timeit("full frame (scan-honest)", scan8(frame_body))

    # raster + compact
    live_cap = settings.live_tile_cap or (settings.tiles_x
                                          * settings.tiles_y)

    def raster(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj,
                                      settings.batch_material_ids)
        setup = triangle_setup_planar(psoup.clip, W, H)
        rec = fused.build_record_table_planar(setup, psoup)
        px, zkey, diag = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=settings.max_candidates,
            span_cap=settings.span_cap, overflow_cap=settings.overflow_cap,
            pair_budget=settings.pair_budget,
            raster_tile_cap=settings.raster_tile_cap,
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, live_cap)
        return jax.tree_util.tree_map(lambda p: p[ids], px)

    def raster_body(carry):
        px = raster(view + carry)
        dep = sum(jnp.sum(leaf.astype(jnp.float32))
                  for leaf in jax.tree_util.tree_leaves(px))
        return dep * 1e-30, px.depth[:1, :1]

    timeit("geom+raster+compact", scan8(raster_body))

    px = jax.jit(raster)(view)
    u, v, mid = px.uv[0], px.uv[1], px.mat_id
    print(f"compact slots: {u.shape}", flush=True)

    def sample_body(carry):
        out = tq.sample_material_mips_multi(mats, mid, u + carry, v, 8, 128)
        dep = sum(jnp.sum(p) for p in out.values())
        return dep * 1e-30, out["alb_r"][:1, :1]

    timeit("trilinear multi sample (all slots)", scan8(sample_body))

    # gather-only: the merged paired table row fetch
    big = [t for t in mats if t.quads.shape[0] > 4096]
    if big:
        t0 = big[0]
        rows = t0.quads.shape[0]

        def gather_body(carry):
            n = u.size
            idx = (jnp.arange(n, dtype=jnp.int32) * 7919) % rows
            q = t0.quads[idx + jnp.minimum(carry.astype(jnp.int32), 0)]
            s = jnp.sum(q[:, :1].astype(jnp.float32), dtype=jnp.float32)
            return s * 1e-30, s

        timeit(f"  gather-only ({rows//1024}k rows x "
               f"{t0.quads.shape[1]}B-ish)", scan8(gather_body))

    # LOD plane math alone
    def lod_body(carry):
        l = tq.quad_lod_planar(u + carry, v, 8, 128, 2048, 2048)
        return jnp.sum(l) * 1e-30, l[:1, :1]

    timeit("quad_lod_planar", scan8(lod_body))


if __name__ == "__main__":
    main()
