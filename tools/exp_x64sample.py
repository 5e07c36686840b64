"""Why does config 4's standalone sample stage read 9 ms when the whole
frame is 13.2 ms? Cumulative in-chain deltas vs the frozen-stream stage,
occupancy, and coherence probes on the x64 compacted uv stream.

Run: python tools/exp_x64sample.py [n_instances]
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


def dep(x):
    return jnp.sum(x.astype(jnp.float32)) * jnp.float32(1e-30)


def main():
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 64
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
    from bibim_tpu.scene.culling import cull_scene_instances

    print(f"device: {jax.devices()[0]}, instances {n_inst}", flush=True)
    scene = ShaderBallScene(num_instances=n_inst)
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    data = scene.scene_data()
    data = cull_scene_instances(data, np.asarray(cam.get_view_matrix()),
                                np.asarray(proj))
    base = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                          show_gizmo=False, show_lights=False)
    s, _ = autotune_settings(data, vb, base, margin=1.05)
    live_cap = s.live_tile_cap
    mats = jax.device_put(material_quads_from_set(
        create_pbr_material_set(), scene.selected_material))
    blocks = [t for t in mats if isinstance(t, tq.BlockTable)]
    table = blocks[0]
    b = tq.BLOCK_B
    nbx = table.width // b

    def raster_compact(exposure):
        psoup = assemble_scene_planar(data.batches, view, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        px, _, _ = fused.raster_fused_pallas(
            rec, setup, WIDTH, HEIGHT, max_candidates=s.max_candidates,
            span_cap=s.span_cap, span_mid_cap=s.span_mid_cap,
            overflow_cap=s.overflow_cap, pair_budget=s.pair_budget,
            raster_tile_cap=s.raster_tile_cap, passes=s.raster_passes,
        )
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, live_cap)
        return (px.uv[0][ids] + exposure * 1e-20, px.uv[1][ids],
                px.tri_id[ids])

    # A: chain up to compacted uv
    def body_a(carry):
        u, v, tri = raster_compact(carry)
        return dep(u) + dep(v) + dep(tri), u[:1, :1]

    timeit("A raster+compact uv", scan8(body_a))

    # B: A + block-row gather only
    def gather_rows(u, v):
        fx = u.reshape(-1) * table.width - 0.5
        fy = v.reshape(-1) * table.height - 0.5
        xi = jnp.remainder(jnp.floor(fx).astype(jnp.int32), table.width)
        yi = jnp.remainder(jnp.floor(fy).astype(jnp.int32), table.height)
        return table.blocks[(yi // b) * nbx + (xi // b)]

    def body_b(carry):
        u, v, tri = raster_compact(carry)
        q = gather_rows(u, v)
        return dep(u) + dep(q), q[:1, :1]

    timeit("B  + block-row gather", scan8(body_b))

    # C: A + full pallas sample
    def body_c(carry):
        u, v, tri = raster_compact(carry)
        out = tq.sample_material(mats, u, v, 8, 128)
        d = dep(u) + sum(dep(o) for o in out.values())
        return d, out["roughness"][:1, :1]

    timeit("C  + full sample_material", scan8(body_c))

    # Frozen-stream variants
    fr = jax.jit(lambda: raster_compact(jnp.float32(0)))()
    u0, v0, tri0 = jax.device_put(jax.device_get(fr))
    cov = np.asarray(tri0 >= 0)
    print(f"frozen stream: {u0.shape}, covered {cov.sum()} / {cov.size} "
          f"({100 * cov.mean():.1f}%)", flush=True)
    def row_idx(u, v):
        xi = jnp.remainder(jnp.floor(u.reshape(-1) * table.width - 0.5
                                     ).astype(jnp.int32), table.width)
        yi = jnp.remainder(jnp.floor(v.reshape(-1) * table.height - 0.5
                                     ).astype(jnp.int32), table.height)
        return (yi // b) * nbx + (xi // b)

    idx_np = np.asarray(jax.device_get(jax.jit(row_idx)(u0, v0)))
    d = np.abs(np.diff(idx_np.astype(np.int64)))
    print(f"row-idx stream: unique {len(np.unique(idx_np))}; "
          f"|delta| P0/<=1/<=8/<=64 = {(d == 0).mean():.3f}/"
          f"{(d <= 1).mean():.3f}/{(d <= 8).mean():.3f}/"
          f"{(d <= 64).mean():.3f}", flush=True)
    dc = d[(cov.reshape(-1)[1:]) & (cov.reshape(-1)[:-1])]
    print(f"covered-only |delta| P0/<=1/<=8/<=64 = {(dc == 0).mean():.3f}/"
          f"{(dc <= 1).mean():.3f}/{(dc <= 8).mean():.3f}/"
          f"{(dc <= 64).mean():.3f}", flush=True)

    def body_f(carry):
        q = gather_rows(u0 + carry * 1e-20, v0)
        return dep(q), q[:1, :1]

    timeit("F frozen gather (profile-style)", scan8(body_f))

    # F2: frozen gather with uncovered uv forced to 0 (coherent rows)
    um = jnp.where(tri0 >= 0, u0, 0.0)
    vm = jnp.where(tri0 >= 0, v0, 0.0)

    def body_f2(carry):
        q = gather_rows(um + carry * 1e-20, vm)
        return dep(q), q[:1, :1]

    timeit("F2 frozen gather, uncovered uv=0", scan8(body_f2))

    # F3: chain B but with uncovered masked (production-realistic option)
    def body_b2(carry):
        u, v, tri = raster_compact(carry)
        u = jnp.where(tri >= 0, u, 0.0)
        v = jnp.where(tri >= 0, v, 0.0)
        q = gather_rows(u, v)
        return dep(u) + dep(q), q[:1, :1]

    timeit("B2 + gather, uncovered uv=0", scan8(body_b2))


if __name__ == "__main__":
    main()
