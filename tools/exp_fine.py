"""Measure the fine-subtile raster kernel (fine_bins) on config 4 (x64).

tools/exp_trisize.py: 95% of config 4's binned pairs come from
sub-16x8-px triangles, and tools/exp_x64raster.py puts the prod raster
stage at 5.56 ms (binning 1.55 + kernel ~3.9). The fine path bins at
16-px subtile granularity and tests each subtile's candidates against
only its 128 pixels — per-candidate coverage cost /8 at ~1.3-2x the
pair count. This sweeps cap shapes and prints the measured stage time
plus drop diagnostics for deriving production caps.

Run: python tools/exp_fine.py [n_instances]
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
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    print(f"device: {jax.devices()[0]}, instances: {n_inst}", flush=True)
    scene = ShaderBallScene(num_instances=n_inst)
    cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    data = scene.scene_data()
    data = cull_scene_instances(data, np.asarray(view), np.asarray(proj))
    s, probe = autotune_settings(
        data, vb, RenderSettings(width=WIDTH, height=HEIGHT,
                                 outputs="image"),
        margin=1.05,
    )
    print("derived (coarse):", {k: getattr(s, k) for k in (
        "max_candidates", "raster_passes", "span_cap", "span_mid_cap",
        "overflow_cap", "pair_budget", "raster_tile_cap",
        "dense_tile_cap")}, flush=True)

    def geom(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        return rec, setup

    rec, setup = jax.jit(geom)(view)

    def raster_at(name, fine=False, **over):
        kw = dict(
            max_candidates=s.max_candidates, span_cap=s.span_cap,
            span_mid_cap=s.span_mid_cap, overflow_cap=s.overflow_cap,
            pair_budget=s.pair_budget, raster_tile_cap=s.raster_tile_cap,
            dense_tile_cap=s.dense_tile_cap, passes=s.raster_passes,
            drop_fields=("depth", "cr", "cg", "cb", "matf", "b0", "b1"),
        )
        kw.update(over)

        def body(carry):
            px, zkey, diag = fused.raster_fused_pallas(
                rec * (1.0 + carry), setup, WIDTH, HEIGHT,
                fine_bins=fine, **kw)
            # Carry depends on EVERY output leaf (px fields + zkey +
            # diag): a uv-only carry lets XLA DCE the transpose/scatter
            # chains of the other emitted planes — CLAUDE.md rule 8.
            dep = dep_f(zkey.astype(jnp.float32)) + sum(
                dep_f(leaf) for leaf in jax.tree_util.tree_leaves(px)
            ) + sum(
                dep_f(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(diag)
            )
            return dep.astype(jnp.float32), (zkey[:1, :1], diag)

        out = timeit(name, scan8(body))
        diag = jax.tree_util.tree_map(lambda x: np.asarray(x[-1]), out[1])
        print(f"    diag: {diag}", flush=True)

    raster_at("coarse raster (prod caps)")
    # Fine binning inflates pair/window counts (a tri pairs once per
    # 16-px subtile it overlaps): wider budgets, same window semantics.
    fine_kw = dict(span_cap=16, span_mid_cap=2048,
                   pair_budget=max(s.pair_budget * 2, 262144))
    raster_at("fine raster (coarse windows)", fine=True, **fine_kw)
    raster_at("fine raster maxc=768", fine=True, max_candidates=768,
              **fine_kw)
    raster_at("fine raster maxc=768 p4 dense=192", fine=True,
              max_candidates=768, passes=4, dense_tile_cap=192, **fine_kw)
    raster_at("fine raster maxc=1024 p3 dense=192", fine=True,
              max_candidates=1024, passes=3, dense_tile_cap=192, **fine_kw)


if __name__ == "__main__":
    main()
