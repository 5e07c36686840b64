"""A/B bigger tile GROUPS per raster-kernel grid step (VERDICT r2 1a).

docs/PERFORMANCE.md attributes ~1 ms of the headline kernel's ~2.3 ms
to per-step scheduling across 128 steps (1024 compacted slots / group
8). Fewer, fatter steps amortize that fixed cost further — IF the
double-buffered record slab still fits scoped VMEM and Mosaic doesn't
choke on the group-unrolled resolve. This probes group = 8 (baseline),
16, 32 on the production raster stage, plus merged_coverage at each
group (one fori_loop per step — trip count is the group max, which the
count-sorted slots keep near the mean; bigger groups widen the spread).

Run: python tools/exp_steps.py [n_instances ...] (default: 1 64)
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


def run_config(n_inst: int):
    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    print(f"--- instances: {n_inst}", flush=True)
    scene = ShaderBallScene(num_instances=n_inst)
    cam = (FreeLookCamera() if n_inst == 1
           else FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32)))
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    data = scene.scene_data()
    if n_inst > 1:
        data = cull_scene_instances(data, np.asarray(view), np.asarray(proj))
    s, _ = autotune_settings(
        data, vb, RenderSettings(width=WIDTH, height=HEIGHT,
                                 outputs="image"),
        margin=1.05,
    )
    print("derived:", {k: getattr(s, k) for k in (
        "max_candidates", "raster_passes", "raster_tile_cap",
        "dense_tile_cap", "overflow_cap")}, flush=True)

    def geom(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        return rec, setup

    rec, setup = jax.jit(geom)(view)
    kw = dict(
        max_candidates=s.max_candidates, span_cap=s.span_cap,
        span_mid_cap=s.span_mid_cap, overflow_cap=s.overflow_cap,
        pair_budget=s.pair_budget, raster_tile_cap=s.raster_tile_cap,
        dense_tile_cap=s.dense_tile_cap, passes=s.raster_passes,
        drop_fields=("depth", "cr", "cg", "cb", "matf", "b0", "b1"),
    )

    def raster_at(name, sizes, slab_mb, vmem_mb, **over):
        old = (fused.GROUP_SIZES, fused.GROUP_SLAB_BYTES,
               fused.GROUP_VMEM_LIMIT)
        fused.GROUP_SIZES = sizes
        fused.GROUP_SLAB_BYTES = slab_mb << 20
        fused.GROUP_VMEM_LIMIT = (vmem_mb << 20) if vmem_mb else None
        try:
            def body(carry):
                px, zkey, diag = fused.raster_fused_pallas(
                    rec * (1.0 + carry), setup, WIDTH, HEIGHT, **kw, **over)
                dep = dep_f(zkey.astype(jnp.float32)) + sum(
                    dep_f(leaf) for leaf in jax.tree_util.tree_leaves(px)
                ) + sum(
                    dep_f(leaf.astype(jnp.float32))
                    for leaf in jax.tree_util.tree_leaves(diag)
                )
                return dep.astype(jnp.float32), (zkey[:1, :1], px.uv[0])

            return timeit(name, scan8(body))
        except Exception as e:  # Mosaic VMEM blowups are data, not bugs
            print(f"{name:56s}   FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            return None
        finally:
            (fused.GROUP_SIZES, fused.GROUP_SLAB_BYTES,
             fused.GROUP_VMEM_LIMIT) = old

    base = raster_at("group 8 (baseline)", (8, 4, 2, 1), 6, 0)
    ref_uv = np.asarray(base[1][1][-1])

    for g, slab, vmem in ((16, 16, 64), (32, 32, 100)):
        for merged in (False, True):
            tag = f"group {g}" + (" merged" if merged else "")
            out = raster_at(tag, (g, 8, 4, 2, 1), slab, vmem,
                            merged_coverage=merged)
            if out is not None:
                got = np.asarray(out[1][1][-1])
                ok = ("bit-exact" if np.array_equal(got, ref_uv)
                      else "DIFFERS!")
                print(f"    uv vs baseline: {ok}", flush=True)


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    insts = [int(a) for a in sys.argv[1:]] or [1, 64]
    for n in insts:
        run_config(n)


if __name__ == "__main__":
    main()
