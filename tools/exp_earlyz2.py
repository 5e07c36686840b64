"""Early-z raster timing on the real TPU (VERDICT r4 lever #2).

Times the production-autotuned raster against early-z variants on the
headline (and --x64) scene. Early-z is mutually exclusive with the
group-window kernel and fine_bins (raster_fused_pallas guard), so the
early-z rows force those off — the question is whether near-first
candidate order + the remaining-work break beats the group-window
schedule it replaces. Also checks full-frame zkey equality (early-z must
be a pure schedule change).

Run: python tools/exp_earlyz2.py [--x64]
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


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:58s} {(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:9.3f} ms",
          flush=True)
    return out


def scanned(fn):
    @jax.jit
    def run(rec, setup):
        def body(carry, _):
            out = fn(rec * (1.0 + carry), setup)
            leaves = jax.tree_util.tree_leaves(out)
            dep = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-30
            return dep.astype(jnp.float32).reshape(()), leaves[0].ravel()[:1]

        _, outs = lax.scan(body, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def main():
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

    x64 = "--x64" in sys.argv
    n_inst = 64 if x64 else 1
    print(f"device: {jax.devices()[0]}  n_instances={n_inst}", flush=True)
    scene = ShaderBallScene(num_instances=n_inst)
    if x64:
        cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    else:
        cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    data = scene.scene_data()
    if x64:
        data = cull_scene_instances(data, np.asarray(cam.get_view_matrix()),
                                    np.asarray(proj))
    view_block = ViewBlock(view=view, proj=proj,
                           view_pos=jnp.asarray(cam.pos),
                           enable_normal_map=jnp.int32(0))
    settings, probe = autotune_settings(
        data, view_block,
        RenderSettings(width=WIDTH, height=HEIGHT, outputs="image"),
        margin=1.05,
    )
    print(f"settings: maxc={settings.max_candidates} "
          f"span={settings.span_cap} ov={settings.overflow_cap} "
          f"passes={settings.raster_passes} "
          f"tile_cap={settings.raster_tile_cap} "
          f"gw={settings.group_pair_cap} dense={settings.dense_tile_cap} "
          f"fine={settings.fine_bins} merged={settings.merged_coverage}",
          flush=True)

    @jax.jit
    def geom(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        return rec, setup

    rec, setup = geom(view)

    def raster(earlyz, gw="keep", merged=None, fine=None, passes=None):
        def fn(rec_in, setup_in):
            px, zkey, diag = fused.raster_fused_pallas(
                rec_in, setup_in, WIDTH, HEIGHT,
                tile_h=settings.tile_h, tile_w=settings.tile_w,
                max_candidates=settings.max_candidates,
                overflow_cap=settings.overflow_cap,
                span_cap=settings.span_cap,
                pair_budget=settings.pair_budget,
                passes=passes if passes is not None
                else settings.raster_passes,
                raster_tile_cap=settings.raster_tile_cap,
                span_mid_cap=settings.span_mid_cap,
                group_pair_cap=(settings.group_pair_cap if gw == "keep"
                                else None),
                dense_tile_cap=settings.dense_tile_cap,
                fine_bins=(settings.fine_bins if fine is None else fine),
                merged_coverage=(settings.merged_coverage if merged is None
                                 else merged),
                earlyz=earlyz,
            )
            return px.depth, px.uv[0], zkey, diag.dropped_cap
        return fn

    base = timeit("raster production (autotune)", scanned(raster(False)),
                  rec, setup)
    ez = timeit("raster early-z (gw off, fine off)",
                scanned(raster(True, gw=None, fine=False)), rec, setup)
    timeit("raster early-z merged=False",
           scanned(raster(True, gw=None, fine=False, merged=False)),
           rec, setup)
    timeit("raster gw-off control (no early-z)",
           scanned(raster(False, gw=None, fine=False)), rec, setup)
    if settings.raster_passes > 1:
        timeit("raster early-z passes=1",
               scanned(raster(True, gw=None, fine=False, passes=1)),
               rec, setup)
        timeit("raster passes=1 control (no early-z)",
               scanned(raster(False, gw=None, fine=False, passes=1)),
               rec, setup)

    # Full-frame equality: early-z must be a pure schedule change.
    pa = raster(False)(rec, setup)
    pb = raster(True, gw=None, fine=False)(rec, setup)
    za, zb = np.asarray(pa[2]), np.asarray(pb[2])
    print(f"zkey equal: {(za == zb).all()}  (diff px {(za != zb).sum()})",
          flush=True)


if __name__ == "__main__":
    main()
