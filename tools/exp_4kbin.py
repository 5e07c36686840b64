"""4K raster attribution: binning (pair sort) vs kernel (VERDICT r4).

At 1080p the pair list fits the in-VMEM bitonic sort (MAX_VMEM_SORT =
2^17); the 4K frame has ~4x the pairs and may be falling back to
lax.sort — measured ~2x slower per element. This probe prints the 4K
pair volume, whether the VMEM sort path is taken, and scanned timings
for bin_pairs alone vs the full raster.

Run: python tools/exp_4kbin.py
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

W, H = 3840, 2160
SCAN_ITERS = 8


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:48s} {(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:9.3f} ms",
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
    from bibim_tpu.ops.sort_pallas import MAX_VMEM_SORT, pack_bits
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, W / H, 0.1, 1000.0)
    data = scene.scene_data()
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    settings, probe = autotune_settings(
        data, vb,
        RenderSettings(width=W, height=H, outputs="image", span_cap=32,
                       show_gizmo=False, show_lights=False),
        margin=1.05,
    )
    t = int(probe.n_tris) if hasattr(probe, "n_tris") else -1
    print(f"span_cap={settings.span_cap} span_mid={settings.span_mid_cap} "
          f"pair_budget={settings.pair_budget} maxc={settings.max_candidates} "
          f"passes={settings.raster_passes} tile_cap={settings.raster_tile_cap}",
          flush=True)

    @jax.jit
    def geom(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, W, H)
        rec = fused.build_record_table_planar(setup, psoup)
        return rec, setup

    rec, setup = geom(view)
    tcount = int(setup.valid.shape[0])
    # Flat pair-list length the sort sees (bin_pairs layout):
    if settings.span_mid_cap is not None:
        from bibim_tpu.ops.fused import SPAN_DENSE

        p = SPAN_DENSE * tcount + settings.span_mid_cap * settings.span_cap
    else:
        p = settings.span_cap * tcount
    padded = max(1024, 1 << (p - 1).bit_length())
    print(f"tris={tcount} flat pairs={p} padded={padded} "
          f"vmem_cap={MAX_VMEM_SORT} vmem_sort={'YES' if padded <= MAX_VMEM_SORT else 'NO (lax.sort fallback)'} "
          f"pack_bits={pack_bits((-(-W // settings.tile_w)) * (-(-H // settings.tile_h)), tcount)}",
          flush=True)

    def bin_only(rec_in, setup_in):
        out = fused.bin_pairs(
            setup_in, W, H, settings.tile_h, settings.tile_w,
            settings.span_cap, 64, settings.max_candidates *
            settings.raster_passes,
            pair_budget=settings.pair_budget,
            span_mid_cap=settings.span_mid_cap,
        )
        return out[:5] + (rec_in[:1, :1],)

    timeit("bin_pairs (sort binning)", scanned(bin_only), rec, setup)

    def raster(rec_in, setup_in):
        px, zkey, diag = fused.raster_fused_pallas(
            rec_in, setup_in, W, H,
            tile_h=settings.tile_h, tile_w=settings.tile_w,
            max_candidates=settings.max_candidates,
            overflow_cap=settings.overflow_cap,
            span_cap=settings.span_cap,
            pair_budget=settings.pair_budget,
            passes=settings.raster_passes,
            raster_tile_cap=settings.raster_tile_cap,
            span_mid_cap=settings.span_mid_cap,
            group_pair_cap=settings.group_pair_cap,
            dense_tile_cap=settings.dense_tile_cap,
            fine_bins=settings.fine_bins,
            merged_coverage=settings.merged_coverage,
        )
        return px.depth, px.uv[0], zkey, diag.dropped_cap

    timeit("raster_fused_pallas (bin + kernel)", scanned(raster), rec,
           setup)


if __name__ == "__main__":
    main()
