"""Sweep the fused-raster kernel's tile-group size on the headline frame.

docs/PERFORMANCE.md attributes ~1 ms of the 2.3 ms kernel to per-step
scheduling spread over ~104 steps (832 compacted tiles / group 8). If
that model is right, group 16 (52 steps) should recover ~half of it.
The slab grows linearly with the group (2·(oc+maxc)·512 B per tile), so
big groups need a raised scoped-VMEM budget.

Usage: python tools/exp_group.py   (on the TPU host)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bibim_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import bench as B
from bibim_tpu import math3d as m3
from bibim_tpu.ops import fused
from bibim_tpu.ops.geometry import assemble_scene_planar
from bibim_tpu.ops.raster import triangle_setup_planar
from bibim_tpu.pipeline import RenderSettings, ViewBlock
from bibim_tpu.pipeline.autotune import autotune_settings
from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

W, H = 1920, 1080


def main():
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    base = RenderSettings(width=W, height=H, outputs="image",
                          overlay_candidates=256, overlay_max_tiles=384)
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    data = scene.scene_data()
    settings, probe = autotune_settings(data, vb, base, margin=1.05)
    print(f"caps: maxc={settings.max_candidates} oc={settings.overflow_cap} "
          f"raster_tile_cap={settings.raster_tile_cap} "
          f"live={settings.live_tile_cap} pairs={settings.pair_budget} "
          f"span={settings.span_cap}/{settings.span_mid_cap}",
          flush=True)

    def make_geom():
        @jax.jit
        def geom(batches, view, proj):
            psoup = assemble_scene_planar(batches, view, proj, None)
            setup = triangle_setup_planar(psoup.clip, W, H)
            rec = fused.build_record_table_planar(setup, psoup)
            return fused.raster_fused_pallas(
                rec, setup, W, H,
                tile_h=settings.tile_h, tile_w=settings.tile_w,
                max_candidates=settings.max_candidates,
                overflow_cap=settings.overflow_cap,
                span_cap=settings.span_cap,
                span_mid_cap=settings.span_mid_cap,
                pair_budget=settings.pair_budget,
                raster_tile_cap=settings.raster_tile_cap,
                drop_fields=("depth", "cr", "cg", "cb", "b0", "b1",
                             "matf"),
            )
        return geom

    results = {}
    for sizes, slab, vlim in (
        ((8, 4, 2, 1), 6 << 20, None),        # production baseline
        ((16, 8, 4, 2, 1), 13 << 20, 64 << 20),
        ((32, 16, 8, 4, 2, 1), 26 << 20, 96 << 20),
    ):
        fused.GROUP_SIZES = sizes
        fused.GROUP_SLAB_BYTES = slab
        fused.GROUP_VMEM_LIMIT = vlim
        geom = make_geom()
        try:
            ms = B._time_scan_stage(
                lambda c: geom(data.batches, vb.view + c, vb.proj)
            )
        except Exception as e:
            print(f"group{sizes[0]}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        results[sizes[0]] = ms
        print(f"group{sizes[0]}: {ms:.3f} ms", flush=True)

    # Restore production defaults.
    fused.GROUP_SIZES = (8, 4, 2, 1)
    fused.GROUP_SLAB_BYTES = 6 << 20
    fused.GROUP_VMEM_LIMIT = None
    print("results:", {k: round(v, 3) for k, v in sorted(results.items())})


if __name__ == "__main__":
    main()
