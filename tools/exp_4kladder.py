"""Frame-removal attribution of config 5 (4K + shadows + IBL + overlays).

Standalone gather stages measure up to ~5x their in-frame cost on frozen
streams (tools/exp_x64frame.py finding), so the honest 4K budget comes
from FULL-FRAME deltas: render the production frame, then re-render with
one feature removed at a time. Each number is the sustained in-jit scan
ms/frame (bench methodology).

Run: python tools/exp_4kladder.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SCAN_ITERS = 8


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, iters=2):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    print(f"{name:44s} "
          f"{(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:8.2f} ms",
          flush=True)
    return out


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.ibl import make_ibl_sh
    from bibim_tpu.pipeline import (FrameParams, RenderSettings, ViewBlock,
                                    make_overlay_resources,
                                    material_quads_from_set, render_frame)
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    w, h = 3840, 2160
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    mset = create_pbr_material_set()
    sel = scene.selected_material
    mats = jax.device_put(material_quads_from_set(mset, sel))
    maps = tq.pack_material_maps(mset, sel)
    small_maps = {k: np.ascontiguousarray(
        img[::max(1, img.shape[0] // 32), ::max(1, img.shape[1] // 32)])
        for k, img in maps.items()}
    mats_small = jax.device_put(tq.build_quad_tables(small_maps))
    ibl = jax.device_put(make_ibl_sh())
    overlay = make_overlay_resources()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    base = RenderSettings(width=w, height=h, outputs="image",
                          enable_shadows=True, enable_ibl=True,
                          span_cap=32,
                          shadow_fit_batches=scene.shadow_fit_batches,
                          overlay_max_tiles=1024)
    data = scene.scene_data()
    s, _ = autotune_settings(data, vb, base, margin=1.05)
    print(f"device: {jax.devices()[0]}", flush=True)

    def run_variant(name, settings, m, ov, ib):
        def frame_body(carry):
            out = render_frame(
                data, vb,
                FrameParams(fp.enable_tone_mapping, fp.exposure + carry),
                m, ov, settings, ibl=ib)
            img = out["image"]
            d = jnp.sum(img.astype(jnp.float32)) * 1e-30
            return d.astype(jnp.float32).reshape(()), img[:1, :1]

        @jax.jit
        def run():
            def step(carry, _):
                return frame_body(carry)

            _, outs = lax.scan(step, jnp.float32(0), None,
                               length=SCAN_ITERS)
            return outs

        timeit(name, run)

    run_variant("full (prod)", s, mats, overlay, ibl)
    run_variant("- IBL", dataclasses.replace(s, enable_ibl=False),
                mats, overlay, None)
    run_variant("- shadows (raster+PCF)",
                dataclasses.replace(s, enable_shadows=False),
                mats, overlay, ibl)
    run_variant("- overlays", s, mats, None, ibl)
    run_variant("small 32^2 materials", s, mats_small, overlay, ibl)
    run_variant("- shadows - IBL - overlays",
                dataclasses.replace(s, enable_shadows=False,
                                    enable_ibl=False),
                mats, None, None)


if __name__ == "__main__":
    main()
