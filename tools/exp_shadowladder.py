"""4K shadow-stack ladder — VERDICT r4 #3.

Round-5 frame-removal attribution (exp_4kladder r5 run) puts the whole
shadow stack (light-view raster + PCF visibility) at ~7.9 ms IN-FRAME of
the ~33 ms 4K frame — the largest non-sampling lever. This sweeps the
stack's three axes as one ladder, each variant a FULL-FRAME sustained
measurement plus an image delta vs the production reference (shadow
resolution changes pixels; the ladder quantifies ms-vs-quality):

- shadow map resolution (512 / 1024 / 2048): sets BOTH the light-view
  raster cost AND the PCF gather's table size (2^18 rows gather at
  ~4.5 ns/row vs 2^20 at ~6-9 — the quad-row table is (S^2, 4)).
- PCF query compaction granularity (shadow_query_tile_cap derived vs
  uncapped).
- caster-fitted vs scene-fitted light frustum (shadow_fit_batches).

Run (TPU): python tools/exp_shadowladder.py
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

SCAN = 8


def _sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]
                                     .ravel()[:1]))


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops.ibl import make_ibl_sh
    from bibim_tpu.pipeline import (FrameParams, RenderSettings, ViewBlock,
                                    make_overlay_resources,
                                    material_quads_from_set, render_frame)
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    w, h = 3840, 2160
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    mats = jax.device_put(material_quads_from_set(
        create_pbr_material_set(), scene.selected_material))
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
    data = scene.scene_data()
    print(f"device: {jax.devices()[0]}", flush=True)

    def derive(**kw):
        kw.setdefault("shadow_fit_batches", scene.shadow_fit_batches)
        base = RenderSettings(width=w, height=h, outputs="image",
                              enable_shadows=True, enable_ibl=True,
                              span_cap=32,
                              overlay_max_tiles=1024, **kw)
        s, _ = autotune_settings(data, vb, base, margin=1.05,
                                 materials=mats)
        return s

    ref_img = {}

    def run_variant(name, s, ref=False):
        img = np.asarray(jax.device_get(render_frame(
            data, vb, fp, mats, overlay, s, ibl=ibl)["image"]))
        if ref:
            ref_img["img"] = img.astype(np.int32)
            dtxt = "reference"
        else:
            d = np.abs(img.astype(np.int32) - ref_img["img"]).max(axis=-1)
            dtxt = (f"maxd {d.max():3d} diff {100 * (d > 0).mean():5.2f}% "
                    f">4 {100 * (d > 4).mean():5.2f}%")

        @jax.jit
        def run():
            def step(carry, _):
                vbc = vb._replace(view=vb.view + carry)
                im = render_frame(data, vbc, fp, mats, overlay, s,
                                  ibl=ibl)["image"]
                dep = (jnp.sum(im, dtype=jnp.int32) & 1).astype(
                    jnp.float32) * 1e-30
                return dep, im[:1, :1]

            _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN)
            return outs

        out = run()
        _sync(out)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(2):
                out = run()
            _sync(out)
            samples.append((time.perf_counter() - t0) / 2 / SCAN * 1e3)
        ms = float(np.median(samples))
        print(f"{name:40s} {ms:7.2f} ms   {dtxt}", flush=True)
        return ms

    s1024 = derive()
    run_variant("shadow 1024 (production)", s1024, ref=True)
    run_variant("shadow 512", derive(shadow_size=512))
    run_variant("shadow 2048", derive(shadow_size=2048))
    run_variant("1024, PCF query cap OFF", dataclasses.replace(
        s1024, shadow_query_tile_cap=None))
    run_variant("1024, scene-fitted frustum", derive(
        shadow_fit_batches=None))


if __name__ == "__main__":
    main()
