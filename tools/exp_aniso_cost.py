"""Headline cost of the opt-in N-tap anisotropic sampler.

VERDICT r3 #7: the aniso deviation needs a measured headline cost next
to its visual comparison (docs/img/aniso_grazing_compare.png). Times the
production headline frame with aniso_taps 1 (default bilinear) vs 4 vs
8 using the same in-jit scan harness as bench.py.

Run: python tools/exp_aniso_cost.py
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


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, make_overlay_resources,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    mats = jax.device_put(material_quads_from_set(
        create_pbr_material_set(), scene.selected_material))
    overlay = make_overlay_resources()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    data = scene.scene_data()
    base = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image")
    s, _ = autotune_settings(data, vb, base, margin=1.05, materials=mats)

    def frame_body(sx):
        def body(carry, _):
            vbc = vb._replace(view=vb.view + carry)
            img = render_frame(data, vbc, fp, mats, overlay, sx)["image"]
            dep = jnp.sum(img.astype(jnp.float32)) * 1e-30
            return dep.astype(jnp.float32).reshape(()), img.ravel()[:1]
        return body

    for taps in (1, 4, 8):
        sx = dataclasses.replace(s, aniso_taps=taps)

        @jax.jit
        def run():
            _, outs = lax.scan(frame_body(sx), jnp.float32(0), None,
                               length=SCAN_ITERS)
            return outs

        out = run()
        np.asarray(jax.device_get(out.ravel()[:1]))
        t0 = time.perf_counter()
        for _ in range(4):
            out = run()
        np.asarray(jax.device_get(out.ravel()[:1]))
        ms = (time.perf_counter() - t0) / 4 / SCAN_ITERS * 1e3
        print(f"aniso_taps={taps}: {ms:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
