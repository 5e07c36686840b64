"""A/B the production headline frame with pair-rate block sampling
(RenderSettings.pair_sampling — VERDICT r2 lever 1b, the query-count
lever): sustained in-scan ms/frame full-rate vs pair-rate, plus the
final-image diff stats that bound the approximation on real content.

Run: python tools/exp_pair.py [width height]
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

SCAN_ITERS = 8


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def time_scan(body, iters=3):
    @jax.jit
    def run():
        def step(carry, _):
            out = body(carry)
            dep = (jnp.sum(out.astype(jnp.float32)) * 1e-30).reshape(())
            return dep, out.ravel()[:1]

        _, outs = jax.lax.scan(step, jnp.float32(0), None,
                               length=SCAN_ITERS)
        return outs

    out = run()
    sync(out)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run()
        sync(out)
        samples.append((time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3)
    return float(np.median(samples))


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, make_overlay_resources,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    stretch = "--stretch" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    width = int(argv[0]) if argv else (3840 if stretch else 1920)
    height = int(argv[1]) if len(argv) > 1 else (2160 if stretch else 1080)
    print(f"device: {jax.devices()[0]}  {width}x{height} "
          f"stretch={stretch}", flush=True)

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    if stretch:
        # Config 5 shape: shadows + IBL + 4K capacities (bench.py).
        base = RenderSettings(width=width, height=height, outputs="image",
                              enable_shadows=True, enable_ibl=True,
                              span_cap=32,
                              shadow_fit_batches=scene.shadow_fit_batches,
                              overlay_max_tiles=1024)
    else:
        base = RenderSettings(width=width, height=height, outputs="image",
                              overlay_candidates=256, overlay_max_tiles=384)
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material))
    overlay = make_overlay_resources()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, width / height, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    data = scene.scene_data()
    s_full, _ = autotune_settings(data, vb, base, margin=1.05)
    s_pair = dataclasses.replace(s_full, pair_sampling=1,
                                 pair_visibility=stretch)

    ibl = None
    if stretch:
        from bibim_tpu.ops.ibl import make_ibl_sh

        ibl = jax.device_put(make_ibl_sh())

    s_quad = dataclasses.replace(s_full, pair_sampling=2,
                                 pair_visibility=stretch)
    imgs = {}
    for name, s in (("full", s_full), ("pair", s_pair), ("quad", s_quad)):
        def body(carry, s=s):
            vbc = vb._replace(view=vb.view + carry)
            fpc = FrameParams(fp.enable_tone_mapping, fp.exposure + carry)
            return render_frame(data, vbc, fpc, mats, overlay, s,
                                ibl=ibl)["image"]

        ms = time_scan(body, iters=2 if stretch else 3)
        imgs[name] = np.asarray(jax.device_get(jax.jit(
            lambda s=s: render_frame(data, vb, fp, mats, overlay, s,
                                     ibl=ibl)["image"]
        )()))
        print(f"{name:6s} frame {ms:7.2f} ms", flush=True)

    for name in ("pair", "quad"):
        d = np.abs(imgs["full"].astype(np.int32)
                   - imgs[name].astype(np.int32))
        print(f"{name} image diff (u8): max {d.max()}, mean {d.mean():.4f}, "
              f"frac>0 {(d > 0).mean():.4f}, frac>4 {(d > 4).mean():.5f}",
              flush=True)


if __name__ == "__main__":
    main()
