"""Frame-level attribution of config 4 (x64 instances): swap ONLY the
material tables and watch the sustained full-frame time. Isolates the
true in-frame sampling cost without standalone-stage harness pitfalls
(hoisting, frozen-stream coherence differences).

Variants:
  prod    block tables (>1M texel groups), the bench default
  quad    16 B-row quad tables everywhere (block_threshold=None)
  small   materials downscaled to 256^2 (all groups on the MXU path)

Run: python tools/exp_x64frame.py [n_instances]
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
    print(f"{name:48s} "
          f"{(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:8.2f} ms",
          flush=True)
    return out


def main():
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (FrameParams, RenderSettings, ViewBlock,
                                    material_quads_from_set, render_frame)
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    print(f"device: {jax.devices()[0]}, instances {n_inst}", flush=True)
    scene = ShaderBallScene(num_instances=n_inst)
    cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    data = scene.scene_data()
    data = cull_scene_instances(data, np.asarray(view), np.asarray(proj))
    base = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                          show_gizmo=False, show_lights=False)
    s, _ = autotune_settings(data, vb, base, margin=1.05)

    mset = create_pbr_material_set()
    sel = scene.selected_material
    variants = {
        "prod (block tables)": material_quads_from_set(mset, sel),
        "quad tables (16B rows)": material_quads_from_set(
            mset, sel, block_threshold=None),
    }
    # small: downscale every map to <=32^2 by striding (1024 rows <=
    # SMALL_ROWS -> the MXU select path; content is irrelevant for
    # timing, shapes drive the path). Frame delta vs prod isolates the
    # big-table sampling's true in-frame cost.
    maps = tq.pack_material_maps(mset, sel)
    small_maps = {}
    for k, img in maps.items():
        st = max(1, img.shape[0] // 32, img.shape[1] // 32)
        small_maps[k] = np.ascontiguousarray(img[::st, ::st])
    variants["small 32^2 (MXU path)"] = tq.build_quad_tables(small_maps)

    for name, mats in variants.items():
        mats = jax.device_put(mats)
        kinds = [type(t).__name__ + f"({t.height}x{t.width})" for t in mats]
        print(f"-- {name}: {kinds}", flush=True)

        def frame_body(carry, mats=mats):
            out = render_frame(
                data, vb,
                FrameParams(fp.enable_tone_mapping, fp.exposure + carry),
                mats, None, s,
            )
            img = out["image"]
            d = jnp.sum(img.astype(jnp.float32)) * 1e-30
            return d.astype(jnp.float32).reshape(()), img[:1, :1]

        @jax.jit
        def run(frame_body=frame_body):
            def step(carry, _):
                c, keep = frame_body(carry)
                return c, keep

            _, outs = lax.scan(step, jnp.float32(0), None,
                               length=SCAN_ITERS)
            return outs

        timeit(name, run)


if __name__ == "__main__":
    main()
