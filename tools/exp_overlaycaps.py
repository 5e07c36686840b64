"""Pinned vs probe-derived overlay caps at the 1080p headline (r5).

The headline camera sits ON the light spheres' plane: every sphere
triangle depth-culls, yet the bbox heuristic derived a conservative
full-screen overlay grid (384 steps of padding). Measured-caps A/B
(same process): pinned 256/384 -> 7.82 ms, derived 192/64 -> 7.71,
bit-identical, zero drops. autotune.derive_overlay_caps is the landed
derivation (sphere binning + gizmo demand).

Run (TPU): python tools/exp_overlaycaps.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from bibim_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from bibim_tpu import math3d as m3
from bibim_tpu.assets.materials import create_pbr_material_set
from bibim_tpu.pipeline import (FrameParams, RenderSettings, ViewBlock,
                                make_overlay_resources,
                                material_quads_from_set, render_frame)
from bibim_tpu.pipeline.autotune import autotune_settings
from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

w, h, SCAN = 1920, 1080, 8
scene = ShaderBallScene()
cam = FreeLookCamera()
mats = jax.device_put(material_quads_from_set(create_pbr_material_set(),
                                              scene.selected_material))
overlay = make_overlay_resources()
vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()),
               proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
               view_pos=jnp.asarray(cam.pos), enable_normal_map=jnp.int32(0))
fp = FrameParams(enable_tone_mapping=jnp.int32(1), exposure=jnp.float32(1.0))
base = RenderSettings(width=w, height=h, outputs="image",
                      overlay_candidates=256, overlay_max_tiles=384,
                      pair_sampling=2)
data = scene.scene_data()
s_new, _ = autotune_settings(data, vb, base, margin=1.05, materials=mats,
                             overlay=overlay)
print("derived overlay caps:", s_new.overlay_candidates,
      s_new.overlay_max_tiles, flush=True)
s_old = dataclasses.replace(s_new, overlay_candidates=256,
                            overlay_max_tiles=384)

def _sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

ref = {}
def run_variant(name, s):
    out = render_frame(data, vb, fp, mats, overlay,
                       dataclasses.replace(s, outputs="image+diag"))
    d = out["bin_diag"]
    drops = tuple(int(x) for x in jax.device_get(
        (d.dropped_overflow, d.dropped_cap, d.dropped_pairs,
         d.dropped_tiles)))
    img = np.asarray(jax.device_get(out["image"]))
    if "img" not in ref:
        ref["img"] = img; eq = "reference"
    else:
        eq = "bit==" if (img == ref["img"]).all() else "DIFFERS"
    @jax.jit
    def run():
        def step(carry, _):
            vbc = vb._replace(view=vb.view + carry)
            im = render_frame(data, vbc, fp, mats, overlay, s)["image"]
            dep = (jnp.sum(im, dtype=jnp.int32) & 1).astype(jnp.float32) * 1e-30
            return dep, im[:1, :1]
        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN)
        return outs
    out = run(); _sync(out)
    samples = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(3):
            out = run()
        _sync(out)
        samples.append((time.perf_counter() - t0) / 3 / SCAN * 1e3)
    print(f"{name:36s} {float(np.median(samples)):7.3f} ms  drops={drops} {eq}",
          flush=True)

run_variant("pinned overlay caps 256/384", s_old)
run_variant("derived overlay caps", s_new)
