"""4K raster tile-group-size sweep (VERDICT r4 #3 sub-item).

Re-probes the fused kernel's group size at 4K tile statistics instead
of inheriting the 1080p balance: groups 4/8/16/32 (slab budget raised
for the big ones) measure 33.13/33.12/33.02/32.97 ms full-frame,
bit-identical — within run noise. Group 8 stands at 4K.

Run (TPU): python tools/exp_4kgroup.py
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
from bibim_tpu.ops import fused
from bibim_tpu.ops.ibl import make_ibl_sh
from bibim_tpu.pipeline import (FrameParams, RenderSettings, ViewBlock,
                                make_overlay_resources,
                                material_quads_from_set, render_frame)
from bibim_tpu.pipeline.autotune import autotune_settings
from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

w, h, SCAN = 3840, 2160, 8
scene = ShaderBallScene()
cam = FreeLookCamera()
mats = jax.device_put(material_quads_from_set(create_pbr_material_set(),
                                              scene.selected_material))
ibl = jax.device_put(make_ibl_sh())
overlay = make_overlay_resources()
vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()),
               proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
               view_pos=jnp.asarray(cam.pos), enable_normal_map=jnp.int32(0))
fp = FrameParams(enable_tone_mapping=jnp.int32(1), exposure=jnp.float32(1.0))
data = scene.scene_data()
base = RenderSettings(width=w, height=h, outputs="image",
                      enable_shadows=True, enable_ibl=True, span_cap=32,
                      shadow_fit_batches=scene.shadow_fit_batches,
                      overlay_max_tiles=1024)
s, _ = autotune_settings(data, vb, base, margin=1.05, materials=mats)

def _sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

ref = {}
def run_variant(name):
    img = np.asarray(jax.device_get(render_frame(
        data, vb, fp, mats, overlay, s, ibl=ibl)["image"]))
    if "img" not in ref:
        ref["img"] = img
        eq = "reference"
    else:
        eq = "bit==" if (img == ref["img"]).all() else "DIFFERS"
    @jax.jit
    def run():
        def step(carry, _):
            vbc = vb._replace(view=vb.view + carry)
            im = render_frame(data, vbc, fp, mats, overlay, s, ibl=ibl)["image"]
            dep = (jnp.sum(im, dtype=jnp.int32) & 1).astype(jnp.float32) * 1e-30
            return dep, im[:1, :1]
        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN)
        return outs
    out = run(); _sync(out)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            out = run()
        _sync(out)
        samples.append((time.perf_counter() - t0) / 2 / SCAN * 1e3)
    print(f"{name:32s} {float(np.median(samples)):7.2f} ms  {eq}", flush=True)

run_variant("group 8 (production)")
fused.GROUP_SIZES = (16, 8, 4, 2, 1)
fused.GROUP_SLAB_BYTES = 12 << 20
jax.clear_caches()
run_variant("group 16 (12MB slab)")
fused.GROUP_SIZES = (32, 16, 8, 4, 2, 1)
fused.GROUP_SLAB_BYTES = 24 << 20
jax.clear_caches()
run_variant("group 32 (24MB slab)")
fused.GROUP_SIZES = (4, 2, 1)
fused.GROUP_SLAB_BYTES = 6 << 20
jax.clear_caches()
run_variant("group 4")
