"""Block-table row-count padding probe (r5 closed dead end).

The PCF small-table pathology (tools/exp_pcf_iso.py) raised the
question whether the production material block tables sit in the same
bad gather lowering. They do not: the 2048^2 block table is 2^18 rows
x 128 B (33.5 MB); padding rows x2 is neutral (7.91 vs 7.96 ms
full-frame, bit-identical) and x4 is 2x SLOWER (15.4 — bigger-table
gather regime). Production tables are at their optimum.

Run (TPU): python tools/exp_blockpad.py
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
from bibim_tpu.ops import texture_quad as tq
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
s, _ = autotune_settings(data, vb, base, margin=1.05, materials=mats)

def pad_tables(mats, factor):
    out = []
    for t in mats:
        if isinstance(t, tq.BlockTable) and factor > 1:
            rows = t.blocks.shape[0]
            padded = jnp.pad(t.blocks, ((0, rows * (factor - 1)), (0, 0)))
            t = tq.BlockTable(padded, t.height, t.width, t.present)
        out.append(t)
    return tuple(out)

for t in mats:
    if isinstance(t, tq.BlockTable):
        print("block table:", t.blocks.shape,
              t.blocks.shape[0] * 128 / 1e6, "MB", flush=True)

def _sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

ref = {}
def run_variant(name, m):
    img = np.asarray(jax.device_get(render_frame(
        data, vb, fp, m, overlay, s)["image"]))
    if "img" not in ref:
        ref["img"] = img; eq = "reference"
    else:
        eq = "bit==" if (img == ref["img"]).all() else "DIFFERS"
    @jax.jit
    def run():
        def step(carry, _):
            vbc = vb._replace(view=vb.view + carry)
            im = render_frame(data, vbc, fp, m, overlay, s)["image"]
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
    print(f"{name:28s} {float(np.median(samples)):7.3f} ms  {eq}", flush=True)

run_variant("production tables", mats)
run_variant("blocks padded x2", jax.device_put(pad_tables(mats, 2)))
run_variant("blocks padded x4", jax.device_put(pad_tables(mats, 4)))
