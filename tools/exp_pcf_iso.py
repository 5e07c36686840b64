"""Isolated PCF-visibility stage vs shadow-map size (r5 shadow ladder).

The full-frame shadow ladder (tools/exp_shadowladder.py) measured BOTH
512 and 2048 maps ~9 ms slower than the production 1024; this isolates
the PCF quad gather on the real 4K covered-pixel stream: 512 -> 16.1 ms,
1024 -> 6.9, 2048 -> 6.9 for the SAME 3M queries. A <=2^18-row 16 B
quad table hits a small-table gather lowering that loses 2.3x (the 4 MB
table fits VMEM and XLA picks a worse strategy); 2048's frame
regression is the 4x map raster, not PCF. CLAUDE.md rule 13.

Run (TPU): python tools/exp_pcf_iso.py
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
from bibim_tpu.ops import shadow as sh
from bibim_tpu.pipeline import (RenderSettings, ViewBlock,
                                material_quads_from_set)
from bibim_tpu.pipeline.framegraph import (_assemble_and_raster,
                                           _shadow_map_planar,
                                           _shadow_fit_ranges)
from bibim_tpu.ops.geometry import assemble_scene_planar
from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

w, h, SCAN = 3840, 2160, 8
scene = ShaderBallScene()
cam = FreeLookCamera()
vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()),
               proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
               view_pos=jnp.asarray(cam.pos), enable_normal_map=jnp.int32(0))
data = scene.scene_data()

def _sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

# Production-shaped pixel stream: real covered world planes at 4K.
s0 = RenderSettings(width=w, height=h, outputs="image",
                    max_candidates=1024, raster_passes=2, span_cap=32,
                    overflow_cap=256)
px, _, _, _, psoup = _assemble_and_raster(data, vb, s0)
world = jax.device_put(tuple(np.asarray(c) for c in px.world))
valid = jax.device_put(np.asarray(px.tri_id >= 0))
print("covered px:", int(np.asarray(valid).sum()), flush=True)

for size in (512, 1024, 2048):
    s = dataclasses.replace(s0, shadow_size=size, shadow_candidates=2048,
                            shadow_fit_batches=scene.shadow_fit_batches)
    tri_ranges, _ = _shadow_fit_ranges(data, s)
    psoup2 = assemble_scene_planar(data.batches, vb.view, vb.proj, None)
    smap, diag = jax.jit(lambda ps: _shadow_map_planar(
        ps, data.lights, s, fit_ranges=tri_ranges))(psoup2)
    jax.block_until_ready(smap.quads)

    @jax.jit
    def run(world=world, valid=valid, smap=smap):
        def step(carry, _):
            wshift = tuple(c + carry for c in world)
            vis, dropped = sh.shadow_factor_compact(
                smap, wshift, valid, 1152, 2e-3)
            dep = jnp.sum(vis) * 1e-30
            return dep.astype(jnp.float32).reshape(()), vis.ravel()[:1]
        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN)
        return outs
    out = run(); _sync(out)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = run()
        _sync(out)
        samples.append((time.perf_counter() - t0) / 3 / SCAN * 1e3)
    print(f"PCF stage size {size:5d}: {float(np.median(samples)):7.3f} ms",
          flush=True)
