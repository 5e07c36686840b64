"""Probe the config-5 LIGHT view's true capacity demands and time the
shadow-map raster under derived vs hand-set capacities.

The 4K stage breakdown (bench stages_4k) puts the shadow-map raster at
~8.3 ms — run with hand-set shadow_candidates=2048 × shadow_passes=3
because the autotune probe only sees the main camera (bench.py comment).
This tool bins the light view uncapped, reports its real worst-tile
candidate count / pairs / overflow, then times _shadow_map_planar under
(a) the hand-set caps and (b) probe-derived caps.

Run: python tools/exp_shadowprobe.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCAN_ITERS = 8


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import shadow as sh
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings, _bucket
    from bibim_tpu.pipeline.framegraph import _shadow_map_planar
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    w, h = 3840, 2160
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    base = RenderSettings(width=w, height=h, outputs="image",
                          enable_shadows=True, enable_ibl=True,
                          span_cap=32,
                          shadow_candidates=2048, shadow_passes=3,
                          overlay_max_tiles=1024)
    data = scene.scene_data()
    settings, _ = autotune_settings(data, vb, base, margin=1.05)
    size = settings.shadow_size

    @jax.jit
    def light_probe(scene_data):
        psoup = assemble_scene_planar(scene_data.batches, vb.view, vb.proj,
                                      None)
        wmin = jnp.stack([
            jnp.minimum(jnp.minimum(psoup.world[k][0].min(),
                                    psoup.world[k][1].min()),
                        psoup.world[k][2].min()) for k in range(3)])
        wmax = jnp.stack([
            jnp.maximum(jnp.maximum(psoup.world[k][0].max(),
                                    psoup.world[k][1].max()),
                        psoup.world[k][2].max()) for k in range(3)])
        lvp = sh.light_view_proj(
            scene_data.lights.dir[settings.shadow_light], wmin, wmax)
        clip_l = tuple(
            tuple(lvp[m, 0] * psoup.world[0][c]
                  + lvp[m, 1] * psoup.world[1][c]
                  + lvp[m, 2] * psoup.world[2][c] + lvp[m, 3]
                  for c in range(3))
            for m in range(4))
        setup_l = triangle_setup_planar(clip_l, size, size)
        out = {}
        for span in (8, 16, 32):
            (_, _starts, counts, _big, n_big, _, _ty, _tx) = fused.bin_pairs(
                setup_l, size, size, settings.tile_h, settings.tile_w,
                span_cap=span, overflow_cap=1 << 14,
                max_candidates=1 << 22, pair_budget=None)
            out[f"span{span}"] = (jnp.max(counts), jnp.sum(counts),
                                  n_big, jnp.sum((counts > 0)
                                                 .astype(jnp.int32)))
        return out

    stats = {k: tuple(int(x) for x in v)
             for k, v in light_probe(data).items()}
    for k, (mc, pairs, n_big, live) in stats.items():
        print(f"light view {k}: max_cand={mc} pairs={pairs} "
              f"n_big={n_big} live_tiles={live}/"
              f"{(size // settings.tile_h) * (size // settings.tile_w)}",
              flush=True)

    @jax.jit
    def make_psoup(scene_data):
        return assemble_scene_planar(scene_data.batches, vb.view, vb.proj,
                                     None)

    psoup = make_psoup(data)

    def timed(name, st):
        # WARNING (measured): perturbing only the VIEW matrix lets XLA
        # hoist the whole world→lvp→raster chain out of the scan (world
        # planes are view-independent) — the scan must perturb psoup
        # itself (tools/exp_harness rule).
        @jax.jit
        def run(psoup, lights):
            def step(carry, _):
                ps = jax.tree_util.tree_map(
                    lambda p: p + carry.astype(p.dtype)
                    if jnp.issubdtype(p.dtype, jnp.floating) else p, psoup)
                smap, diag = _shadow_map_planar(ps, lights, st)
                dep = (jnp.sum(smap.quads) * 1e-30
                       + jnp.sum(jnp.stack(jax.tree_util.tree_leaves(diag))
                                 .astype(jnp.float32)) * 1e-30)
                return dep.reshape(()), smap.quads[:1, :1]

            _, outs = lax.scan(step, jnp.float32(0), None,
                               length=SCAN_ITERS)
            return outs

        out = run(psoup, data.lights)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = run(psoup, data.lights)
        sync(out)
        ms = (time.perf_counter() - t0) / 4 / SCAN_ITERS * 1e3
        print(f"{name:44s} {ms:8.3f} ms", flush=True)

    mc, pairs, n_big, live = stats["span32"]
    tcap = _bucket(int(live * 1.25) + 8, floor=64)
    for span in (32, 16, 8):
        st = dataclasses.replace(
            settings, shadow_candidates=1024, shadow_passes=4,
            shadow_tile_cap=tcap, span_cap=span,
            pair_budget=max(settings.pair_budget,
                            _bucket(int(pairs * 1.05), floor=4096)),
        )
        timed(f"tile_cap={tcap} cap=1024 x4 span={span}", st)


if __name__ == "__main__":
    main()
