"""Dense-pass slot-count ladders (r5 — the x64 measured-pick evidence).

Three probes behind autotune.dense_cap_candidates/pick_measured:
full-frame ladder at the bench x64 camera (91 dense tiles: 128->9.50,
192->8.78, 256->8.92, 320->9.37 — a reproducible dip at 2x demand),
the same ladder at a 40-dense-tile camera (1x == 2x: no dip), and the
ISOLATED raster stage at the bench camera (128 BEATS 192: the dip is a
whole-program XLA layout/fusion effect, not a kernel property).
docs/PERFORMANCE.md round-5 x64 section records the tables.

Run (TPU): python tools/exp_dense_ladder.py [frame|cam2|stage]
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def run_frame():
    import dataclasses, time
    import jax, jax.numpy as jnp, numpy as np
    from jax import lax
    from bibim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (FrameParams, RenderSettings, ViewBlock,
                                    material_quads_from_set, render_frame)
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    WIDTH, HEIGHT, SCAN = 1920, 1080, 8
    scene = ShaderBallScene(num_instances=64)
    cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    mats = jax.device_put(material_quads_from_set(create_pbr_material_set(),
                                                  scene.selected_material))
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()), proj=proj,
                   view_pos=jnp.asarray(cam.pos), enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1), exposure=jnp.float32(1.0))
    data = cull_scene_instances(scene.scene_data(),
                                np.asarray(cam.get_view_matrix()), np.asarray(proj))
    base = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                          show_gizmo=False, show_lights=False, pair_sampling=2)
    s0, probe = autotune_settings(data, vb, base, margin=1.05, materials=mats)
    print("dense_tiles probed:", probe.dense_tiles, "derived cap:",
          s0.dense_tile_cap, flush=True)

    def _sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

    def measure(s, iters=4, reps=5):
        @jax.jit
        def run():
            def step(carry, _):
                vbc = vb._replace(view=vb.view + carry)
                img = render_frame(data, vbc, fp, mats, None, s)["image"]
                dep = (jnp.sum(img, dtype=jnp.int32) & 1).astype(jnp.float32) * 1e-30
                return dep, img[:1, :1]
            _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN)
            return outs
        out = run(); _sync(out)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = run()
            _sync(out)
            samples.append((time.perf_counter() - t0) / iters / SCAN * 1e3)
        return float(np.median(samples)), float(np.min(samples))

    for cap in (128, 160, 192, 256, 320, 384):
        med, mn = measure(dataclasses.replace(s0, dense_tile_cap=cap))
        print(f"dense_tile_cap {cap:4d}: median {med:7.3f}  min {mn:7.3f}", flush=True)

def run_cam2():
    import dataclasses, time
    import jax, jax.numpy as jnp, numpy as np
    from jax import lax
    from bibim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (FrameParams, RenderSettings, ViewBlock,
                                    material_quads_from_set, render_frame)
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    WIDTH, HEIGHT, SCAN = 1920, 1080, 8
    scene = ShaderBallScene(num_instances=64)
    cam = FreeLookCamera(pos=np.array([5.0, 4.0, -9.0], np.float32))
    mats = jax.device_put(material_quads_from_set(create_pbr_material_set(),
                                                  scene.selected_material))
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()), proj=proj,
                   view_pos=jnp.asarray(cam.pos), enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1), exposure=jnp.float32(1.0))
    data = cull_scene_instances(scene.scene_data(),
                                np.asarray(cam.get_view_matrix()), np.asarray(proj))
    base = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                          show_gizmo=False, show_lights=False, pair_sampling=2)
    s0, probe = autotune_settings(data, vb, base, margin=1.05, materials=mats)
    print("cam2: dense_tiles", probe.dense_tiles, "derived", s0.dense_tile_cap,
          "passes", s0.raster_passes, "mc", s0.max_candidates, flush=True)

    def _sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

    def measure(s, iters=4, reps=4):
        @jax.jit
        def run():
            def step(carry, _):
                vbc = vb._replace(view=vb.view + carry)
                img = render_frame(data, vbc, fp, mats, None, s)["image"]
                dep = (jnp.sum(img, dtype=jnp.int32) & 1).astype(jnp.float32) * 1e-30
                return dep, img[:1, :1]
            _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN)
            return outs
        out = run(); _sync(out)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = run()
            _sync(out)
            samples.append((time.perf_counter() - t0) / iters / SCAN * 1e3)
        return float(np.median(samples)), float(np.min(samples))

    if s0.dense_tile_cap is None:
        print("no dense pass at x32", flush=True)
    else:
        d = probe.dense_tiles
        caps = sorted({-(-int(d*f*1.05)//64)*64 for f in (1.0, 1.5, 2.0, 2.5, 3.0)})
        for cap in caps:
            med, mn = measure(dataclasses.replace(s0, dense_tile_cap=cap))
            print(f"cam2 dense_tile_cap {cap:4d}: median {med:7.3f}  min {mn:7.3f}",
                  flush=True)

def run_stage():
    import dataclasses, functools, time
    import jax, jax.numpy as jnp, numpy as np
    from jax import lax
    from bibim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import (FrameParams, RenderSettings, ViewBlock,
                                    material_quads_from_set, render_frame)
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    WIDTH, HEIGHT, SCAN = 1920, 1080, 8
    scene = ShaderBallScene(num_instances=64)
    cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    mats = jax.device_put(material_quads_from_set(create_pbr_material_set(),
                                                  scene.selected_material))
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()), proj=proj,
                   view_pos=jnp.asarray(cam.pos), enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1), exposure=jnp.float32(1.0))
    data = cull_scene_instances(scene.scene_data(),
                                np.asarray(cam.get_view_matrix()), np.asarray(proj))
    base = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                          show_gizmo=False, show_lights=False, pair_sampling=2)
    s0, probe = autotune_settings(data, vb, base, margin=1.05, materials=mats)

    def _sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

    def raster_stage_ms(s, iters=4, reps=4):
        @jax.jit
        def run():
            def step(carry, _):
                psoup = assemble_scene_planar(data.batches, vb.view + carry,
                                              vb.proj, s.batch_material_ids)
                setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
                rec = fused.build_record_table_planar(setup, psoup)
                px, zk, diag = fused.raster_fused_pallas(
                    rec, setup, WIDTH, HEIGHT,
                    tile_h=s.tile_h, tile_w=s.tile_w,
                    max_candidates=s.max_candidates,
                    overflow_cap=s.overflow_cap, span_cap=s.span_cap,
                    span_mid_cap=s.span_mid_cap, pair_budget=s.pair_budget,
                    passes=s.raster_passes, raster_tile_cap=s.raster_tile_cap,
                    dense_tile_cap=s.dense_tile_cap,
                    merged_coverage=s.merged_coverage)
                leaves = jax.tree_util.tree_leaves((px, zk))
                dep = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                return (dep * 1e-30).reshape(()), zk.ravel()[:1]
            _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN)
            return outs
        out = run(); _sync(out)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = run()
            _sync(out)
            samples.append((time.perf_counter() - t0) / iters / SCAN * 1e3)
        return float(np.median(samples))

    for tag, s in (
        ("k=128 merged", dataclasses.replace(s0, dense_tile_cap=128)),
        ("k=192 merged", dataclasses.replace(s0, dense_tile_cap=192)),
        ("k=256 merged", dataclasses.replace(s0, dense_tile_cap=256)),
        ("k=192 merged OFF", dataclasses.replace(s0, dense_tile_cap=192,
                                                 merged_coverage=False)),
        ("k=128 merged OFF", dataclasses.replace(s0, dense_tile_cap=128,
                                                 merged_coverage=False)),
    ):
        print(f"raster stage {tag:20s} {raster_stage_ms(s):7.3f} ms", flush=True)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "frame"
    {"frame": run_frame, "cam2": run_cam2, "stage": run_stage}[which]()
