"""Per-stage timing of the 1080p ShaderBall frame on the real TPU.

Run on the bench device:  python tools/profile_stages.py [n_instances]

Each stage is jitted and timed standalone with a tiny dependent readback as
the sync barrier (block_until_ready is not trusted on tunnel-attached
devices; every jitted call also pays ~2.5 ms dispatch overhead through the
tunnel, so stages do not sum to the single-call full frame)."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 1920, 1080


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    print(f"{name:44s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
          flush=True)
    return out


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import (
        FrameParams,
        RenderSettings,
        ViewBlock,
        make_overlay_resources,
        material_quads_from_set,
        render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    print(f"device: {jax.devices()[0]}, instances: {n_inst}")
    scene = ShaderBallScene(num_instances=n_inst)
    cam = FreeLookCamera(
        pos=np.array([8.0, 6.0, -14.0], np.float32) if n_inst > 1
        else np.zeros(3, np.float32)
    )
    caps = dict(max_candidates=1024 if n_inst > 1 else 320,
                span_cap=8 if n_inst > 1 else 16)
    settings = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                              **caps)
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material)
    )
    overlay = make_overlay_resources()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    view_block = ViewBlock(view=view, proj=proj,
                           view_pos=jnp.asarray(cam.pos),
                           enable_normal_map=jnp.int32(0))
    frame_params = FrameParams(enable_tone_mapping=jnp.int32(1),
                               exposure=jnp.float32(1.0))
    data = scene.scene_data()

    timeit("full render_frame", functools.partial(
        render_frame, settings=settings),
        data, view_block, frame_params, mats, overlay, iters=10)

    # Geometry stages jitted TOGETHER (standalone planar-soup outputs hit
    # pathological XLA output layouts at 625k tris); rec+setup are the
    # real intermediates the frame materializes.
    @jax.jit
    def geom(batches):
        psoup = assemble_scene_planar(batches, view, proj, None)
        s = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        return fused.build_record_table_planar(s, psoup), s

    rec, setup = timeit("assemble+setup+record (planar)", geom,
                        data.batches)
    print(f"tris: {rec.shape[0]}")
    timeit("bin_pairs", jax.jit(
        lambda s: fused.bin_pairs(s, WIDTH, HEIGHT, settings.tile_h,
                                  settings.tile_w, caps["span_cap"], 64,
                                  caps["max_candidates"],
                                  pair_budget=settings.pair_budget)), setup)
    sorted_tri, *_ = jax.jit(
        lambda s: fused.bin_pairs(s, WIDTH, HEIGHT, settings.tile_h,
                                  settings.tile_w, caps["span_cap"], 64,
                                  caps["max_candidates"],
                                  pair_budget=settings.pair_budget))(setup)
    timeit("pair record gather", jax.jit(
        lambda r, st: r[st]), rec, sorted_tri)
    out = timeit("raster_fused (bin+DMA+kernel)", jax.jit(
        lambda r, s: fused.raster_fused_pallas(
            r, s, WIDTH, HEIGHT, max_candidates=caps["max_candidates"],
            span_cap=caps["span_cap"])), rec, setup)
    px = out[0]
    timeit("material sample (quad tables)", jax.jit(
        lambda t, u, v: tq.sample_material(t, u, v, 8, 128)),
        mats, px.uv[0], px.uv[1])


if __name__ == "__main__":
    main()
