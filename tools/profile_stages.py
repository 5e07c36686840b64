"""Per-stage timing of the 1080p ShaderBall frame on the real TPU.

Run on the bench device:  python tools/profile_stages.py

Times each pipeline stage in isolation (jitted, warmed, amortized over
ITERS with a tiny dependent readback as the sync barrier — see bench.py for
why block_until_ready alone is not trusted on tunnel-attached devices), plus
microbenchmarks of the primitives the renderer leans on (row gathers,
argsort) so kernel design decisions are grounded in measured rates.
"""

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
WARMUP = 2
ITERS = 10


def timeit(name, fn, *args, iters=ITERS, **kwargs):
    jfn = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = jfn(*args, **kwargs)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "shape")]

    def sync():
        for leaf in leaves:
            np.asarray(jax.device_get(leaf.ravel()[:1]))

    for _ in range(WARMUP):
        jfn(*args, **kwargs)
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args, **kwargs)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "shape")]
    sync()
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {ms:10.3f} ms")
    return out, ms


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops.geometry import assemble_scene
    from bibim_tpu.ops.interpolate import corner_indices, interpolate
    from bibim_tpu.ops.raster import bin_triangles, rasterize, triangle_setup
    from bibim_tpu.ops.raster_pallas import _pack_coefs, rasterize_pallas
    from bibim_tpu.ops.shading import shade_pbr
    from bibim_tpu.ops.texture import sample_bilinear
    from bibim_tpu.pipeline import (
        FrameParams,
        RenderSettings,
        ViewBlock,
        material_textures_from_set,
        render_frame,
    )
    from bibim_tpu.pipeline.framegraph import (
        make_overlay_resources,
        shade_visibility,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}")
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    settings = RenderSettings(width=WIDTH, height=HEIGHT)
    mats = material_textures_from_set(
        create_pbr_material_set(), scene.selected_material
    )
    overlay = make_overlay_resources()
    view_block = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    frame_params = FrameParams(
        enable_tone_mapping=jnp.int32(1), exposure=jnp.float32(1.0)
    )
    data = scene.scene_data()

    # ---- stage inputs -----------------------------------------------------
    soup = jax.jit(
        functools.partial(assemble_scene, material_ids=None)
    )(data.batches, view_block.view, view_block.proj)
    print(f"tris: {soup.tris.shape[0]}, verts: {soup.world.shape[0]}")

    # full current frame
    _, full_ms = timeit(
        "full render_frame (current)",
        functools.partial(render_frame, settings=settings),
        data, view_block, frame_params, mats, overlay,
        iters=4,
    )

    # no-overlay frame
    s2 = RenderSettings(width=WIDTH, height=HEIGHT, show_lights=False,
                        show_gizmo=False)
    timeit(
        "render_frame no overlays",
        functools.partial(render_frame, settings=s2),
        data, view_block, frame_params, mats, None,
        iters=4,
    )

    # binning + setup + pack
    def bin_stage(clip, tris):
        setup = triangle_setup(clip, tris, WIDTH, HEIGHT)
        ids, counts, ty, tx = bin_triangles(
            setup, WIDTH, HEIGHT, settings.pallas_tile_h, settings.tile_w,
            settings.pallas_cap,
        )
        return ids, counts, _pack_coefs(setup, ids)

    timeit("setup+bin+pack (pallas prep)", bin_stage, soup.clip, soup.tris)

    # full pallas raster incl bary recovery
    vis, raster_ms = timeit(
        "rasterize_pallas (full, incl. bary)",
        functools.partial(
            rasterize_pallas, width=WIDTH, height=HEIGHT,
            tile_h=settings.pallas_tile_h, tile_w=settings.tile_w,
            cap=settings.pallas_cap,
        ),
        soup.clip, soup.tris,
    )

    # XLA raster for comparison
    timeit(
        "rasterize XLA (tile64x128 cap4096)",
        functools.partial(
            rasterize, width=WIDTH, height=HEIGHT, tile_h=settings.tile_h,
            tile_w=settings.tile_w, cap=settings.bin_cap,
        ),
        soup.clip, soup.tris, iters=2,
    )

    # interpolation stage alone: 4 attrs
    def interp_stage(vis, soup):
        corners = corner_indices(vis, soup.tris)
        return (
            interpolate(vis, corners, soup.world),
            interpolate(vis, corners, soup.uv),
            interpolate(vis, corners, soup.normal),
            interpolate(vis, corners, soup.tangent),
        )

    (pw, uv, nrm, tan), _ = timeit("interpolate 4 attrs (gathers)",
                                   interp_stage, vis, soup)

    # texture sampling: 6 maps bilinear at pixel rate
    def tex_stage(mats, uv):
        return (
            sample_bilinear(mats.albedo, uv),
            sample_bilinear(mats.normal, uv),
            sample_bilinear(mats.metallic, uv),
            sample_bilinear(mats.roughness, uv),
            sample_bilinear(mats.ao, uv),
            sample_bilinear(mats.height, uv),
        )

    timeit("texture 6 maps bilinear", tex_stage, mats, uv)
    timeit("texture 1 map bilinear",
           lambda m, uv: sample_bilinear(m, uv), mats.albedo, uv)

    # shading alone
    def shade_stage(pw, nrm, alb):
        ones = jnp.ones(pw.shape[:2] + (1,), jnp.float32)
        return shade_pbr(pw, nrm, alb, ones * 0.5, ones * 0.5, ones,
                         data.lights, jnp.asarray(cam.pos))

    alb = jnp.ones(pw.shape[:2] + (3,), jnp.float32) * 0.5
    timeit("shade_pbr 3 lights", shade_stage, pw, nrm, alb)

    # whole shade_visibility (bands)
    timeit(
        "shade_visibility (banded, current)",
        functools.partial(shade_visibility, settings=settings),
        vis, soup, mats, data.lights, view_block, frame_params, iters=4,
    )

    print("\n--- microbenchmarks ---")
    key = jax.random.PRNGKey(0)
    n_idx = 8_000_000
    idx = jax.random.randint(key, (n_idx,), 0, 4_000_000)

    tex_u8 = jnp.zeros((4_200_000, 16), jnp.uint8)
    tex_f32 = jnp.zeros((4_200_000, 16), jnp.float32)
    timeit(f"gather {n_idx/1e6:.0f}M rows of (4.2M,16) u8",
           lambda t, i: t[i], tex_u8, idx)
    timeit(f"gather {n_idx/1e6:.0f}M rows of (4.2M,16) f32",
           lambda t, i: t[i], tex_f32, idx)
    idx2 = idx[:2_000_000]
    tex_u8_64 = jnp.zeros((4_200_000, 64), jnp.uint8)
    timeit("gather 2M rows of (4.2M,64) u8",
           lambda t, i: t[i], tex_u8_64, idx2)
    timeit("gather 2M rows of (4.2M,16) f32",
           lambda t, i: t[i], tex_f32, idx2)

    keys = jax.random.randint(key, (240_000,), 0, 2048)
    timeit("argsort 240k int32", lambda k: jnp.argsort(k), keys)
    keys2 = jax.random.randint(key, (1_000_000,), 0, 2048)
    timeit("argsort 1M int32", lambda k: jnp.argsort(k), keys2)

    v = jnp.zeros((2_073_600, 16), jnp.float32)
    timeit("elementwise 2M x16 (x*2+1)", lambda x: x * 2 + 1, v)

    print(f"\nfull frame: {full_ms:.1f} ms; raster: {raster_ms:.1f} ms")


if __name__ == "__main__":
    main()
