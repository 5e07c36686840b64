"""Real-TPU kernel validation — runs only with BIBIM_TPU_TESTS=1.

Compares the *compiled* Pallas kernels (fused raster+resolve, small-table
texture sampling) against the XLA fallback on actual TPU hardware — the
interpret-mode tests in test_fused.py / test_texture_quad.py validate
semantics, this validates the Mosaic compilation.

Usage (on a machine with a TPU attached):
    BIBIM_TPU_TESTS=1 python -m pytest tests/test_tpu.py -q
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("BIBIM_TPU_TESTS", "") != "1",
    reason="set BIBIM_TPU_TESTS=1 (needs a real TPU)",
)

W, H = 512, 256
TX, TH, TW = 4, 8, 128


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    return jax


def test_fused_kernel_compiled_matches_xla(tpu_backend):
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene
    from bibim_tpu.ops.raster import triangle_setup
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    data = scene.scene_data()
    soup = assemble_scene(
        data.batches, jnp.asarray(cam.get_view_matrix()),
        m3.perspective(60.0, W / H, 0.1, 1000.0), None,
    )
    setup = triangle_setup(soup.clip, soup.tris, W, H)
    rec = fused.build_record_table(
        setup, soup.tris, soup.uv, soup.normal, soup.tangent, soup.world,
        soup.color, soup.mat_id,
    )
    px_p, _, diag = fused.raster_fused_pallas(
        rec, setup, W, H, tile_h=TH, tile_w=TW,
        max_candidates=1024, overflow_cap=256, span_cap=64,
    )
    px_x, _, _ = fused.raster_fused_xla(
        rec, setup, soup.clip, soup.tris, W, H, cap=4096
    )
    assert int(diag.dropped_cap) == 0

    tid_p = np.asarray(fused.untile(px_p.tri_id, W, H, TX, TH, TW))
    tid_x = np.asarray(fused.untile(px_x.tri_id, W, H, TX, TH, TW))
    # Compiled-vs-XLA may flip true depth ties (3-LSB key quantization);
    # demand >99.9% agreement and identical coverage.
    assert (tid_p >= 0).sum() == (tid_x >= 0).sum()
    assert (tid_p != tid_x).mean() < 1e-3
    agree = tid_p == tid_x
    for a, b in zip(px_p.uv, px_x.uv):
        da = np.asarray(fused.untile(a, W, H, TX, TH, TW))
        db = np.asarray(fused.untile(b, W, H, TX, TH, TW))
        np.testing.assert_allclose(da[agree], db[agree], atol=1e-3)


def test_small_texture_kernel_compiled(tpu_backend):
    import jax.numpy as jnp

    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.texture import sample_bilinear

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 4), np.uint8)
    tables = tq.build_quad_tables({"ao": img})
    u = jnp.asarray(rng.uniform(-1, 2, (8, 1024)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1, 2, (8, 1024)).astype(np.float32))
    out = tq.sample_material(tables, u, v, use_pallas=True)
    ref = sample_bilinear(jnp.asarray(img), jnp.stack([u, v], -1))[..., 0]
    np.testing.assert_allclose(np.asarray(out["ao"]), np.asarray(ref),
                               atol=2e-3)


def test_block_blend_kernel_compiled(tpu_backend):
    """Compiled block-table Pallas blend vs the XLA block blend (which is
    bit-exact with the quad oracle) — ≤1-ulp FMA tolerance class."""
    import jax.numpy as jnp

    from bibim_tpu.ops import texture_quad as tq

    rng = np.random.default_rng(13)
    h = w = 64
    tex = np.zeros((h, w, 4), np.uint8)
    for c in range(3):
        tex[:, :, c] = rng.integers(0, 256, (h, w), np.uint8)
    block = tq._build_block_table(tex, h, w, ("roughness", "ao", "height"),
                                  4)
    nt, npx = 36, 1024
    u = jnp.asarray(rng.uniform(-1, 2, (nt, npx)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1, 2, (nt, npx)).astype(np.float32))
    want = tq.sample_table_block(block, u, v)
    got = tq.sample_table_block_pallas(block, u, v)
    for slot in ("roughness", "ao", "height"):
        np.testing.assert_allclose(np.asarray(want[slot]),
                                   np.asarray(got[slot]),
                                   rtol=3e-7, atol=3e-7)


def test_full_frame_on_tpu(tpu_backend):
    """End-to-end compiled frame renders with sane coverage."""
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, make_overlay_resources,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    mats = material_quads_from_set(create_pbr_material_set(),
                                   scene.selected_material)
    s = RenderSettings(width=W, height=H, outputs="full",
                       max_candidates=1024, span_cap=64, overflow_cap=256)
    out = render_frame(scene.scene_data(), vb, fp, mats,
                       make_overlay_resources(), s)
    tri = np.asarray(out["tri_id"])
    img = np.asarray(out["image"])
    assert (tri >= 0).mean() > 0.3  # ball + ground plane cover the frame
    assert img[tri >= 0].mean() > 20  # lit content, not black


def test_compact_paths_compiled_match_full(tpu_backend):
    """Compiled compact grids (pass-0 raster, coverage-compacted shading,
    compact overlay) produce the identical image to the full-grid path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, make_overlay_resources,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    mats = material_quads_from_set(create_pbr_material_set(),
                                   scene.selected_material)
    overlay = make_overlay_resources()
    s = RenderSettings(width=W, height=H, outputs="image",
                       max_candidates=1024, span_cap=64, overflow_cap=256)
    nt = (H // TH) * TX
    full = render_frame(scene.scene_data(), vb, fp, mats, overlay, s)
    compact = render_frame(
        scene.scene_data(), vb, fp, mats, overlay,
        dataclasses.replace(s, live_tile_cap=nt - 8,
                            raster_tile_cap=nt - 4),
    )
    a = np.asarray(jax.device_get(full["image"])).astype(np.int32)
    b = np.asarray(jax.device_get(compact["image"])).astype(np.int32)
    # Compiled fusions differ between the two graphs (FMA contraction),
    # so allow golden-image-style numeric noise — never coverage changes.
    diff = np.abs(a - b)
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
    assert (diff > 0).any(axis=-1).mean() < 0.02


def test_fused_shading_kernel_compiled(tpu_backend):
    """Compiled shade_tonemap_pallas vs the planar XLA oracle on TPU."""
    import jax.numpy as jnp

    from bibim_tpu.ops.shading_pallas import shade_tonemap_pallas
    from bibim_tpu.ops.shading_planar import shade_pbr_planar
    from bibim_tpu.scene.lights import make_lights

    rng = np.random.default_rng(11)
    nt, npx = 40, 1024

    def p(lo=0.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, (nt, npx)).astype(np.float32))

    world = (p(-5, 5), p(-5, 5), p(-5, 5))
    normal = (p(-1, 1), p(-1, 1), p(-1, 1))
    alb = (p(), p(), p())
    met, rough, ao = p(), p(0.05, 1.0), p()
    valid = jnp.asarray(rng.uniform(0, 1, (nt, npx)) > 0.3)
    lights = make_lights([
        dict(type=2, dir=(0.3, -1, 0.5), color=(1, 1, 1), intensity=3.0),
        dict(type=0, pos=(2, 3, -1), color=(1, 0.5, 0.2), intensity=10.0),
    ])
    vp = jnp.asarray([0.0, 1.0, -3.0])
    want = shade_pbr_planar(world, normal, alb, met, rough, ao, lights, vp)
    want = tuple(np.asarray(jnp.where(valid, c, 0.0)) for c in want)
    got = shade_tonemap_pallas(world, normal, alb, met, rough, ao, valid,
                               lights, vp, jnp.int32(0), jnp.float32(1.0),
                               quantize=False, tonemap=False)
    for c in range(3):
        np.testing.assert_allclose(np.asarray(got[c]), want[c],
                                   rtol=2e-5, atol=2e-5)


def test_hud_overlay_compiled(tpu_backend):
    """HUD cells burn into the compiled frame through the compact overlay
    kernel."""
    import dataclasses

    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.host.hud import build_hud_geometry, hud_text_mask
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    s = RenderSettings(width=W, height=H, outputs="image", shading="flat",
                       show_gizmo=False, show_lights=False,
                       max_candidates=1024, span_cap=64, overflow_cap=256)
    geom = build_hud_geometry(W, H, max_chars=12, origin=(4, 4), scale=2)
    base = render_frame(scene.scene_data(), vb, fp, None, None, s)
    out = render_frame(
        scene.scene_data(), vb, fp, None, None,
        dataclasses.replace(s, show_hud=True),
        hud=(geom, jnp.asarray(hud_text_mask("123 FPS", 12))),
    )
    a = np.asarray(base["image"])
    b = np.asarray(out["image"])
    assert (b[:20, :160] == 255).all(axis=-1).any()
    np.testing.assert_array_equal(a[24:], b[24:])


def test_sharded_band_kernel_compiled(tpu_backend):
    """One-device 'mesh': the band path (record-table y-rebase + band
    binning + band compaction) compiles and matches the single-chip
    image."""
    import jax

    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.parallel import make_device_mesh, render_frame_sharded
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, material_quads_from_set,
        render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    mats = material_quads_from_set(create_pbr_material_set(),
                                   scene.selected_material)
    s = RenderSettings(width=W, height=H, outputs="image",
                       show_gizmo=False, show_lights=False,
                       max_candidates=1024, span_cap=64, overflow_cap=256,
                       live_tile_cap=120)
    single = render_frame(scene.scene_data(), vb, fp, mats, None, s)
    mesh = make_device_mesh(1)
    sharded = render_frame_sharded(mesh, scene.scene_data(), vb, fp, mats,
                                   s)
    a = np.asarray(jax.device_get(single["image"])).astype(np.int32)
    b = np.asarray(sharded).astype(np.int32)
    diff = np.abs(a - b)
    assert diff.max() <= 1
    assert (diff > 0).any(axis=-1).mean() < 0.02

    # Production sampler on the band path (VERDICT r3 #6): quad-rate
    # routing is band-local (pair groups live inside 8-row tiles, tiles
    # inside bands), so the sharded routed image must BIT-match the
    # sharded exact image.
    import dataclasses

    s_pair = dataclasses.replace(s, pair_sampling=2,
                                 sample_route_caps=(128, 128))
    routed = render_frame_sharded(mesh, scene.scene_data(), vb, fp, mats,
                                  s_pair)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(routed))


def test_sampled_shade_kernel_compiled(tpu_backend):
    """Production deferred image (ONE fused sampling+normal-map+quantize+
    shade Pallas pass) vs the outputs='full' oracle chain (standalone
    sampling kernels + XLA normal map/mask/fp16 + shade oracle)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, material_quads_from_set,
        render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(1),  # exercise the TBN path in-kernel
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    mats = material_quads_from_set(create_pbr_material_set(),
                                   scene.selected_material)
    s = RenderSettings(width=W, height=H, outputs="image",
                       show_gizmo=False, show_lights=False,
                       max_candidates=1024, span_cap=64, overflow_cap=256)
    prod = render_frame(scene.scene_data(), vb, fp, mats, None, s)
    full = render_frame(scene.scene_data(), vb, fp, mats, None,
                        dataclasses.replace(s, outputs="full"))
    a = np.asarray(jax.device_get(prod["image"])).astype(np.int32)
    b = np.asarray(jax.device_get(full["image"])).astype(np.int32)
    diff = np.abs(a - b)
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
    assert (diff > 0).any(axis=-1).mean() < 0.02


def test_pair_sampling_routed_exact(tpu_backend):
    """THE headline parity pin (VERDICT r3 #1): the production quad-rate
    sampler (pair_sampling with exact tile routing, _sampled_hdr) is
    BIT-IDENTICAL to per-pixel sampling on the compiled production path,
    at both pair levels, with and without autotuned route caps."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, make_overlay_resources,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.utils.validation import check_bin_diag

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(1),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    mats = material_quads_from_set(create_pbr_material_set(),
                                   scene.selected_material)
    overlay = make_overlay_resources()
    s = RenderSettings(width=W, height=H, outputs="image",
                       max_candidates=1024, span_cap=64, overflow_cap=256)
    data = scene.scene_data()
    base = np.asarray(jax.device_get(
        render_frame(data, vb, fp, mats, overlay, s)["image"]))
    for pair in (1, 2):
        routed = np.asarray(jax.device_get(render_frame(
            data, vb, fp, mats, overlay,
            dataclasses.replace(s, pair_sampling=pair))["image"]))
        np.testing.assert_array_equal(base, routed), pair

    # Autotuned caps + coverage compaction, validated via image+diag.
    # The derivation may also DISABLE routing (escape-dominated frames:
    # pair_sampling→0, autotune.derive_settings) — either outcome must
    # produce the exact image.
    s2, probe = autotune_settings(
        data, vb, dataclasses.replace(s, pair_sampling=2), margin=1.2,
        materials=mats,
    )
    assert probe.escape_tiles >= 0
    assert (s2.sample_route_caps is not None) == (s2.pair_sampling != 0)
    s2 = dataclasses.replace(s2, outputs="image+diag")
    out = render_frame(data, vb, fp, mats, overlay, s2)
    check_bin_diag(jax.device_get(out["bin_diag"]))
    exact2 = np.asarray(jax.device_get(render_frame(
        data, vb, fp, mats, overlay,
        dataclasses.replace(s2, pair_sampling=0))["image"]))
    np.testing.assert_array_equal(
        exact2, np.asarray(jax.device_get(out["image"])))


def test_pair_lossy_bounds_full_1080p(tpu_backend):
    """Full-scale pin of the LOSSY performance mode (VERDICT r4 #6): at
    the actual 1080p headline frame with production (autotuned) caps,
    the window-clamp sampler (pair_sampling + pair_lossy, the 5.58 ms
    r3 mode) must stay within its documented error bounds vs the exact
    image. The 13/255 MAGNITUDE bound is the transferable claim; the
    fractions are scene-mix-dependent (the r3 exp_pair channel-level
    figures were 1.35%/0.03% — the full production IMAGE measures
    4.17% differ, 0.054% beyond 4/255, mean 0.048, r5), so this pins
    the measured production mix with regression headroom. The
    minified-frame CI pin
    (test_pipeline.py::test_pair_lossy_error_bounds_minified) covers
    the error model; this covers the shipped scene at full scale."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, make_overlay_resources,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    w, h = 1920, 1080
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    mats = jax.device_put(material_quads_from_set(
        create_pbr_material_set(), scene.selected_material))
    overlay = make_overlay_resources()
    data = scene.scene_data()
    base = RenderSettings(width=w, height=h, outputs="image",
                          overlay_candidates=256, overlay_max_tiles=384)
    s, _probe = autotune_settings(data, vb, base, margin=1.05,
                                  materials=mats)
    exact = np.asarray(jax.device_get(render_frame(
        data, vb, fp, mats, overlay, s)["image"])).astype(np.int32)
    lossy = np.asarray(jax.device_get(render_frame(
        data, vb, fp, mats, overlay,
        dataclasses.replace(s, pair_sampling=2, pair_lossy=True),
    )["image"])).astype(np.int32)
    d = np.abs(exact - lossy).max(axis=-1)
    assert d.max() <= 13, f"max err {d.max()}/255 exceeds documented 13"
    assert (d > 0).mean() <= 0.06, f"diff frac {(d > 0).mean():.4f} > 6%"
    assert (d > 4).mean() <= 0.0015, f">4/255 frac {(d > 4).mean():.5f}"
    assert d.mean() <= 0.1, f"mean err {d.mean():.4f}"


def test_earlyz_compiled_bit_exact(tpu_backend):
    """Early-z (z-bucket candidate order + remaining-work break + dual
    (z, draw-order) tie key) must be a PURE schedule change on compiled
    Mosaic too: identical depth keys and winner ids vs the draw-ordered
    scan at drop-free capacities (tools/exp_earlyz2.py measured the same
    at 1080p/x64; this pins it in CI)."""
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene
    from bibim_tpu.ops.raster import triangle_setup
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    data = scene.scene_data()
    soup = assemble_scene(
        data.batches, jnp.asarray(cam.get_view_matrix()),
        m3.perspective(60.0, W / H, 0.1, 1000.0), None,
    )
    setup = triangle_setup(soup.clip, soup.tris, W, H)
    rec = fused.build_record_table(
        setup, soup.tris, soup.uv, soup.normal, soup.tangent, soup.world,
        soup.color, soup.mat_id,
    )
    kw = dict(tile_h=TH, tile_w=TW, max_candidates=1024, overflow_cap=256,
              span_cap=64)
    px_a, zk_a, diag_a = fused.raster_fused_pallas(
        rec, setup, W, H, earlyz=False, **kw)
    px_b, zk_b, diag_b = fused.raster_fused_pallas(
        rec, setup, W, H, earlyz=True, **kw)
    assert int(diag_a.dropped_cap) == 0
    np.testing.assert_array_equal(np.asarray(zk_a), np.asarray(zk_b))
    np.testing.assert_array_equal(np.asarray(px_a.tri_id),
                                  np.asarray(px_b.tri_id))
    for a, b in zip(px_a.uv, px_b.uv):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
