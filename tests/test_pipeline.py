"""End-to-end frame-function tests: scenes render, invariants hold,
sharded rendering matches single-device."""

import jax.numpy as jnp
import numpy as np
import pytest

from bibim_tpu import math3d as m3
from bibim_tpu.pipeline import (
    FrameParams,
    GBufferViz,
    RenderSettings,
    ViewBlock,
    render_frame,
)
from bibim_tpu.scene import FreeLookCamera, TriangleScene
from bibim_tpu.scene.lights import make_lights
from bibim_tpu.scene.scene import SceneData, batch_from_mesh
from bibim_tpu.assets.meshgen import generate_uv_sphere_mesh
from bibim_tpu.pipeline.framegraph import MaterialTextures
from bibim_tpu.utils.config import get_resource_root

W, H = 128, 64
SMALL = dict(xla_cap=256)  # CPU tests ride the XLA fallback raster


def _flat_materials():
    def tex(r, g, b):
        t = np.zeros((4, 4, 4), np.uint8)
        t[..., 0], t[..., 1], t[..., 2], t[..., 3] = r, g, b, 255
        return jnp.asarray(t)

    return MaterialTextures(
        albedo=tex(200, 120, 80),
        metallic=tex(0, 0, 0),
        roughness=tex(128, 128, 128),
        ao=tex(255, 255, 255),
        normal=tex(128, 128, 255),
        height=tex(0, 0, 0),
    )


def _view(cam=None):
    cam = cam or FreeLookCamera()
    return ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )


def _fp(tonemap=1, exposure=1.0):
    return FrameParams(enable_tone_mapping=jnp.int32(tonemap),
                       exposure=jnp.float32(exposure))


def _sphere_scene():
    mesh = generate_uv_sphere_mesh(1.0, 12, 8)
    model = np.asarray(m3.translate([0.0, 0.0, 4.0]))
    lights = make_lights([dict(type=2, dir=(0, -1, 1), color=(1, 1, 1), intensity=3.0)])
    return SceneData(batches=(batch_from_mesh(mesh, model),), lights=lights)


class TestRenderFrame:
    def test_triangle_scene_renders(self):
        scene = TriangleScene()
        out = render_frame(scene.scene_data(), _view(), _fp(0), _flat_materials(),
                           None, RenderSettings(width=W, height=H, **SMALL))
        img = np.asarray(out["image"])
        assert img.shape == (H, W, 3) and img.dtype == np.uint8
        assert (np.asarray(out["tri_id"]) >= 0).any()

    def test_background_is_black(self):
        scene = _sphere_scene()
        out = render_frame(scene, _view(), _fp(1), _flat_materials(), None,
                           RenderSettings(width=W, height=H, **SMALL))
        miss = np.asarray(out["tri_id"]) < 0
        assert (np.asarray(out["image"])[miss] == 0).all()

    def test_tonemap_toggle_no_recompile_semantics(self):
        scene = _sphere_scene()
        s = RenderSettings(width=W, height=H, **SMALL)
        out_on = render_frame(scene, _view(), _fp(1, 2.0), _flat_materials(), None, s)
        out_off = render_frame(scene, _view(), _fp(0), _flat_materials(), None, s)
        hdr = np.asarray(out_off["ldr"])
        mapped = np.asarray(out_on["ldr"])
        hit = np.asarray(out_on["tri_id"]) >= 0
        np.testing.assert_allclose(
            mapped[hit], 1.0 - np.exp(-hdr[hit] * 2.0), atol=2e-3
        )

    def test_gbuffer_viz_outputs_raw_planes(self):
        scene = _sphere_scene()
        out = render_frame(
            scene, _view(), _fp(0), _flat_materials(), None,
            RenderSettings(width=W, height=H, gbuffer_viz=GBufferViz.NORMAL, **SMALL),
        )
        hit = np.asarray(out["tri_id"]) >= 0
        # normals in [-1,1]; raw plane written to hdr
        assert np.abs(np.asarray(out["hdr"])[hit]).max() <= 1.0 + 1e-3

    def test_forward_matches_deferred_modulo_quantization(self):
        scene = _sphere_scene()
        out_d = render_frame(scene, _view(), _fp(1), _flat_materials(), None,
                             RenderSettings(width=W, height=H, deferred=True,
                                            quantize_fp16=False, **SMALL))
        out_f = render_frame(scene, _view(), _fp(1), _flat_materials(), None,
                             RenderSettings(width=W, height=H, deferred=False,
                                            quantize_fp16=False, **SMALL))
        np.testing.assert_allclose(
            np.asarray(out_d["ldr"]), np.asarray(out_f["ldr"]), atol=1e-5
        )

    def test_live_tile_cap_matches_full_shading(self):
        """Coverage-compacted shading equals the full path when the cap
        holds every covered tile (and is a validated capacity when not)."""
        import dataclasses

        from bibim_tpu.ops import texture_quad as tq

        def flat(val):
            return np.full((4, 4, 1), val, np.uint8)

        mats = tq.build_quad_tables({
            "alb_r": flat(200), "alb_g": flat(120), "alb_b": flat(80),
            "nrm_x": flat(128), "nrm_y": flat(128), "nrm_z": flat(255),
            "metallic": flat(0), "roughness": flat(128), "ao": flat(255),
            "height": flat(0),
        })
        scene = _sphere_scene()
        s = RenderSettings(width=W, height=H, outputs="image", **SMALL)
        full = render_frame(scene, _view(), _fp(1), mats, None, s)
        nt = (H // 8) * (W // 128)
        compact = render_frame(
            scene, _view(), _fp(1), mats, None,
            dataclasses.replace(s, live_tile_cap=nt - 1),
        )
        np.testing.assert_array_equal(np.asarray(full["image"]),
                                      np.asarray(compact["image"]))
        # Validation path: full outputs shade uncompacted but report the
        # would-be overflow of the production cap.
        out_ok = render_frame(
            scene, _view(), _fp(1), mats, None,
            dataclasses.replace(s, live_tile_cap=nt - 1, outputs="full"),
        )
        assert int(out_ok["bin_diag"].dropped_tiles) == 0
        out_small = render_frame(
            scene, _view(), _fp(1), mats, None,
            dataclasses.replace(s, live_tile_cap=1, outputs="full"),
        )
        assert int(out_small["bin_diag"].dropped_tiles) > 0

    def test_live_tile_cap_forward_path(self):
        """Compacted shading composes with the true forward path."""
        import dataclasses

        from bibim_tpu.ops import texture_quad as tq

        def flat(val):
            return np.full((4, 4, 1), val, np.uint8)

        mats = tq.build_quad_tables({
            "alb_r": flat(180), "alb_g": flat(90), "alb_b": flat(60),
            "nrm_x": flat(128), "nrm_y": flat(128), "nrm_z": flat(255),
            "metallic": flat(10), "roughness": flat(100), "ao": flat(255),
            "height": flat(0),
        })
        scene = _sphere_scene()
        s = RenderSettings(width=W, height=H, outputs="image",
                           deferred=False, **SMALL)
        nt = (H // 8) * (W // 128)
        full = render_frame(scene, _view(), _fp(1), mats, None, s)
        compact = render_frame(
            scene, _view(), _fp(1), mats, None,
            dataclasses.replace(s, live_tile_cap=nt - 1),
        )
        np.testing.assert_array_equal(np.asarray(full["image"]),
                                      np.asarray(compact["image"]))

    def test_pair_sampling_frame(self):
        """pair_sampling is a pure PERFORMANCE hint: the default (routed)
        sampler must render IDENTICAL frames — textured noise maps
        included. Only the explicit pair_lossy debug switch may differ,
        and then only inside covered tiles (the round-3 window-clamp
        error model, still pinned by tests/test_texture_pair.py)."""
        import dataclasses

        from bibim_tpu.ops import texture_quad as tq

        def flat(val):
            return np.full((64, 64, 1), val, np.uint8)

        const_maps = {
            "alb_r": flat(180), "alb_g": flat(90), "alb_b": flat(60),
            "nrm_x": flat(128), "nrm_y": flat(128), "nrm_z": flat(255),
            "metallic": flat(10), "roughness": flat(100), "ao": flat(255),
            "height": flat(0),
        }
        mats = tq.build_quad_tables(const_maps, block_threshold=1024)
        assert any(isinstance(t, tq.BlockTable) for t in mats)
        scene = _sphere_scene()
        s = RenderSettings(width=W, height=H, outputs="image", **SMALL)
        rng = np.random.default_rng(4)
        tex_maps = dict(const_maps)
        tex_maps["roughness"] = rng.integers(
            0, 256, (64, 64, 1), np.uint8)
        mats_t = tq.build_quad_tables(tex_maps, block_threshold=1024)
        full_t = np.asarray(render_frame(
            scene, _view(), _fp(1), mats_t, None, s)["image"])
        for pair in (1, 2):
            pair_t = np.asarray(render_frame(
                scene, _view(), _fp(1), mats_t, None,
                dataclasses.replace(s, pair_sampling=pair))["image"])
            np.testing.assert_array_equal(full_t, pair_t)

        # Lossy mode (measurement tool): may differ, but only where
        # geometry covers pixels.
        lossy_t = np.asarray(render_frame(
            scene, _view(), _fp(1), mats_t, None,
            dataclasses.replace(s, pair_sampling=True, pair_lossy=True),
        )["image"])
        diff = np.any(full_t != lossy_t, axis=-1)
        cover = np.asarray(render_frame(
            scene, _view(), _fp(1), mats_t, None,
            dataclasses.replace(s, outputs="full"))["depth"]) != 0
        assert diff.sum() > 0
        assert not np.any(diff & ~cover)

    def test_pair_lossy_error_bounds_minified(self):
        """CI pin of the lossy window-clamp sampler's error model
        (VERDICT r3 #4): on a minified noise+gradient textured frame at
        the production regime (rho in [2, 4] texels/px), quad-rate
        pair_lossy must stay within the documented bounds vs exact —
        max |d| <= 13/255, diff fraction <= 2%, >4/255 fraction <= 0.1%
        (the figures measured on the 1080p headline frame,
        tools/exp_pair.py / docs/PERFORMANCE.md round-3 section)."""
        import dataclasses

        from bibim_tpu.assets.meshgen import generate_quad_mesh
        from bibim_tpu.ops import texture_quad as tq

        # Full-viewport quad with a 256^2 texture: 256 texels across
        # 128 px horizontally (rho_x = 2) and across 64 px vertically
        # (rho_y = 4) — the measured headline minification band.
        rng = np.random.default_rng(7)
        gx = np.broadcast_to(
            np.linspace(0, 200, 256, dtype=np.float32)[None, :],
            (256, 256))

        def noisy(base):
            # Band-limited noise: the clamp error is bounded by texel
            # contrast inside the shared window, so the texture model
            # must match production texture statistics (smooth at the
            # ~8-texel scale), not white noise — a wrap-correct 4-tap
            # box blur twice per axis keeps ~±28 amplitude at low
            # frequency.
            n = rng.uniform(-56, 56, (256, 256)).astype(np.float32)
            for _ in range(2):
                for ax in (0, 1):
                    n = sum(np.roll(n, k, axis=ax) for k in range(8)) / 8.0
            return np.clip(base + n, 0, 255).astype(np.uint8)[..., None]

        maps = {
            "alb_r": noisy(gx), "alb_g": noisy(gx[::-1].T),
            "alb_b": noisy(np.full((256, 256), 40, np.float32)),
            "nrm_x": np.full((256, 256, 1), 128, np.uint8),
            "nrm_y": np.full((256, 256, 1), 128, np.uint8),
            "nrm_z": np.full((256, 256, 1), 255, np.uint8),
            "metallic": np.full((256, 256, 1), 10, np.uint8),
            "roughness": noisy(np.full((256, 256), 100, np.float32)),
            "ao": np.full((256, 256, 1), 255, np.uint8),
            "height": np.full((256, 256, 1), 0, np.uint8),
        }
        mats = tq.build_quad_tables(maps, block_threshold=1024)
        assert any(isinstance(t, tq.BlockTable) for t in mats)

        # Quad (unit XY, -Z normal) scaled past the 60-deg frustum at
        # z=2 (visible height 2*2*tan30 = 2.31, width 4.62).
        mesh = generate_quad_mesh()
        model = np.asarray(m3.translate([0.0, 0.0, 2.0]),
                           np.float32) @ np.asarray(
            m3.scale([5.0, 2.6, 1.0]), np.float32)
        lights = make_lights([dict(type=2, dir=(0, -0.3, 1),
                                   color=(1, 1, 1), intensity=2.0)])
        scene = SceneData(batches=(batch_from_mesh(mesh, model),),
                          lights=lights)
        s = RenderSettings(width=W, height=H, outputs="image", **SMALL)

        exact = np.asarray(render_frame(
            scene, _view(), _fp(1), mats, None, s)["image"]).astype(np.int32)
        covered = np.asarray(render_frame(
            scene, _view(), _fp(1), mats, None,
            dataclasses.replace(s, outputs="full"))["tri_id"]) >= 0
        assert covered.mean() > 0.9, "quad must fill the viewport"

        lossy = np.asarray(render_frame(
            scene, _view(), _fp(1), mats, None,
            dataclasses.replace(s, pair_sampling=2, pair_lossy=True),
        )["image"]).astype(np.int32)
        d = np.abs(exact - lossy).max(axis=-1)
        # The 13/255 MAGNITUDE bound is the transferable claim (clamp
        # error <= window-escape distance x local texel contrast); the
        # production-frame fractions (1.35% differ, 0.03% > 4/255 —
        # tools/exp_pair.py, 1080p TPU) are scene-mix-dependent, so this
        # worst-case frame pins its own measured mix (36.7% differ,
        # 1.37% > 4/255, mean 0.65) with regression headroom. Rep rows
        # must stay bit-exact — the structural half of the error model.
        assert d.max() <= 13, f"max err {d.max()}/255 exceeds documented 13"
        assert (d > 0).mean() <= 0.45, f"diff frac {(d > 0).mean():.4f}"
        assert (d > 4).mean() <= 0.025, f">4/255 frac {(d > 4).mean():.5f}"
        assert d.mean() <= 1.0, f"mean err {d.mean():.3f}"
        assert (d.max(axis=1) == 0).sum() >= H // 2, \
            "rep rows must be bit-exact"

    def test_random_cameras_render_finite(self):
        """Random poses (including inside-geometry / near-plane-straddling
        views) must render finite images with zero capacity drops."""
        from bibim_tpu.utils.validation import check_bin_diag

        rng = np.random.default_rng(11)
        scene = _sphere_scene()
        s = RenderSettings(width=W, height=H, outputs="full", **SMALL)
        for trial in range(6):
            cam = FreeLookCamera(
                pos=rng.uniform(-3, 6, 3).astype(np.float32),
                yaw=float(rng.uniform(0, 360)),
                pitch=float(rng.uniform(-80, 80)),
            )
            vb = ViewBlock(
                view=jnp.asarray(cam.get_view_matrix()),
                proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
                view_pos=jnp.asarray(cam.pos),
                enable_normal_map=jnp.int32(0),
            )
            out = render_frame(scene, vb, _fp(1), _flat_materials(),
                               None, s)
            assert np.isfinite(np.asarray(out["hdr"])).all(), trial
            check_bin_diag(out["bin_diag"], where=f"random cam {trial}")

    def test_random_settings_combos_render_finite(self):
        """Random FEATURE-MATRIX combinations (path × viz × overlays ×
        sampler × aniso × tonemap × normal map) must render finite
        frames with zero capacity drops — a combo-regression guard over
        the toggles the GUI exposes (each toggle's semantics are pinned
        individually elsewhere; this pins that they compose)."""
        import dataclasses

        from bibim_tpu.ops import texture_quad as tq
        from bibim_tpu.pipeline import GBufferViz
        from bibim_tpu.pipeline.framegraph import make_overlay_resources
        from bibim_tpu.utils.validation import check_bin_diag

        rng = np.random.default_rng(23)

        def flat(val):
            return np.full((64, 64, 1), val, np.uint8)

        maps = {
            "alb_r": rng.integers(0, 256, (64, 64, 1), np.uint8),
            "alb_g": flat(90), "alb_b": flat(60),
            "nrm_x": flat(128), "nrm_y": flat(140), "nrm_z": flat(250),
            "metallic": flat(10),
            "roughness": rng.integers(0, 256, (64, 64, 1), np.uint8),
            "ao": flat(255), "height": flat(0),
        }
        mats = tq.build_quad_tables(maps, block_threshold=1024)
        scene = _sphere_scene()
        overlay = make_overlay_resources()
        base = RenderSettings(width=W, height=H, outputs="full", **SMALL)
        vizzes = list(GBufferViz)
        for trial in range(8):
            s = dataclasses.replace(
                base,
                deferred=bool(rng.integers(0, 2)),
                gbuffer_viz=vizzes[int(rng.integers(0, len(vizzes)))],
                show_tbn=bool(rng.integers(0, 2)),
                show_gizmo=bool(rng.integers(0, 2)),
                show_lights=bool(rng.integers(0, 2)),
                show_hud=False,
                pair_sampling=int(rng.integers(0, 3)),
                aniso_taps=int(rng.choice([1, 1, 2, 4])),
                srgb_output=bool(rng.integers(0, 2)),
            )
            vb = _view()._replace(
                enable_normal_map=jnp.int32(int(rng.integers(0, 2))))
            fp = _fp(int(rng.integers(0, 2)),
                     float(rng.uniform(0.3, 3.0)))
            out = render_frame(scene, vb, fp, mats, overlay, s)
            img = np.asarray(out["image"])
            assert img.dtype == np.uint8 and img.shape == (H, W, 3), trial
            assert np.isfinite(np.asarray(out["hdr"])).all(), trial
            check_bin_diag(out["bin_diag"], where=f"combo {trial}")

    def test_instance_frustum_culling_preserves_image(self):
        """Host-side frustum culling drops certainly-offscreen instances
        (padded to a power-of-two bucket) without changing a pixel."""
        from bibim_tpu.scene.culling import cull_scene_instances

        mesh = generate_uv_sphere_mesh(1.0, 12, 8)
        models = np.stack([
            np.asarray(m3.translate([0.0, 0.0, 4.0])),   # visible
            np.asarray(m3.translate([80.0, 0.0, 4.0])),  # far right: out
            np.asarray(m3.translate([0.0, 0.0, -50.0])),  # behind: out
            np.asarray(m3.translate([2.0, 0.0, 6.0])),   # visible
        ])
        lights = make_lights([
            dict(type=2, dir=(0, -1, 1), color=(1, 1, 1), intensity=3.0)
        ])
        scene = SceneData(batches=(batch_from_mesh(mesh, models),),
                          lights=lights)
        vb = _view()
        s = RenderSettings(width=W, height=H, **SMALL)
        full = render_frame(scene, vb, _fp(1), _flat_materials(), None, s)
        culled = cull_scene_instances(scene, np.asarray(vb.view),
                                      np.asarray(vb.proj))
        assert culled.batches[0].model.shape[0] == 2  # 2 visible → bucket 2
        out = render_frame(culled, vb, _fp(1), _flat_materials(), None, s)
        np.testing.assert_array_equal(np.asarray(full["image"]),
                                      np.asarray(out["image"]))

    def test_forward_viz_shows_cleared_gbuffer(self):
        """In forward mode nothing writes the G-buffer attachments, so a
        visualization request shows the cleared (black) planes — the
        reference's subpass structure (main.cpp:106-121)."""
        scene = _sphere_scene()
        out = render_frame(
            scene, _view(), _fp(0), _flat_materials(), None,
            RenderSettings(width=W, height=H, deferred=False,
                           gbuffer_viz=GBufferViz.NORMAL, **SMALL),
        )
        assert (np.asarray(out["hdr"]) == 0.0).all()
        assert (np.asarray(out["image"]) == 0).all()

    def test_fallback_bins_full_multipass_capacity(self):
        """The XLA fallback must bin with the Pallas capacity model
        (max_candidates × raster_passes), not just xla_cap: a tile
        demanding more than xla_cap but within cap×passes must render
        drop-free (regression: the autotuned sharded band raster and
        shadow pass ACTUALLY dropped geometry on CPU because the
        fallback binned one window's worth — framegraph._raster)."""
        from bibim_tpu.utils.validation import check_bin_diag

        # 700 tiny triangles stacked inside one screen tile: demand 700
        # candidates; xla_cap=256 alone would actually drop 444.
        n = 700
        rng = np.random.default_rng(3)
        off = rng.uniform(-0.05, 0.05, (n, 2)).astype(np.float32)
        tri = np.array([[0.0, 0.0], [0.15, 0.0], [0.03, 0.12]], np.float32)
        depth = np.linspace(0.2, 0.8, n, dtype=np.float32)
        clip = np.zeros((n * 3, 4), np.float32)
        for i in range(n):
            clip[i * 3:(i + 1) * 3, 0] = tri[:, 0] + off[i, 0]
            clip[i * 3:(i + 1) * 3, 1] = tri[:, 1] + off[i, 1]
            clip[i * 3:(i + 1) * 3, 2] = depth[i]
            clip[i * 3:(i + 1) * 3, 3] = 1.0
        # Identity view/proj: positions pass through as clip (w=1), so
        # the stack lands in the screen-center tile. Flat shading reads
        # vertex color; geometry alone drives the capacity check.
        from bibim_tpu.assets.mesh import Mesh

        mesh = Mesh(
            positions=clip[:, :3],
            uvs=np.zeros((n * 3, 2), np.float32),
            normals=np.tile(np.array([[0.0, 0.0, -1.0]], np.float32),
                            (n * 3, 1)),
            tangents=np.tile(np.array([[0.0, -1.0, 0.0]], np.float32),
                             (n * 3, 1)),
            indices=np.arange(n * 3, dtype=np.int32).reshape(n, 3),
            colors=np.ones((n * 3, 3), np.float32),
        )
        lights = make_lights([dict(type=2, dir=(0, 0, 1),
                                   color=(1, 1, 1), intensity=1.0)])
        scene = SceneData(batches=(batch_from_mesh(mesh),), lights=lights)
        # Identity-like view: positions already near clip space.
        vb = ViewBlock(view=jnp.eye(4), proj=jnp.eye(4),
                       view_pos=jnp.zeros(3),
                       enable_normal_map=jnp.int32(0))
        s = RenderSettings(width=W, height=H, shading="flat",
                           deferred=False, show_gizmo=False,
                           show_lights=False, outputs="image+diag",
                           xla_cap=256, max_candidates=384,
                           raster_passes=2)
        out = render_frame(scene, vb, _fp(0), _flat_materials(), None, s)
        check_bin_diag(out["bin_diag"], where="multipass fallback")
        assert (np.asarray(out["image"]) > 0).any()


needs_assets = pytest.mark.skipif(
    not get_resource_root().common("gizmo.obj").is_file(),
    reason="reference assets not mounted",
)


@needs_assets
class TestOverlays:
    def test_gizmo_and_lights_composite(self):
        from bibim_tpu.pipeline.framegraph import make_overlay_resources

        scene = _sphere_scene()
        overlay = make_overlay_resources()
        base = render_frame(scene, _view(), _fp(1), _flat_materials(), None,
                            RenderSettings(width=W, height=H, **SMALL))
        with_ov = render_frame(
            scene, _view(), _fp(1), _flat_materials(), overlay,
            RenderSettings(width=W, height=H, gizmo_extent=32, **SMALL),
        )
        assert not np.array_equal(np.asarray(base["image"]),
                                  np.asarray(with_ov["image"]))

    def test_tbn_lines_draw(self):
        from bibim_tpu.pipeline.framegraph import make_overlay_resources

        scene = _sphere_scene()
        overlay = make_overlay_resources()
        s = RenderSettings(width=W, height=H, show_tbn=True, show_lights=False,
                           show_gizmo=False, **SMALL)
        out = render_frame(scene, _view(), _fp(1), _flat_materials(), overlay, s)
        img = np.asarray(out["image"]).astype(int)
        # pure R/G/B line pixels exist
        red = (img[..., 0] > 200) & (img[..., 1] < 60) & (img[..., 2] < 60)
        blue = (img[..., 2] > 200) & (img[..., 0] < 60) & (img[..., 1] < 60)
        assert red.any() and blue.any()


class TestHud:
    def test_hud_draws_text_pixels(self):
        """--hud burns white glyph pixels into the frame top-left; the
        rest of the frame is bit-identical to the HUD-off render."""
        import dataclasses

        from bibim_tpu.host.hud import build_hud_geometry, hud_text_mask

        scene = _sphere_scene()
        s = RenderSettings(width=W, height=H, **SMALL)
        base = render_frame(scene, _view(), _fp(1), _flat_materials(),
                            None, s)
        geom = build_hud_geometry(W, H, max_chars=8, origin=(2, 2),
                                  scale=1)
        mask = hud_text_mask("60.0FPS", geom.max_chars)
        out = render_frame(
            scene, _view(), _fp(1), _flat_materials(), None,
            dataclasses.replace(s, show_hud=True),
            hud=(geom, jnp.asarray(mask)),
        )
        a = np.asarray(base["image"])
        b = np.asarray(out["image"])
        text_region = b[:12, :60]
        assert (text_region == 255).all(axis=-1).any(), "no lit glyph px"
        # Outside the text line the frame is untouched.
        np.testing.assert_array_equal(a[20:], b[20:])

    def test_hud_disabled_is_noop(self):
        """show_hud=False (or hud=None) must be bit-exact with no HUD —
        the additive-feature invariant (CLAUDE.md)."""
        import dataclasses

        scene = _sphere_scene()
        s = RenderSettings(width=W, height=H, **SMALL)
        base = render_frame(scene, _view(), _fp(1), _flat_materials(),
                            None, s)
        off = render_frame(scene, _view(), _fp(1), _flat_materials(),
                           None, dataclasses.replace(s, show_hud=True),
                           hud=None)
        np.testing.assert_array_equal(np.asarray(base["image"]),
                                      np.asarray(off["image"]))

    def test_hud_empty_mask_is_noop(self):
        """An all-spaces text line lights nothing (degenerate quads)."""
        import dataclasses

        from bibim_tpu.host.hud import build_hud_geometry, hud_text_mask

        scene = _sphere_scene()
        s = RenderSettings(width=W, height=H, **SMALL)
        base = render_frame(scene, _view(), _fp(1), _flat_materials(),
                            None, s)
        geom = build_hud_geometry(W, H, max_chars=8, origin=(2, 2),
                                  scale=1)
        out = render_frame(
            scene, _view(), _fp(1), _flat_materials(), None,
            dataclasses.replace(s, show_hud=True),
            hud=(geom, jnp.asarray(hud_text_mask("        ", 8))),
        )
        np.testing.assert_array_equal(np.asarray(base["image"]),
                                      np.asarray(out["image"]))


class TestShardedRendering:
    def test_sharded_matches_single(self):
        import jax
        from bibim_tpu.parallel import make_device_mesh, render_frame_sharded

        n = min(4, len(jax.devices()))
        scene = _sphere_scene()
        settings = RenderSettings(width=W, height=H, xla_cap=256)
        single = render_frame(scene, _view(), _fp(1), _flat_materials(), None,
                              settings)
        mesh = make_device_mesh(n)
        sharded = render_frame_sharded(mesh, scene, _view(), _fp(1),
                                       _flat_materials(), settings)
        np.testing.assert_array_equal(
            np.asarray(single["image"]), np.asarray(sharded)
        )

    def test_sharded_with_overlays_matches_single(self):
        """Light spheres + gizmo composite identically under band sharding
        (VERDICT r1 item 8): 8 devices, overlays on."""
        import jax
        from bibim_tpu.parallel import make_device_mesh, render_frame_sharded
        from bibim_tpu.pipeline.framegraph import make_overlay_resources

        n = min(8, len(jax.devices()))
        scene = _sphere_scene()
        overlay = make_overlay_resources()
        settings = RenderSettings(width=W, height=H, xla_cap=256,
                                  gizmo_extent=32)
        single = render_frame(scene, _view(), _fp(1), _flat_materials(),
                              overlay, settings)
        mesh = make_device_mesh(n)
        sharded = render_frame_sharded(mesh, scene, _view(), _fp(1),
                                       _flat_materials(), settings,
                                       overlay=overlay)
        # Band-rebased records associate the depth plane differently
        # (C + B*y0), so exact depth ties at sphere silhouettes may flip;
        # everything else must match bit-exactly.
        a = np.asarray(single["image"]).astype(int)
        b = np.asarray(sharded).astype(int)
        mismatch = (a != b).any(axis=-1)
        assert mismatch.mean() < 5e-4, f"{mismatch.sum()} pixels differ"

    def test_sharded_pair_sampling_matches_single(self):
        """VERDICT r3 #6: the production sampler (pair_sampling=2 with
        exact tile routing over real BlockTable materials) must be
        bit-identical under band sharding — vertical pair grouping at
        band_h seams is exactly where an untested interaction would
        live. Routing caps are explicit (no autotune here), and the
        single-chip render uses pair_sampling=0, so this also re-proves
        routed == exact across the shard boundary."""
        import dataclasses

        import jax
        from bibim_tpu.ops import texture_quad as tq
        from bibim_tpu.parallel import make_device_mesh, render_frame_sharded

        def flat(val):
            return np.full((256, 256, 1), val, np.uint8)

        rng = np.random.default_rng(5)
        maps = {
            "alb_r": rng.integers(0, 256, (256, 256, 1), np.uint8),
            "alb_g": flat(90), "alb_b": flat(60),
            "nrm_x": flat(128), "nrm_y": flat(128), "nrm_z": flat(255),
            "metallic": flat(10),
            "roughness": rng.integers(0, 256, (256, 256, 1), np.uint8),
            "ao": flat(255), "height": flat(0),
        }
        mats = tq.build_quad_tables(maps, block_threshold=1024)
        assert any(isinstance(t, tq.BlockTable) for t in mats)

        n = min(8, len(jax.devices()))
        scene = _sphere_scene()
        s = RenderSettings(width=W, height=H, xla_cap=256,
                           pair_sampling=2, sample_route_caps=(32, 32))
        single_exact = render_frame(
            scene, _view(), _fp(1), mats, None,
            dataclasses.replace(s, pair_sampling=0))
        mesh = make_device_mesh(n)
        sharded = render_frame_sharded(mesh, scene, _view(), _fp(1),
                                       mats, s)
        np.testing.assert_array_equal(
            np.asarray(single_exact["image"]), np.asarray(sharded))

    def test_sharded_forward_matches_single(self):
        """The true forward path shards identically to deferred."""
        import jax
        from bibim_tpu.parallel import make_device_mesh, render_frame_sharded

        n = min(4, len(jax.devices()))
        scene = _sphere_scene()
        settings = RenderSettings(width=W, height=H, deferred=False,
                                  xla_cap=256)
        single = render_frame(scene, _view(), _fp(1), _flat_materials(),
                              None, settings)
        mesh = make_device_mesh(n)
        sharded = render_frame_sharded(mesh, scene, _view(), _fp(1),
                                       _flat_materials(), settings)
        np.testing.assert_array_equal(
            np.asarray(single["image"]), np.asarray(sharded)
        )

    @pytest.mark.parametrize("ibl_kind", ["tables", "analytic"])
    def test_sharded_shadows_and_ibl_match_single(self, ibl_kind):
        """Shadow map builds once outside the shard_map; IBL shades
        band-locally — sharded output matches single-chip. Covers both
        the equirect-table oracle and the production SphPoly+SG pytree
        (static ``degree`` aux must survive shard_map replication)."""
        import jax
        from bibim_tpu.ops.ibl import make_ibl, make_ibl_sh
        from bibim_tpu.parallel import make_device_mesh, render_frame_sharded
        from bibim_tpu.scene.lights import make_lights

        n = min(4, len(jax.devices()))
        mesh_obj = generate_uv_sphere_mesh(1.0, 12, 8)
        model = np.asarray(m3.translate([0.0, 0.0, 4.0]))
        lights = make_lights([
            dict(type=2, dir=(0.3, -1, 0.5), color=(1, 1, 1), intensity=3.0)
        ])
        scene = SceneData(batches=(batch_from_mesh(mesh_obj, model),),
                          lights=lights)
        ibl = make_ibl() if ibl_kind == "tables" else make_ibl_sh()
        settings = RenderSettings(width=W, height=H, xla_cap=256,
                                  enable_shadows=True, enable_ibl=True,
                                  shadow_size=128)
        single = render_frame(scene, _view(), _fp(1), _flat_materials(),
                              None, settings, ibl=ibl)
        mesh = make_device_mesh(n)
        sharded = render_frame_sharded(mesh, scene, _view(), _fp(1),
                                       _flat_materials(), settings, ibl=ibl)
        a = np.asarray(single["image"]).astype(int)
        b = np.asarray(sharded).astype(int)
        mismatch = (a != b).any(axis=-1)
        assert mismatch.mean() < 5e-4, f"{mismatch.sum()} pixels differ"

    def test_sharded_overflow_reports_drops(self):
        """A deliberately-overflowing sharded scene must fail loudly: the
        per-band BinDiag counts are psum'd and checked (VERDICT r1 item 2 —
        no silent geometry loss on the multi-chip path)."""
        import jax
        from bibim_tpu.parallel import make_device_mesh, render_frame_sharded

        n = min(4, len(jax.devices()))
        scene = _sphere_scene()
        # pair_budget far below the sphere's live (tile, triangle) pairs.
        settings = RenderSettings(width=W, height=H, xla_cap=256,
                                  pair_budget=8)
        mesh = make_device_mesh(n)
        with pytest.raises(AssertionError, match="pair"):
            render_frame_sharded(mesh, scene, _view(), _fp(1),
                                 _flat_materials(), settings)
        # return_diag surfaces the counts without raising.
        img, diag = render_frame_sharded(mesh, scene, _view(), _fp(1),
                                         _flat_materials(), settings,
                                         check=False, return_diag=True)
        assert int(diag.dropped_pairs) > 0
        assert np.asarray(img).shape == (H, W, 3)

    def test_sharded_band_compaction_matches_single(self):
        """live_tile_cap engages the band-local coverage compaction (the
        single-chip perf machinery at band scale, VERDICT r1 item 3) and
        stays bit-identical to the single-chip compacted frame."""
        import jax
        from bibim_tpu.ops import texture_quad as tq
        from bibim_tpu.parallel import make_device_mesh, render_frame_sharded
        from bibim_tpu.parallel.tile_shard import _band_cap

        n = min(4, len(jax.devices()))
        w2, h2 = 1024, 128
        scene = _sphere_scene()
        maps = {
            "alb_r": np.full((4, 4, 1), 200, np.uint8),
            "alb_g": np.full((4, 4, 1), 120, np.uint8),
            "alb_b": np.full((4, 4, 1), 80, np.uint8),
            "roughness": np.full((4, 4, 1), 128, np.uint8),
            "ao": np.full((4, 4, 1), 255, np.uint8),
        }
        mats = tq.build_quad_tables(maps)
        settings = RenderSettings(width=w2, height=h2, xla_cap=256,
                                  live_tile_cap=40, outputs="image")
        # The scaled band cap must actually be below the band tile count,
        # or this test exercises nothing.
        band_nt = settings.tiles_x * (-(-h2 // n) // settings.tile_h)
        assert _band_cap(40, n, band_nt) < band_nt
        view = ViewBlock(
            view=_view().view,
            proj=m3.perspective(60.0, w2 / h2, 0.1, 1000.0),
            view_pos=_view().view_pos,
            enable_normal_map=jnp.int32(0),
        )
        single = render_frame(scene, view, _fp(1), mats, None, settings)
        mesh = make_device_mesh(n)
        sharded = render_frame_sharded(mesh, scene, view, _fp(1), mats,
                                       settings)
        # Band-rebased records associate the depth/edge constants
        # differently (C + B*y0), so a handful of silhouette pixels may
        # flip by 1 LSB — same tolerance as the overlay sharded test.
        a = np.asarray(single["image"]).astype(int)
        b = np.asarray(sharded).astype(int)
        mismatch = (a != b).any(axis=-1)
        assert mismatch.mean() < 5e-4, f"{mismatch.sum()} pixels differ"
        assert np.abs(a - b).max() <= 1

    def test_sharded_autotuned_band_caps_match_single(self):
        """Per-band probe-derived caps (autotune_settings_sharded) drive
        the sharded render through ShardedRenderer and stay pixel-equal
        to the single-chip frame with zero drops (VERDICT r2 weak #6:
        derived caps replace the scale-plus-slack heuristic)."""
        import jax
        from bibim_tpu.parallel import ShardedRenderer, make_device_mesh
        from bibim_tpu.pipeline.autotune import autotune_settings_sharded

        n = min(4, len(jax.devices()))
        scene = _sphere_scene()
        settings = RenderSettings(width=W, height=H, xla_cap=256)
        single = render_frame(scene, _view(), _fp(1), _flat_materials(),
                              None, settings)
        mesh = make_device_mesh(n)
        r = ShardedRenderer(mesh, settings, _flat_materials())
        img = r.render(scene, _view(), _fp(1))
        np.testing.assert_array_equal(np.asarray(single["image"]),
                                      np.asarray(img))
        assert r.retunes == 1  # initial probe only — no drops
        # The derivation produced real band-scale caps, not the heuristic.
        _frame, band, probe = autotune_settings_sharded(
            scene, _view(), settings, n_bands=n
        )
        assert probe.n_tiles == settings.tiles_x * (
            -(-(-(-H // n)) // settings.tile_h)
        )
        assert band.pair_budget >= probe.total_pairs

    def test_sharded_skew_camera_recovers(self):
        """The sharded re-probe story: capacities derived while the
        camera saw nothing (coverage skewed away) overflow when the
        camera swings onto the scene — the frame reports drops, the
        renderer re-probes at the new camera, and the re-render matches
        single-chip instead of hard-failing (VERDICT r2 weak #6)."""
        import jax
        from bibim_tpu.parallel import ShardedRenderer, make_device_mesh

        n = min(8, len(jax.devices()))
        # Dense enough that the real camera's worst tile exceeds the
        # floor-bucketed away-camera caps (max_candidates floor = 64).
        mesh_obj = generate_uv_sphere_mesh(1.0, 32, 24)
        model = np.asarray(m3.translate([0.0, 0.0, 4.0]))
        lights = make_lights([
            dict(type=2, dir=(0, -1, 1), color=(1, 1, 1), intensity=3.0)
        ])
        scene = SceneData(batches=(batch_from_mesh(mesh_obj, model),),
                          lights=lights)
        settings = RenderSettings(width=W, height=H, xla_cap=256)
        away = FreeLookCamera()
        away.apply_mouse_drag(300, 0)  # 180° yaw: scene behind camera
        mesh = make_device_mesh(n)
        r = ShardedRenderer(mesh, settings, _flat_materials(), margin=1.05)
        r.render(scene, _view(away), _fp(1))
        assert r.retunes == 1
        assert r._band.max_candidates == 64  # zero-coverage floor bucket
        img = r.render(scene, _view(), _fp(1))  # swing onto the sphere
        assert r.retunes == 2, "drop must trigger a re-probe"
        single = render_frame(scene, _view(), _fp(1), _flat_materials(),
                              None, settings)
        np.testing.assert_array_equal(np.asarray(single["image"]),
                                      np.asarray(img))

    def test_sharded_pads_non_divisible_heights(self):
        import jax
        from bibim_tpu.parallel import make_device_mesh, render_frame_sharded

        n = min(4, len(jax.devices()))
        scene = _sphere_scene()
        odd_h = H - 8  # 56 rows over 4 devices → 16-row padded bands
        settings = RenderSettings(width=W, height=odd_h, xla_cap=256)
        single = render_frame(scene, _view(), _fp(1), _flat_materials(),
                              None, settings)
        mesh = make_device_mesh(n)
        sharded = render_frame_sharded(mesh, scene, _view(), _fp(1),
                                       _flat_materials(), settings)
        assert np.asarray(sharded).shape == (odd_h, W, 3)
        np.testing.assert_array_equal(
            np.asarray(single["image"]), np.asarray(sharded)
        )


class TestCornerCatGeometry:
    def test_cat_transform_bit_exact_vs_per_corner(self):
        """The corner-concatenated fast transform path runs the SAME
        per-element expressions as the per-corner loop — outputs must be
        bit-identical (it is a pure op-count optimization)."""
        import jax

        from bibim_tpu.ops import geometry as G

        mesh = generate_uv_sphere_mesh(1.0, 12, 8)
        model = np.stack([
            np.asarray(m3.translate([0.0, 0.5, 4.0])),
            np.asarray(m3.matmul(m3.translate([1.0, 0.0, 5.0]),
                                 m3.rotate_y(30.0))),
        ])
        b = batch_from_mesh(mesh, model)
        assert "pos_cat" in b.corner_planes
        vp = m3.matmul(m3.perspective(60.0, 1.5, 0.1, 100.0),
                       jnp.asarray(FreeLookCamera().get_view_matrix()))

        legacy_cp = {k: v for k, v in b.corner_planes.items()
                     if not k.endswith("_cat")}

        @jax.jit
        def both(batch, batch_legacy, m):
            return (G.transform_batch_planar(batch, m),
                    G.transform_batch_planar(batch_legacy, m))

        fast, slow = both(b, b._replace(corner_planes=legacy_cp), vp)
        for lf, ls in zip(jax.tree_util.tree_leaves(fast),
                          jax.tree_util.tree_leaves(slow)):
            assert lf.shape == ls.shape
            np.testing.assert_array_equal(np.asarray(lf), np.asarray(ls))
