"""Adaptive capacity derivation (pipeline.autotune): probed caps render
complete frames, bucketing keeps jit keys stable under camera jitter, and
the session raises caps monotonically."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from bibim_tpu import math3d as m3
from bibim_tpu.assets.meshgen import generate_uv_sphere_mesh
from bibim_tpu.ops import texture_quad as tq
from bibim_tpu.pipeline import (
    FrameParams,
    RenderSettings,
    ViewBlock,
    render_frame,
)
from bibim_tpu.pipeline.autotune import (
    CapProbe,
    autotune_settings,
    derive_settings,
    probe_frame_caps,
)
from bibim_tpu.scene import FreeLookCamera
from bibim_tpu.scene.lights import make_lights
from bibim_tpu.scene.scene import SceneData, batch_from_mesh

W, H = 256, 128


def _scene():
    mesh = generate_uv_sphere_mesh(1.0, 12, 8)
    model = np.asarray(m3.translate([0.0, 0.0, 4.0]))
    lights = make_lights(
        [dict(type=2, dir=(0, -1, 1), color=(1, 1, 1), intensity=3.0)]
    )
    return SceneData(batches=(batch_from_mesh(mesh, model),), lights=lights)


def _view(pos=None):
    cam = FreeLookCamera(pos=pos if pos is not None
                         else np.zeros(3, np.float32))
    return ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )


def _mats():
    return tq.build_quad_tables({
        "alb_r": np.full((4, 4, 1), 200, np.uint8),
        "roughness": np.full((4, 4, 1), 128, np.uint8),
        "ao": np.full((4, 4, 1), 255, np.uint8),
    })


class TestAutotune:
    def test_probe_measures_real_demands(self):
        probe = probe_frame_caps(_scene(), _view(),
                                 RenderSettings(width=W, height=H,
                                                xla_cap=256))
        assert probe.n_tiles == 32
        assert 0 < probe.covered_tiles <= probe.bin_tiles <= probe.n_tiles
        assert probe.max_candidates > 0
        assert probe.total_pairs >= probe.bin_tiles

    def test_derived_caps_render_without_drops(self):
        scene = _scene()
        base = RenderSettings(width=W, height=H, xla_cap=256)
        tuned, _ = autotune_settings(scene, _view(), base)
        out = render_frame(
            scene, _view(), FrameParams(jnp.int32(1), jnp.float32(1.0)),
            _mats(), None, dataclasses.replace(tuned, outputs="image+diag"),
        )
        d = out["bin_diag"]
        for leaf in (d.dropped_overflow, d.dropped_cap, d.dropped_pairs,
                     d.dropped_tiles):
            assert int(np.asarray(leaf)) == 0
        assert np.asarray(out["image"]).max() > 0

    def test_bucketing_is_jitter_stable(self):
        """Nearby cameras must derive the SAME settings (shared jit key)."""
        scene = _scene()
        base = RenderSettings(width=W, height=H, xla_cap=256)
        a, _ = autotune_settings(scene, _view(), base)
        b, _ = autotune_settings(
            scene, _view(np.array([0.01, 0.005, -0.01], np.float32)), base
        )
        assert a == b

    def test_derive_splits_dense_tiles_into_passes(self):
        base = RenderSettings(width=W, height=H)
        probe = CapProbe(n_tiles=2025, bin_tiles=1000, covered_tiles=900,
                         max_candidates=2100, total_pairs=150000, n_big=10)
        s = derive_settings(base, probe, margin=1.25)
        assert s.max_candidates == 512
        assert s.raster_passes * s.max_candidates >= 2100 * 1.25
        assert s.live_tile_cap is not None and s.live_tile_cap < 2025
        assert s.pair_budget >= 150000 * 1.25

    def test_derive_routing_decision_from_escape_probe(self):
        """The r4 sampling-router rule: escape-dominated frames disable
        pair routing entirely (pair_sampling→0, no route caps); frames
        with a real clean fraction derive validated route caps."""
        base = RenderSettings(width=W, height=H, pair_sampling=2)
        common = dict(n_tiles=2025, bin_tiles=900, covered_tiles=800,
                      max_candidates=300, total_pairs=50000, n_big=5)
        # ~100% of covered tiles escape (the measured production case).
        dominated = derive_settings(
            base, CapProbe(escape_tiles=790, **common), margin=1.25)
        assert dominated.pair_sampling == 0
        assert dominated.sample_route_caps is None
        # Mostly-clean frame (magnification): routing derives caps.
        clean = derive_settings(
            base, CapProbe(escape_tiles=100, **common), margin=1.25)
        assert clean.pair_sampling == 2
        q_cap, e_cap = clean.sample_route_caps
        assert e_cap >= 100 and q_cap >= 1
        # No escape probe (-1): the request passes through untouched.
        unprobed = derive_settings(
            base, CapProbe(escape_tiles=-1, **common), margin=1.25)
        assert unprobed.pair_sampling == 2

    def test_session_retune_is_monotone(self):
        """Re-probing after drops must never shrink a cap (no thrash)."""
        from bibim_tpu.host.session import Session

        sess = Session(width=W, height=H)
        sess.ui.scene = "triangle"
        data = sess.scene.scene_data()
        sess._retune(data, _view())
        first = dict(sess._tuned[sess._tune_key()])
        # Simulate an earlier, larger derivation surviving a re-probe.
        bigger = {k: (None if v is None else v * 2)
                  for k, v in first.items()}
        sess._tuned[sess._tune_key()] = dict(bigger)
        sess._retune(data, _view())
        after = sess._tuned[sess._tune_key()]
        for k in first:
            if k == "span_cap":  # routing choice — always re-derived
                assert after[k] == first[k]
            elif bigger[k] is None:
                assert after[k] is None
            else:
                assert after[k] >= bigger[k]

    def test_shadow_caps_derived_and_validated(self):
        """enable_shadows derives light-view capacities (the light
        projection's concentration profile is invisible to the main-camera
        probe) and the tuned frame renders with zero drops and the same
        image as hand-set caps."""
        scene = _scene()
        base = RenderSettings(width=W, height=H, xla_cap=256,
                              enable_shadows=True, shadow_size=128)
        tuned, _ = autotune_settings(scene, _view(), base)
        assert tuned.shadow_candidates is not None
        assert tuned.shadow_passes is not None and tuned.shadow_passes >= 1
        nt_light = (128 // base.tile_h) * (128 // base.tile_w)
        assert (tuned.shadow_tile_cap is None
                or tuned.shadow_tile_cap <= nt_light)
        fp = FrameParams(jnp.int32(1), jnp.float32(1.0))
        out = render_frame(
            scene, _view(), fp, _mats(), None,
            dataclasses.replace(tuned, outputs="image+diag"),
        )
        d = out["bin_diag"]
        for leaf in (d.dropped_overflow, d.dropped_cap, d.dropped_pairs,
                     d.dropped_tiles):
            assert int(np.asarray(leaf)) == 0
        hand = render_frame(
            scene, _view(), fp, _mats(), None,
            dataclasses.replace(base, shadow_candidates=512,
                                shadow_passes=1),
        )
        np.testing.assert_array_equal(np.asarray(out["image"]),
                                      np.asarray(hand["image"]))

    def test_image_diag_outputs_match_image(self):
        """outputs='image+diag' is the production frame + scalars."""
        scene = _scene()
        s = RenderSettings(width=W, height=H, xla_cap=256, outputs="image")
        out_img = render_frame(
            scene, _view(), FrameParams(jnp.int32(1), jnp.float32(1.0)),
            _mats(), None, s,
        )
        out_diag = render_frame(
            scene, _view(), FrameParams(jnp.int32(1), jnp.float32(1.0)),
            _mats(), None, dataclasses.replace(s, outputs="image+diag"),
        )
        np.testing.assert_array_equal(np.asarray(out_img["image"]),
                                      np.asarray(out_diag["image"]))
        assert "bin_diag" in out_diag

    def test_measured_schedule_pick(self):
        """pick_measured chooses the fastest validated candidate;
        dense_cap_candidates proposes the 2x dense slot list only for
        merged multi-pass configs (a schedule choice the analytic
        derivation cannot see — PERFORMANCE.md round-5)."""
        from bibim_tpu.pipeline.autotune import (
            CapProbe,
            dense_cap_candidates,
            pick_measured,
        )

        probe = CapProbe(n_tiles=2025, bin_tiles=600, covered_tiles=569,
                         max_candidates=2097, total_pairs=93362, n_big=2,
                         n_tris=626000, dense_tiles=91)
        s = RenderSettings(width=W, height=H, raster_passes=5,
                           merged_coverage=True, dense_tile_cap=128)
        cands = dense_cap_candidates(s, probe, margin=1.05)
        assert len(cands) == 2
        assert cands[0].dense_tile_cap == 128
        assert cands[1].dense_tile_cap == 192  # bucket(2*91*1.05)
        # Single-pass / unmerged configs get no alternative.
        assert dense_cap_candidates(
            dataclasses.replace(s, merged_coverage=False), probe) == (
            dataclasses.replace(s, merged_coverage=False),)
        assert dense_cap_candidates(
            dataclasses.replace(s, dense_tile_cap=None), probe) == (
            dataclasses.replace(s, dense_tile_cap=None),)

        fake_ms = {128: 9.5, 192: 8.8}
        best, results = pick_measured(
            cands, lambda sx: fake_ms[sx.dense_tile_cap])
        assert best.dense_tile_cap == 192
        assert [r[0] for r in results] == [9.5, 8.8]

    def test_overlay_candidates_derived_from_sphere_binning(self):
        """A light whose sphere projects tiny concentrates the whole
        16x16 overlay sphere into ~one 8x128 tile: the probe must raise
        overlay_candidates past the 384 default (the sharded-dryrun
        drop this derivation exists for); spread-out spheres derive a
        small window; and a depth-culled sphere set (the headline's
        near-plane straddle) derives FLOOR caps instead of the bbox
        heuristic's conservative-full-screen grid."""
        from bibim_tpu.pipeline import make_overlay_resources
        from bibim_tpu.pipeline.autotune import derive_overlay_caps
        from bibim_tpu.utils.config import get_resource_root

        if not get_resource_root().common("gizmo.obj").is_file():
            pytest.skip("reference assets not mounted")
        overlay = make_overlay_resources()
        mesh = generate_uv_sphere_mesh(1.0, 12, 8)
        model = np.asarray(m3.translate([0.0, 0.0, 4.0]))

        def scene_with_light_at(pos, n=3):
            lights = make_lights(
                [dict(type=0, pos=pos, color=(1, 1, 1), intensity=3.0)] * n
            )
            return SceneData(batches=(batch_from_mesh(mesh, model),),
                             lights=lights)

        # show_gizmo off isolates the sphere demand (the gizmo raster
        # binds the same cap and is asserted separately below).
        s = RenderSettings(width=W, height=H, show_gizmo=False)
        vb = ViewBlock(
            view=jnp.asarray(FreeLookCamera().get_view_matrix()),
            proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
            view_pos=jnp.zeros(3),
            enable_normal_map=jnp.int32(0),
        )
        # 3 clustered far lights: each r=0.1 sphere at z=8 fits inside
        # one 8x128 tile, so ~3 spheres' triangles pile into it (probed
        # worst tile 561 > the 384 default).
        far = derive_overlay_caps(
            scene_with_light_at((0.0, 0.0, 8.0)), vb, s, overlay)
        assert far["overlay_candidates"] > 384, far
        assert far["overlay_max_tiles"] <= 128, far
        # Near lights: the spheres spread over many tiles with a small
        # worst tile (probed 78) — a tight window suffices.
        near = derive_overlay_caps(
            scene_with_light_at((0.0, 0.0, 0.4)), vb, s, overlay)
        assert near["overlay_candidates"] <= 128, near
        # Behind-camera lights: everything depth-culls; both caps fall
        # to the 64 floor (the pass stays validated, so a camera swing
        # that brings a sphere back recovers via the drop-watcher).
        gone = derive_overlay_caps(
            scene_with_light_at((0.0, 0.0, -8.0)), vb, s, overlay)
        assert gone["overlay_candidates"] == 64, gone
        assert gone["overlay_max_tiles"] == 64, gone
        # With the gizmo on, its raster's worst tile (same cap binding,
        # framegraph._render_gizmo) keeps the window above the floor
        # even when every sphere is culled.
        gz = derive_overlay_caps(
            scene_with_light_at((0.0, 0.0, -8.0)), vb,
            dataclasses.replace(s, show_gizmo=True), overlay)
        assert gz["overlay_candidates"] > 64, gz

    def test_overlay_floor_caps_recover_on_swing(self):
        """Overlay caps derived at a camera where the spheres depth-cull
        (floor 64/64) must FAIL LOUDLY — dropped geometry in bin_diag —
        when the camera swings onto the spheres, and a re-derivation at
        the new camera must render them drop-free: the same validated-
        capacity recovery story as the main raster caps."""
        import jax

        from bibim_tpu.pipeline import make_overlay_resources
        from bibim_tpu.pipeline.autotune import derive_overlay_caps
        from bibim_tpu.utils.config import get_resource_root

        if not get_resource_root().common("gizmo.obj").is_file():
            pytest.skip("reference assets not mounted")
        overlay = make_overlay_resources()
        mesh = generate_uv_sphere_mesh(1.0, 12, 8)
        model = np.asarray(m3.translate([0.0, 0.0, 4.0]))
        lights = make_lights(
            [dict(type=0, pos=(0.0, 0.5, 2.0), color=(1, 1, 1),
                  intensity=3.0)] * 3
        )
        scene = SceneData(batches=(batch_from_mesh(mesh, model),),
                          lights=lights)

        def view_for(yaw):
            cam = FreeLookCamera()
            cam.yaw = yaw
            return ViewBlock(
                view=jnp.asarray(cam.get_view_matrix()),
                proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
                view_pos=jnp.asarray(cam.pos),
                enable_normal_map=jnp.int32(0),
            )

        base = RenderSettings(width=W, height=H, xla_cap=256,
                              outputs="image+diag", show_gizmo=False)
        away, front = view_for(180.0), view_for(0.0)
        caps_away = derive_overlay_caps(scene, away, base, overlay)
        assert caps_away["overlay_candidates"] == 64
        s_away = dataclasses.replace(base, **caps_away)
        fp = FrameParams(jnp.int32(1), jnp.float32(1.0))
        mats = _mats()
        out = render_frame(scene, front, fp, mats, overlay, s_away)
        dropped = sum(
            int(np.asarray(getattr(out["bin_diag"], f)))
            for f in ("dropped_cap", "dropped_tiles", "dropped_overflow",
                      "dropped_pairs")
        )
        assert dropped > 0, "stale floor caps must fail loudly"
        # Recovery: re-derive at the new camera.
        s_front = dataclasses.replace(
            base, **derive_overlay_caps(scene, front, base, overlay))
        out2 = render_frame(scene, front, fp, mats, overlay, s_front)
        from bibim_tpu.utils.validation import check_bin_diag

        check_bin_diag(out2["bin_diag"], where="re-derived overlay caps")
        # The spheres actually draw (flat light color over the scene).
        img = np.asarray(out2["image"])
        base_img = np.asarray(render_frame(
            scene, front, fp, mats, overlay,
            dataclasses.replace(s_front, show_lights=False))["image"])
        assert (img != base_img).any()
