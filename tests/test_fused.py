"""Fused raster+resolve tests: XLA fallback vs legacy visibility-buffer
path, Pallas kernel (interpret mode) vs XLA fallback, band rebasing, and
binning-capacity diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bibim_tpu import math3d as m3
from bibim_tpu.ops import fused
from bibim_tpu.ops.geometry import assemble_scene
from bibim_tpu.ops.interpolate import corner_indices, interpolate
from bibim_tpu.ops.raster import rasterize, triangle_setup
from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

W, H = 256, 128
TX, TH, TW = 2, 8, 128


@pytest.fixture(scope="module")
def scene_soup():
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    data = scene.scene_data()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, W / H, 0.1, 1000.0)
    return assemble_scene(data.batches, view, proj, None)


@pytest.fixture(scope="module")
def rec_setup(scene_soup):
    soup = scene_soup
    setup = triangle_setup(soup.clip, soup.tris, W, H)
    rec = fused.build_record_table(
        setup, soup.tris, soup.uv, soup.normal, soup.tangent, soup.world,
        soup.color, soup.mat_id,
    )
    return rec, setup


# Generous capacities: at this tiny resolution triangles span many 8-row
# tiles, which is what the caps exist to bound.
CAPS = dict(max_candidates=2048, overflow_cap=512, span_cap=128)


def _untile(p):
    return np.asarray(fused.untile(p, W, H, TX, TH, TW))


class TestXlaFusedPath:
    def test_matches_legacy_visibility_buffer(self, scene_soup, rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        px, _, _ = fused.raster_fused_xla(rec, setup, soup.clip, soup.tris,
                                          W, H, cap=4096)
        vis = rasterize(soup.clip, soup.tris, W, H, cap=4096)
        np.testing.assert_array_equal(_untile(px.tri_id),
                                      np.asarray(vis.tri_id))
        hit = np.asarray(vis.tri_id) >= 0
        np.testing.assert_allclose(
            _untile(px.depth)[hit], np.asarray(vis.depth)[hit], atol=1e-6
        )
        # Interpolated uv matches the legacy gather+blend formulation.
        corners = corner_indices(vis, soup.tris)
        uv_legacy = np.asarray(interpolate(vis, corners, soup.uv))
        uv_fused = np.stack([_untile(c) for c in px.uv], axis=-1)
        np.testing.assert_allclose(uv_fused[hit], uv_legacy[hit], atol=1e-4)

    def test_miss_pixels_are_zeroed(self, scene_soup, rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        px, _, _ = fused.raster_fused_xla(rec, setup, soup.clip, soup.tris,
                                          W, H, cap=4096)
        miss = _untile(px.tri_id) < 0
        assert miss.any()
        for plane in (px.depth, px.uv[0], px.world[2], px.color[0]):
            assert (_untile(plane)[miss] == 0).all()


class TestPallasInterpret:
    def test_matches_xla_path(self, scene_soup, rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        px_x, zk_x, _ = fused.raster_fused_xla(
            rec, setup, soup.clip, soup.tris, W, H, cap=4096
        )
        px_p, zk_p, diag = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True, **CAPS
        )
        assert int(diag.dropped_cap) == 0 and int(diag.dropped_overflow) == 0
        tid_x, tid_p = _untile(px_x.tri_id), _untile(px_p.tri_id)
        np.testing.assert_array_equal(tid_x, tid_p)
        hit = tid_x >= 0
        for name in ("uv", "normal", "tangent", "world", "color", "bary"):
            a = getattr(px_x, name)
            b = getattr(px_p, name)
            for ca, cb in zip(a, b):
                np.testing.assert_allclose(
                    _untile(ca)[hit], _untile(cb)[hit], atol=1e-3
                )
        np.testing.assert_allclose(
            _untile(px_x.depth)[hit], _untile(px_p.depth)[hit], atol=1e-5
        )

    def test_merged_coverage_bit_exact(self, scene_soup, rec_setup):
        """merged_coverage (one coverage fori_loop per tile group +
        chunk-class-sorted compact slots) is a pure schedule change:
        every output must be BIT-identical, including under multipass +
        compaction."""
        soup, (rec, setup) = scene_soup, rec_setup
        kw = dict(max_candidates=256, overflow_cap=512, span_cap=128,
                  passes=3, dense_tile_cap=16, raster_tile_cap=32,
                  tile_h=TH, tile_w=TW, interpret=True)
        px_a, zk_a, diag_a = fused.raster_fused_pallas(
            rec, setup, W, H, merged_coverage=False, **kw)
        px_b, zk_b, diag_b = fused.raster_fused_pallas(
            rec, setup, W, H, merged_coverage=True, **kw)
        np.testing.assert_array_equal(np.asarray(zk_a), np.asarray(zk_b))
        for a, b in zip(jax.tree_util.tree_leaves(px_a),
                        jax.tree_util.tree_leaves(px_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(diag_a),
                        jax.tree_util.tree_leaves(diag_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_init_zkey_continues_depth(self, scene_soup, rec_setup):
        """Overlay semantics: a second pass depth-tests against the first
        (subpass-over-same-depth-attachment analog, main.cpp:128-171)."""
        soup, (rec, setup) = scene_soup, rec_setup
        _, zkey, _ = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True, **CAPS
        )
        # Re-raster the same geometry against its own depth: with
        # GREATER_OR_EQUAL everything re-wins (ties pass).
        px2, _, _ = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, init_zkey=zkey,
            interpret=True, skip_empty=True, **CAPS
        )
        assert (_untile(px2.tri_id) >= 0).sum() > 0


class TestCompactOverlay:
    def test_matches_fullgrid_composite(self, scene_soup, rec_setup):
        """composite_overlay_pallas (compact tile list, interpret mode)
        reproduces the full-grid raster + where() composite."""
        soup, (rec, setup) = scene_soup, rec_setup
        nt = (H // TH) * TX
        npx = TH * TW
        key = jax.random.PRNGKey(3)
        ldr3 = tuple(
            jax.random.uniform(jax.random.fold_in(key, c), (nt, npx))
            for c in range(3)
        )
        zkey = jnp.zeros((nt, npx), jnp.int32)

        out, diag = fused.composite_overlay_pallas(
            rec, setup, ldr3, zkey, W, H, tile_h=TH, tile_w=TW,
            max_candidates=2048, overflow_cap=512, span_cap=128,
            max_tiles=nt, interpret=True,
        )
        assert int(diag.dropped_tiles) == 0

        px, _, _ = fused.raster_fused_xla(
            rec, setup, soup.clip, soup.tris, W, H, cap=4096,
        )
        hit = np.asarray(px.tri_id) >= 0
        assert hit.any()
        for c in range(3):
            want = np.where(hit, np.asarray(px.color[c]),
                            np.asarray(ldr3[c]))
            np.testing.assert_allclose(np.asarray(out[c]), want, atol=1e-5)

    def test_dropped_tiles_are_counted(self, scene_soup, rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        nt = (H // TH) * TX
        npx = TH * TW
        ldr3 = tuple(jnp.zeros((nt, npx)) for _ in range(3))
        zkey = jnp.zeros((nt, npx), jnp.int32)
        _, diag = fused.composite_overlay_pallas(
            rec, setup, ldr3, zkey, W, H, tile_h=TH, tile_w=TW,
            max_candidates=2048, overflow_cap=512, span_cap=128,
            max_tiles=2, interpret=True,
        )
        assert int(diag.dropped_tiles) > 0


class TestBandRebase:
    def test_shifted_records_render_band(self, scene_soup):
        soup = scene_soup
        full_setup = triangle_setup(soup.clip, soup.tris, W, H)
        rec = fused.build_record_table(
            full_setup, soup.tris, soup.uv, soup.normal, soup.tangent,
            soup.world, soup.color, soup.mat_id,
        )
        px_full, _, _ = fused.raster_fused_xla(
            rec, full_setup, soup.clip, soup.tris, W, H, cap=4096
        )
        full_img = _untile(px_full.tri_id)

        band_h, y0 = 64, 64
        band_setup = triangle_setup(
            soup.clip, soup.tris, W, H, band_y0=float(y0), band_height=band_h
        )
        rec_band = fused.shift_record_table_y(rec, float(y0))
        px_band, _, _ = fused.raster_fused_xla(
            rec_band, band_setup, soup.clip, soup.tris, W, band_h, cap=4096,
            viewport_height=H, y_origin=float(y0),
        )
        band_img = np.asarray(
            fused.untile(px_band.tri_id, W, band_h, TX, TH, TW)
        )
        np.testing.assert_array_equal(band_img, full_img[y0 : y0 + band_h])


class TestBinDiagnostics:
    def test_overflow_and_cap_drops_are_counted(self, rec_setup):
        _, setup = rec_setup
        # Absurdly small capacities must report drops instead of silence.
        *_, diag, _, _ = fused.bin_pairs(
            setup, W, H, TH, TW, span_cap=4, overflow_cap=8,
            max_candidates=8,
        )
        assert int(diag.dropped_overflow) > 0
        assert int(diag.dropped_cap) > 0

    def test_draw_order_tie_break(self):
        """Two coplanar triangles: the later one wins (GREATER_OR_EQUAL +
        submission order, render.cpp:1121)."""
        quad = np.asarray(
            [[-1, -1, 0.5], [3, -1, 0.5], [-1, 3, 0.5]], np.float32
        )
        clip = jnp.asarray(
            np.concatenate([quad, quad])[:, [0, 1, 2]], jnp.float32
        )
        clip = jnp.concatenate(
            [clip, jnp.ones((6, 1), jnp.float32)], axis=-1
        )
        # flip y for clockwise-in-y-down winding
        clip = clip.at[:, 1].multiply(-1.0)
        tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
        setup = triangle_setup(clip, tris, TW, TH)
        zeros2 = jnp.zeros((6, 2), jnp.float32)
        zeros3 = jnp.zeros((6, 3), jnp.float32)
        rec = fused.build_record_table(setup, tris, zeros2, zeros3, zeros3,
                                       zeros3, zeros3)
        px, _, _ = fused.raster_fused_pallas(
            rec, setup, TW, TH, tile_h=TH, tile_w=TW, interpret=True,
            max_candidates=8, overflow_cap=8, span_cap=8,
        )
        tid = np.asarray(fused.untile(px.tri_id, TW, TH, 1, TH, TW))
        assert (tid[tid >= 0] == 1).all()


class TestValidationHook:
    def test_check_bin_diag_raises_on_drops(self, rec_setup):
        from bibim_tpu.utils.validation import check_bin_diag

        _, setup = rec_setup
        *_, diag, _, _ = fused.bin_pairs(
            setup, W, H, TH, TW, span_cap=4, overflow_cap=8, max_candidates=8
        )
        with pytest.raises(Exception):
            check_bin_diag(diag)

    def test_render_frame_surfaces_diag(self, scene_soup):
        from bibim_tpu.pipeline import (
            FrameParams, RenderSettings, ViewBlock, render_frame,
        )
        from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
        from bibim_tpu.utils.validation import check_bin_diag

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
        out = render_frame(
            scene.scene_data(), vb, fp, None, None,
            RenderSettings(width=W, height=H, shading="flat", xla_cap=2048,
                           show_lights=False, show_gizmo=False,
                           max_candidates=2048, span_cap=128,
                           overflow_cap=512),
        )
        check_bin_diag(out["bin_diag"])  # adequate caps → zero drops

    def test_render_frame_reports_real_drops(self, scene_soup):
        """Undersized capacities must surface through the frame output
        (the silent-holes failure mode VERDICT r1 flagged)."""
        from bibim_tpu.pipeline import (
            FrameParams, RenderSettings, ViewBlock, render_frame,
        )
        from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
        from bibim_tpu.utils.validation import check_bin_diag

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
        out = render_frame(
            scene.scene_data(), vb, fp, None, None,
            RenderSettings(width=W, height=H, shading="flat", xla_cap=2048,
                           show_lights=False, show_gizmo=False,
                           max_candidates=64),
        )
        with pytest.raises(Exception):
            check_bin_diag(out["bin_diag"])


class TestMultiPass:
    def test_passes_equal_single_big_cap(self, scene_soup, rec_setup):
        """Dense tiles: 4 windows of 64 candidates must equal one 256-cap
        pass (depth-chained GREATER_OR_EQUAL keeps draw order)."""
        soup, (rec, setup) = scene_soup, rec_setup
        kw = dict(tile_h=TH, tile_w=TW, overflow_cap=512, span_cap=128,
                  interpret=True)
        px_one, zk_one, _ = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=2048, **kw
        )
        px_multi, zk_multi, _ = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=512, passes=4, **kw
        )
        np.testing.assert_array_equal(_untile(px_one.tri_id),
                                      _untile(px_multi.tri_id))
        hit = _untile(px_one.tri_id) >= 0
        np.testing.assert_allclose(
            _untile(px_one.depth)[hit], _untile(px_multi.depth)[hit],
            atol=1e-6,
        )
        for a, b in zip(px_one.uv, px_multi.uv):
            np.testing.assert_allclose(_untile(a)[hit], _untile(b)[hit],
                                       atol=1e-5)

    def test_compact_dense_passes_match_and_count_drops(self, scene_soup,
                                                        rec_setup):
        """Extra passes run on a compacted dense-tile grid; a sufficient
        cap is exact, an insufficient one is counted in dropped_tiles."""
        soup, (rec, setup) = scene_soup, rec_setup
        kw = dict(tile_h=TH, tile_w=TW, overflow_cap=512, span_cap=128,
                  interpret=True)
        px_one, _, _ = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=2048, **kw
        )
        px_c, _, diag = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=512, passes=4,
            dense_tile_cap=24, **kw
        )
        assert int(diag.dropped_tiles) == 0
        np.testing.assert_array_equal(_untile(px_one.tri_id),
                                      _untile(px_c.tri_id))
        _, _, diag_small = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=512, passes=4,
            dense_tile_cap=1, **kw
        )
        assert int(diag_small.dropped_tiles) > 0

    def test_compact_pass0_matches_full_grid(self, scene_soup, rec_setup):
        """Pass-0 compaction (raster_tile_cap) is exact when the cap holds
        every bin-live tile; unlisted tiles stay clear."""
        soup, (rec, setup) = scene_soup, rec_setup
        kw = dict(tile_h=TH, tile_w=TW, overflow_cap=512, span_cap=128,
                  max_candidates=2048, interpret=True)
        px_full, zk_full, _ = fused.raster_fused_pallas(
            rec, setup, W, H, **kw
        )
        nt = zk_full.shape[0]
        px_c, zk_c, diag = fused.raster_fused_pallas(
            rec, setup, W, H, raster_tile_cap=nt, **kw
        )
        assert int(diag.dropped_tiles) == 0
        np.testing.assert_array_equal(_untile(px_full.tri_id),
                                      _untile(px_c.tri_id))
        np.testing.assert_array_equal(np.asarray(zk_full),
                                      np.asarray(zk_c))
        hit = _untile(px_full.tri_id) >= 0
        np.testing.assert_allclose(_untile(px_full.depth)[hit],
                                   _untile(px_c.depth)[hit], atol=1e-6)


class TestFineBins:
    """Fine-subtile pass-0 kernel (fine_bins): bit-identical images to
    the coarse kernel — binning granularity must not change keys, winner
    records, or draw-order tie-breaks."""

    def test_matches_coarse_kernel(self, scene_soup, rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        kw = dict(tile_h=TH, tile_w=TW, interpret=True, **CAPS)
        px_c, zk_c, _ = fused.raster_fused_pallas(rec, setup, W, H, **kw)
        px_f, zk_f, diag = fused.raster_fused_pallas(
            rec, setup, W, H, fine_bins=True, **kw
        )
        assert int(diag.dropped_cap) == 0
        np.testing.assert_array_equal(np.asarray(zk_c), np.asarray(zk_f))
        for a, b in zip(jax.tree_util.tree_leaves(px_c),
                        jax.tree_util.tree_leaves(px_f)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fine_multipass_and_compact(self, scene_soup, rec_setup):
        """Windows + dense extra passes + pass-0 compaction compose with
        fine binning (the x64 production shape)."""
        soup, (rec, setup) = scene_soup, rec_setup
        kw = dict(tile_h=TH, tile_w=TW, overflow_cap=512, span_cap=128,
                  interpret=True)
        px_one, zk_one, _ = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=2048, **kw
        )
        nt = zk_one.shape[0]
        px_f, zk_f, diag = fused.raster_fused_pallas(
            rec, setup, W, H, max_candidates=512, passes=4,
            raster_tile_cap=nt, dense_tile_cap=24, fine_bins=True, **kw
        )
        assert int(diag.dropped_tiles) == 0
        np.testing.assert_array_equal(_untile(px_one.tri_id),
                                      _untile(px_f.tri_id))
        np.testing.assert_array_equal(np.asarray(zk_one),
                                      np.asarray(zk_f))
        hit = _untile(px_one.tri_id) >= 0
        np.testing.assert_allclose(_untile(px_one.depth)[hit],
                                   _untile(px_f.depth)[hit], atol=1e-6)
        for a, b in zip(px_one.uv, px_f.uv):
            np.testing.assert_allclose(_untile(a)[hit], _untile(b)[hit],
                                       atol=1e-5)

    def test_fine_init_zkey_continues_depth(self, scene_soup, rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        kw = dict(tile_h=TH, tile_w=TW, interpret=True, **CAPS)
        _, zkey, _ = fused.raster_fused_pallas(rec, setup, W, H, **kw)
        px_f, zk_f, _ = fused.raster_fused_pallas(
            rec, setup, W, H, init_zkey=zkey, fine_bins=True, **kw
        )
        np.testing.assert_array_equal(np.asarray(zk_f), np.asarray(zkey))

    def test_fine_cap_drops_are_counted(self, scene_soup, rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        _, _, diag = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True,
            max_candidates=16, overflow_cap=512, span_cap=128,
            fine_bins=True,
        )
        assert int(diag.dropped_cap) > 0


class TestSpanClassBinning:
    def test_span_class_pairs_identical(self):
        """span_mid_cap binning must produce the IDENTICAL per-tile
        candidate lists as single-class expansion (same sorted (tile,
        tri) set), with the mid overflow counted when capped."""
        import jax.numpy as jnp

        from bibim_tpu import math3d as m3
        from bibim_tpu.ops import fused
        from bibim_tpu.ops.geometry import assemble_scene
        from bibim_tpu.ops.raster import triangle_setup
        from bibim_tpu.scene import FreeLookCamera
        from bibim_tpu.scene.scene import SceneData, batch_from_mesh
        from bibim_tpu.scene.lights import make_lights
        from bibim_tpu.assets.meshgen import generate_uv_sphere_mesh

        w, h = 512, 256
        mesh = generate_uv_sphere_mesh(1.5, 24, 16)
        model = np.asarray(m3.translate([0.0, 0.0, 3.0]))
        lights = make_lights([dict(type=2, dir=(0, -1, 1), color=(1, 1, 1),
                                   intensity=3.0)])
        scene = SceneData(batches=(batch_from_mesh(mesh, model),),
                          lights=lights)
        cam = FreeLookCamera()
        soup = assemble_scene(scene.batches,
                              jnp.asarray(cam.get_view_matrix()),
                              m3.perspective(60.0, w / h, 0.1, 1000.0),
                              None)
        setup = triangle_setup(soup.clip, soup.tris, w, h, sequential=True)

        def lists(span_mid_cap):
            st, starts, counts, big_ids, n_big, diag, ty, tx = (
                fused.bin_pairs(setup, w, h, 8, 128, span_cap=16,
                                overflow_cap=64, max_candidates=4096,
                                span_mid_cap=span_mid_cap)
            )
            st = np.asarray(st)
            starts = np.asarray(starts)
            counts = np.asarray(counts)
            return ([st[starts[t]:starts[t] + counts[t]].tolist()
                     for t in range(ty * tx)], diag,
                    np.asarray(big_ids), int(n_big))

        base, d0, big0, nb0 = lists(None)
        split, d1, big1, nb1 = lists(512)
        assert base == split
        assert nb0 == nb1
        np.testing.assert_array_equal(big0, big1)
        assert int(d1.dropped_pairs) == 0

        # An undersized mid list reports its losses loudly.
        bx0, by0, bx1, by1 = (np.asarray(setup.bbox[:, i])
                              for i in range(4))
        area = ((bx1 // 128) - (bx0 // 128) + 1) * (
            (by1 // 8) - (by0 // 8) + 1)
        n_mid = int((np.asarray(setup.valid) & (area > 2)
                     & (area <= 16)).sum())
        assert n_mid > 2, "test scene must have mid-span triangles"
        _, d2, _, _ = lists(2)
        assert int(d2.dropped_pairs) > 0


class TestVmemSort:
    def test_sort_pairs_matches_lax_sort(self):
        """The in-VMEM bitonic sort must order unique (tile, tri) pairs
        exactly like lax.sort (ops/sort_pallas.py)."""
        import jax
        from jax import lax

        from bibim_tpu.ops import sort_pallas as sp

        rng = np.random.default_rng(7)
        for p, nt in [(4096, 2026), (30000, 511), (900, 64)]:
            tile = jnp.asarray(rng.integers(0, nt + 1, p).astype(np.int32))
            tri = jnp.asarray(rng.permutation(p).astype(np.int32))
            ref = lax.sort((tile, tri), num_keys=2, is_stable=False)
            got = jax.jit(
                lambda a, b, nt=nt: sp.sort_pairs(
                    a, b, nt, use_vmem=True, interpret=True)
            )(tile, tri)
            for g, r in zip(got, ref):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    def test_pack_bits_fallback(self):
        from bibim_tpu.ops import sort_pallas as sp

        assert sp.pack_bits(2025, 1 << 19) is not None
        assert sp.pack_bits(1 << 14, 1 << 20) is None  # 15+20 bits > 30


class TestGroupWindowKernel:
    """The group-window kernel (one contiguous candidate-window DMA + one
    3-dot resolve per tile group) must produce the identical image to the
    per-tile-window kernel, with and without pass-0 compaction."""

    def test_matches_per_tile_kernel(self, scene_soup, rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        base = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True, **CAPS
        )
        nt = (H // TH) * TX
        # Window budget covering the worst 8-tile group at these caps
        # (every tile of this close-up frame is live, so the compact list
        # must hold all of them).
        gw = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True,
            group_pair_cap=8192, raster_tile_cap=nt, **CAPS
        )
        assert int(gw[2].dropped_cap) == 0
        assert int(gw[2].dropped_tiles) == 0
        for a, b in zip(jax.tree_util.tree_leaves(base[0]),
                        jax.tree_util.tree_leaves(gw[0])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(base[1]),
                                      np.asarray(gw[1]))

    def test_window_overflow_is_counted(self, scene_soup, rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        nt = (H // TH) * TX
        _, _, diag = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True,
            group_pair_cap=64, raster_tile_cap=nt, **CAPS
        )
        # A deliberately tiny window must report (not silently eat) the
        # candidates it cannot fetch.
        assert int(diag.dropped_cap) > 0


class TestDropFields:
    def test_kept_fields_identical_dropped_zero(self, scene_soup,
                                                rec_setup):
        soup, (rec, setup) = scene_soup, rec_setup
        full = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True, **CAPS
        )
        pruned = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True,
            drop_fields=("depth", "b0", "b1", "cr", "cg", "cb", "matf"),
            **CAPS
        )
        np.testing.assert_array_equal(np.asarray(full[1]),
                                      np.asarray(pruned[1]))
        np.testing.assert_array_equal(np.asarray(full[0].tri_id),
                                      np.asarray(pruned[0].tri_id))
        for name in ("uv", "normal", "tangent", "world"):
            for a, b in zip(getattr(full[0], name),
                            getattr(pruned[0], name)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (np.asarray(pruned[0].depth) == 0).all()
        for c in pruned[0].color + pruned[0].bary[:2]:
            assert (np.asarray(c) == 0).all()
        assert (np.asarray(pruned[0].mat_id) == 0).all()


class TestEarlyZ:
    """Early-z coverage (raster_fused_pallas earlyz=True): near-first
    candidate order + remaining-work break + explicit draw-order tie
    carry. A pure schedule change — every output must be bit-identical
    to the draw-ordered scan on tie-free content, and constructed
    bit-equal-depth ties must resolve by TRUE draw order (the
    reference's submission rule, closing the big/small-split
    knife-edge)."""

    def test_bit_exact_vs_draw_order(self, scene_soup, rec_setup):
        """Drop-free capacities: the candidate SETS are identical, so
        outputs must match bitwise. (Under cap overflow the two orders
        legitimately keep different survivors — z-order keeps the
        NEAREST pairs instead of the earliest-drawn, a strictly better
        degradation, still counted in dropped_cap.)"""
        soup, (rec, setup) = scene_soup, rec_setup
        assert setup.zub is not None
        for kw in (
            dict(**CAPS),
            dict(max_candidates=512, overflow_cap=512, span_cap=128,
                 passes=5, dense_tile_cap=32, raster_tile_cap=32),
            dict(max_candidates=512, overflow_cap=512, span_cap=128,
                 passes=5, dense_tile_cap=32, raster_tile_cap=32,
                 merged_coverage=True),
        ):
            px_a, zk_a, diag_a = fused.raster_fused_pallas(
                rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True,
                earlyz=False, **kw)
            px_b, zk_b, diag_b = fused.raster_fused_pallas(
                rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True,
                earlyz=True, **kw)
            assert int(diag_a.dropped_cap) == 0, "caps must be drop-free"
            np.testing.assert_array_equal(np.asarray(zk_a),
                                          np.asarray(zk_b))
            for a, b in zip(jax.tree_util.tree_leaves(px_a),
                            jax.tree_util.tree_leaves(px_b)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(diag_a),
                            jax.tree_util.tree_leaves(diag_b)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def _two_tri_scene(self):
        """Two IDENTICAL full-viewport triangles (bit-equal depth at
        every pixel) as draws 0 and 1; returns (rec, setup). Both-order
        coverage lives in test_constructed_big_small_tie_both_orders."""
        tri = np.array([[-3.0, -3.0, 0.5, 1.0],
                        [3.0, -3.0, 0.5, 1.0],
                        [0.0, 5.0, 0.5, 1.0]], np.float32)
        clip = jnp.asarray(np.concatenate([tri, tri], axis=0))
        tris = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
        setup = triangle_setup(clip, tris, W, H)
        zeros3 = jnp.zeros((6, 3), jnp.float32)
        rec = fused.build_record_table(
            setup, tris, zeros3[:, :2], zeros3, zeros3, zeros3, zeros3,
        )
        return rec, setup

    def test_constructed_tie_later_draw_wins(self):
        """Bit-equal depth at every covered pixel (identical geometry,
        two draw ids): the later draw must win under early-z — the
        VERDICT-r3 property pin that turns the draw-order-tie claim from
        prose into a test."""
        rec, setup = self._two_tri_scene()
        px, _, _ = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True,
            earlyz=True, **CAPS)
        tid = _untile(px.tri_id)
        assert (tid[tid >= 0] == 1).all()

    def test_constructed_big_small_tie(self):
        """Coplanar bit-equal-z tie ACROSS the big/small split: a small
        triangle drawn first, a span-overflowing copy of the same plane
        drawn later. The draw-ordered scan tests overflow rows first and
        would hand the tie to the earlier small triangle (the documented
        knife-edge); the early-z dual key resolves by true draw order —
        the later (big) triangle wins."""
        # Small triangle well inside one tile; big = same plane scaled up
        # so its bbox spans > span_cap tiles (routes to overflow).
        small = np.array([[0.0, -0.4, 0.5, 1.0],
                          [0.4, -0.4, 0.5, 1.0],
                          [0.1, 0.2, 0.5, 1.0]], np.float32)
        big = np.array([[-3.0, -3.0, 0.5, 1.0],
                        [3.0, -3.0, 0.5, 1.0],
                        [0.0, 5.0, 0.5, 1.0]], np.float32)
        clip = jnp.asarray(np.concatenate([small, big], axis=0))
        tris = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
        setup = triangle_setup(clip, tris, W, H)
        zeros3 = jnp.zeros((6, 3), jnp.float32)
        rec = fused.build_record_table(
            setup, tris, zeros3[:, :2], zeros3, zeros3, zeros3, zeros3,
        )
        px, _, _ = fused.raster_fused_pallas(
            rec, setup, W, H, tile_h=TH, tile_w=TW, interpret=True,
            earlyz=True, max_candidates=64, overflow_cap=8, span_cap=2)
        tid = _untile(px.tri_id)
        assert (tid >= 0).any()
        # Every covered pixel is on the shared z=0.5 plane; the later
        # draw (the big triangle, id 1) must win everywhere it covers.
        assert (tid[tid >= 0] == 1).all()

    def test_constructed_big_small_tie_both_orders_both_paths(self):
        """The coplanar cross-split tie in BOTH draw orders on BOTH
        schedules (the VERDICT-r3 'turn the knife-edge prose into a pin'
        ask, measured): with span_cap=1 the full-viewport triangle routes
        to the shared overflow list while the small one stays dense, and
        the LATER-drawn triangle must win every bit-equal-z pixel —
        which is what both the draw-order scan and early-z produce. The
        docstring's conservative knife-edge note survives for deeper
        configurations, but the simple cross-split tie is measured
        reference-true on the default path too."""
        big = np.array([[-3.0, -3.0, 0.5, 1.0],
                        [3.0, -3.0, 0.5, 1.0],
                        [0.0, 5.0, 0.5, 1.0]], np.float32)
        small = np.array([[0.0, -0.4, 0.5, 1.0],
                          [0.4, -0.4, 0.5, 1.0],
                          [0.1, 0.2, 0.5, 1.0]], np.float32)
        kw = dict(tile_h=TH, tile_w=TW, interpret=True, max_candidates=64,
                  overflow_cap=8, span_cap=1)
        zeros3 = jnp.zeros((6, 3), jnp.float32)
        for first, second, later_covers_all in (
            (big, small, False),  # small drawn later: wins its footprint
            (small, big, True),   # big drawn later: wins everywhere
        ):
            clip = jnp.asarray(np.concatenate([first, second], axis=0))
            tris = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], np.int32))
            setup = triangle_setup(clip, tris, W, H)
            rec = fused.build_record_table(
                setup, tris, zeros3[:, :2], zeros3, zeros3, zeros3,
                zeros3,
            )
            for ez in (False, True):
                px, _, _ = fused.raster_fused_pallas(
                    rec, setup, W, H, earlyz=ez, **kw)
                tid = _untile(px.tri_id)
                assert (tid >= 0).all()  # big covers the viewport
                if later_covers_all:
                    assert (tid == 1).all(), f"earlyz={ez}"
                else:
                    # Later-drawn small keeps exactly its own footprint.
                    assert (tid == 1).any() and (tid == 0).any(), \
                        f"earlyz={ez}"
