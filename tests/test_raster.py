"""Rasterizer correctness vs the NumPy oracle + convention pins."""

import jax.numpy as jnp
import numpy as np
import pytest

from bibim_tpu import math3d as m3
from bibim_tpu.ops.raster import VisibilityBuffer, rasterize, triangle_setup
from bibim_tpu.testing.oracle import oracle_rasterize


def _quad_clip(z_ndc_like=5.0):
    """Two CW front-facing triangles at view depth z (camera at origin +Z)."""
    proj = np.asarray(m3.perspective(60.0, 1.0, 0.1, 1000.0))
    pts = np.array(
        [
            [-1.0, 1.0, z_ndc_like],
            [1.0, 1.0, z_ndc_like],
            [1.0, -1.0, z_ndc_like],
            [-1.0, -1.0, z_ndc_like],
        ],
        np.float32,
    )
    clip = np.asarray(m3.transform_points(jnp.asarray(proj), jnp.asarray(pts)))
    tris = np.array([[0, 1, 2], [2, 3, 0]], np.int32)
    return clip, tris


def _rand_scene(rng, n_tris=40, behind_fraction=0.0):
    """Random triangles in view space, projected."""
    proj = np.asarray(m3.perspective(60.0, 1.0, 0.1, 100.0))
    centers = rng.uniform([-3, -3, 2], [3, 3, 20], (n_tris, 3))
    if behind_fraction:
        k = int(n_tris * behind_fraction)
        centers[:k, 2] = rng.uniform(-5, 1.0, k)  # some cross/behind near plane
    offsets = rng.uniform(-1.5, 1.5, (n_tris, 3, 3))
    pts = (centers[:, None, :] + offsets).reshape(-1, 3).astype(np.float32)
    clip = np.asarray(m3.transform_points(jnp.asarray(proj), jnp.asarray(pts)))
    tris = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return clip, tris


def _compare(clip, tris, w, h, **kw):
    vis = rasterize(jnp.asarray(clip), jnp.asarray(tris), w, h, **kw)
    o_id, o_bary, o_depth = oracle_rasterize(clip, tris, w, h)
    got_id = np.asarray(vis.tri_id)
    # Coverage must match except on knife-edge pixels where f32 vs f64 edge
    # evaluations straddle zero; allow a tiny disagreement budget.
    mismatch = (got_id != o_id).mean()
    assert mismatch < 0.005, f"coverage mismatch {mismatch:.4%}"
    both = (got_id == o_id) & (o_id >= 0)
    np.testing.assert_allclose(
        np.asarray(vis.depth)[both], o_depth[both], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(vis.bary)[both], o_bary[both], atol=2e-3
    )
    return vis


class TestRasterVsOracle:
    def test_centered_quad(self):
        clip, tris = _quad_clip()
        vis = _compare(clip, tris, 64, 64, tile_h=16, tile_w=32, cap=8)
        got = np.asarray(vis.tri_id)
        assert (got >= 0).any() and (got == -1).any()  # partial coverage

    def test_random_triangles(self):
        rng = np.random.default_rng(7)
        clip, tris = _rand_scene(rng, 40)
        _compare(clip, tris, 96, 80, tile_h=16, tile_w=32, cap=64)

    def test_near_plane_crossing(self):
        # External triangles (w<=0 corners) must rasterize their visible part
        # — the ground-plane case (scene.cpp:49-51).
        rng = np.random.default_rng(3)
        clip, tris = _rand_scene(rng, 30, behind_fraction=0.4)
        _compare(clip, tris, 96, 80, tile_h=16, tile_w=32, cap=64)

    def test_backface_culled(self):
        clip, tris = _quad_clip()
        tris_ccw = tris[:, ::-1].copy()  # flip winding → back-facing
        vis = rasterize(jnp.asarray(clip), jnp.asarray(tris_ccw), 32, 32,
                        tile_h=16, tile_w=32, cap=8)
        assert (np.asarray(vis.tri_id) == -1).all()


class TestDepthSemantics:
    def test_reversed_z_nearer_wins(self):
        clip_far, tris = _quad_clip(20.0)
        clip_near, _ = _quad_clip(5.0)
        clip = np.concatenate([clip_far, clip_near])
        tris2 = np.concatenate([tris, tris + 4])
        vis = rasterize(jnp.asarray(clip), jnp.asarray(tris2), 32, 32,
                        tile_h=16, tile_w=32, cap=8)
        got = np.asarray(vis.tri_id)
        covered = got >= 0
        # near quad projects larger and fully occludes the far one
        assert covered.any() and (got[covered] >= 2).all()

    def test_equal_depth_later_draw_wins(self):
        # GREATER_OR_EQUAL (render.cpp:1121): same geometry drawn twice →
        # second copy's ids win, like GPU submission order.
        clip, tris = _quad_clip()
        clip2 = np.concatenate([clip, clip])
        tris2 = np.concatenate([tris, tris + 4])
        vis = rasterize(jnp.asarray(clip2), jnp.asarray(tris2), 32, 32,
                        tile_h=16, tile_w=32, cap=16)
        got = np.asarray(vis.tri_id)
        covered = got >= 0
        assert covered.any() and (got[covered] >= 2).all()

    def test_init_continues_depth_buffer(self):
        clip_near, tris = _quad_clip(5.0)
        vis1 = rasterize(jnp.asarray(clip_near), jnp.asarray(tris), 32, 32,
                         tile_h=16, tile_w=32, cap=8)
        clip_far, _ = _quad_clip(20.0)
        init = VisibilityBuffer(
            tri_id=jnp.full_like(vis1.tri_id, -1),
            bary=jnp.zeros_like(vis1.bary),
            depth=vis1.depth,
        )
        vis2 = rasterize(jnp.asarray(clip_far), jnp.asarray(tris), 32, 32,
                         tile_h=16, tile_w=32, cap=8, init=init)
        assert (np.asarray(vis2.tri_id) == -1).all()  # far quad fully occluded


class TestBandRendering:
    def test_bands_equal_full_frame(self):
        rng = np.random.default_rng(11)
        clip, tris = _rand_scene(rng, 30, behind_fraction=0.2)
        full = rasterize(jnp.asarray(clip), jnp.asarray(tris), 64, 64,
                         tile_h=16, tile_w=32, cap=64)
        bands = []
        for k in range(4):
            b = rasterize(jnp.asarray(clip), jnp.asarray(tris), 64, 16,
                          tile_h=16, tile_w=32, cap=64,
                          viewport_height=64, y_origin=float(k * 16))
            bands.append(np.asarray(b.tri_id))
        np.testing.assert_array_equal(np.concatenate(bands), np.asarray(full.tri_id))
