"""Opt-in N-tap in-level-0 anisotropic sampling (RenderSettings.aniso_taps
— the analog of the reference sampler's maxAnisotropy=16 state,
render.cpp:1355-1358). aniso_taps=1 must stay bit-exact plain bilinear
(the parity invariant); N>1 averages bilinear taps along the pixel's
major UV-gradient axis."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from bibim_tpu import math3d as m3
from bibim_tpu.ops import fused
from bibim_tpu.ops import texture_quad as tq
from bibim_tpu.pipeline import (
    FrameParams,
    RenderSettings,
    ViewBlock,
    render_frame,
)
from bibim_tpu.pipeline.framegraph import MaterialTextures, _sample_materials
from bibim_tpu.scene import FreeLookCamera
from bibim_tpu.scene.lights import make_lights
from bibim_tpu.scene.scene import SceneData, batch_from_mesh
from bibim_tpu.assets.meshgen import generate_plane_mesh

W, H = 128, 64


def _checker_materials(n=16):
    y, x = np.mgrid[0:n, 0:n]
    c = ((x + y) % 2 * 255).astype(np.uint8)
    alb = np.zeros((n, n, 4), np.uint8)
    alb[..., 0] = c
    alb[..., 1] = 255 - c
    alb[..., 2] = 128
    alb[..., 3] = 255

    def flat(r, g, b):
        t = np.zeros((4, 4, 4), np.uint8)
        t[..., 0], t[..., 1], t[..., 2], t[..., 3] = r, g, b, 255
        return jnp.asarray(t)

    return MaterialTextures(
        albedo=jnp.asarray(alb),
        metallic=flat(0, 0, 0),
        roughness=flat(128, 128, 128),
        ao=flat(255, 255, 255),
        normal=flat(128, 128, 255),
        height=flat(0, 0, 0),
    )


def _grazing_plane_scene():
    """A large plane seen nearly edge-on: strongly anisotropic footprints
    (the 100x ground-plane case the reference's aniso targets)."""
    mesh = generate_plane_mesh()
    model = np.asarray(
        m3.translate([0.0, -1.0, 8.0]) @ m3.scale([40.0, 1.0, 40.0])
    )
    lights = make_lights(
        [dict(type=2, dir=(0, -1, 1), color=(1, 1, 1), intensity=3.0)]
    )
    return SceneData(batches=(batch_from_mesh(mesh, model),), lights=lights)


def _view():
    cam = FreeLookCamera()
    return ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )


def _fp():
    return FrameParams(enable_tone_mapping=jnp.int32(1),
                       exposure=jnp.float32(1.0))


class TestAnisoSteps:
    def test_picks_major_axis(self):
        # u varies along screen x at 0.01/px, v along screen y at 0.03/px:
        # the y axis is the major footprint axis -> steps = (0, 0.03).
        th, tw = 8, 128
        xs = jnp.arange(tw, dtype=jnp.float32)
        ys = jnp.arange(th, dtype=jnp.float32)
        u = jnp.broadcast_to(xs * 0.01, (th, tw)).reshape(1, -1)
        v = jnp.broadcast_to((ys * 0.03)[:, None], (th, tw)).reshape(1, -1)
        du, dv = tq.aniso_uv_steps(u, v, th, tw)
        np.testing.assert_allclose(np.asarray(du), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(dv), 0.03, atol=1e-6)

    def test_swapped_axes(self):
        th, tw = 8, 128
        xs = jnp.arange(tw, dtype=jnp.float32)
        u = jnp.broadcast_to(xs * 0.05, (th, tw)).reshape(1, -1)
        v = jnp.zeros((1, th * tw), jnp.float32)
        du, dv = tq.aniso_uv_steps(u, v, th, tw)
        np.testing.assert_allclose(np.asarray(du), 0.05, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dv), 0.0, atol=1e-7)


def _synthetic_px(settings):
    nt = settings.tiles_x * settings.tiles_y
    npx = settings.tile_h * settings.tile_w
    k = jnp.arange(nt * npx, dtype=jnp.float32).reshape(nt, npx)
    u = (k / (nt * npx)) * 3.0
    v = (k % 977.0) / 977.0
    zeros = jnp.zeros((nt, npx), jnp.float32)
    ones = jnp.ones((nt, npx), jnp.float32)
    return fused.FusedPixels(
        tri_id=jnp.zeros((nt, npx), jnp.int32),
        depth=ones,
        bary=(ones, zeros, zeros),
        uv=(u, v),
        normal=(zeros, zeros, ones),
        tangent=(ones, zeros, zeros),
        world=(zeros, zeros, zeros),
        color=(ones, ones, ones),
        mat_id=jnp.zeros((nt, npx), jnp.int32),
    )


class TestAnisoSampling:
    def test_matches_shifted_average_oracle(self):
        s = RenderSettings(width=W, height=H, aniso_taps=2)
        mats = _checker_materials()
        px = _synthetic_px(s)
        got = _sample_materials(mats, px, s)

        s1 = dataclasses.replace(s, aniso_taps=1)
        u, v = px.uv
        du, dv = tq.aniso_uv_steps(u, v, s.tile_h, s.tile_w)
        acc = None
        for t in (-0.25, 0.25):
            tap = _sample_materials(
                mats, px._replace(uv=(u + t * du, v + t * dv)), s1
            )
            acc = tap if acc is None else {k: acc[k] + tap[k] for k in acc}
        for k in got:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(acc[k]) * 0.5, err_msg=k
            )

    def test_taps1_touches_only_covered_pixels_when_enabled(self):
        """The disabled state (taps=1, the default) is a STATIC Python
        branch (``if settings.aniso_taps > 1`` in framegraph), so
        "taps=1 is a no-op" holds by construction within a version and
        is pinned cross-version by the default-path goldens
        (shaderball_pbr golden renders at taps=1; shaderball_aniso2
        pins the enabled path). What IS testable here: enabling the
        feature must be additive — taps=2 may change covered pixels
        only, never background. (A same-config image comparison, as
        this test originally did, compares a jit cache entry with
        itself — vacuous.)"""
        scene = _grazing_plane_scene()
        mats = _checker_materials()
        base = RenderSettings(width=W, height=H, xla_cap=256,
                              outputs="full")
        out1 = render_frame(scene, _view(), _fp(), mats, None, base)
        out2 = render_frame(
            scene, _view(), _fp(), mats, None,
            dataclasses.replace(base, aniso_taps=2),
        )
        img1 = np.asarray(out1["image"]).astype(np.int32)
        img2 = np.asarray(out2["image"]).astype(np.int32)
        hit = np.asarray(out1["tri_id"]) >= 0
        assert (img1[~hit] == img2[~hit]).all()
        assert (img1[hit] != img2[hit]).any()

    def test_aniso_additive_across_feature_combos_grazing(self):
        """Feature-matrix version of the lossless-off invariant
        (VERDICT r4 #7) at the grazing config, stated in its testable
        form: taps=1 (OFF, the default static branch) is pinned by the
        default-path goldens; what must hold across random combinations
        of the other GUI toggles is that ENABLING aniso stays additive —
        taps=2 renders finite and touches only covered pixels, whatever
        the rest of the feature matrix does. (Comparing taps-default
        against replace(s, aniso_taps=1) is the same frozen dataclass —
        one jit cache entry compared with itself.)"""
        scene = _grazing_plane_scene()
        mats = _checker_materials()
        rng = np.random.default_rng(7)
        base = RenderSettings(width=W, height=H, xla_cap=256,
                              outputs="full")
        for trial in range(4):
            s = dataclasses.replace(
                base,
                deferred=bool(rng.integers(0, 2)),
                show_lights=bool(rng.integers(0, 2)),
                srgb_output=bool(rng.integers(0, 2)),
                pair_sampling=int(rng.integers(0, 3)),
                quantize_fp16=bool(rng.integers(0, 2)),
            )
            out1 = render_frame(scene, _view(), _fp(), mats, None, s)
            out2 = render_frame(
                scene, _view(), _fp(), mats, None,
                dataclasses.replace(s, aniso_taps=2),
            )
            img1 = np.asarray(out1["image"]).astype(np.int32)
            img2 = np.asarray(out2["image"]).astype(np.int32)
            hit = np.asarray(out1["tri_id"]) >= 0
            assert np.isfinite(np.asarray(out2["hdr"])).all(), trial
            assert (img1[~hit] == img2[~hit]).all(), f"combo {trial}: {s}"

    def test_taps4_smooths_grazing_plane(self):
        scene = _grazing_plane_scene()
        mats = _checker_materials()
        base = RenderSettings(width=W, height=H, xla_cap=256)
        out1 = render_frame(scene, _view(), _fp(), mats, None, base)
        out4 = render_frame(
            scene, _view(), _fp(), mats, None,
            dataclasses.replace(base, aniso_taps=4),
        )
        img1 = np.asarray(out1["image"]).astype(np.int32)
        img4 = np.asarray(out4["image"]).astype(np.int32)
        hit = np.asarray(out1["tri_id"]) >= 0
        assert np.isfinite(np.asarray(out4["hdr"])).all()
        # Background (no footprint) is untouched; the checkered plane is
        # filtered, so the two images differ on covered pixels.
        assert (img1[~hit] == img4[~hit]).all()
        assert (img1[hit] != img4[hit]).any()
