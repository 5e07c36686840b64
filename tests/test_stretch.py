"""Stretch capabilities (BASELINE config 5): shadow mapping and IBL.

Both are additive over the reference — disabled they must not change the
image at all; enabled they must darken occluded regions / replace the
constant ambient plausibly."""

import jax.numpy as jnp
import numpy as np
import pytest

from bibim_tpu import math3d as m3
from bibim_tpu.assets.meshgen import generate_plane_mesh
from bibim_tpu.pipeline import (
    FrameParams,
    MaterialTextures,
    RenderSettings,
    ViewBlock,
    render_frame,
)
from bibim_tpu.scene import FreeLookCamera
from bibim_tpu.scene.lights import make_lights
from bibim_tpu.scene.scene import SceneData, batch_from_mesh

W, H = 128, 64


def _mat(albedo=200):
    def tex(v):
        return jnp.full((4, 4, 4), v, jnp.uint8)

    return MaterialTextures(
        albedo=tex(albedo), metallic=tex(0), roughness=tex(180),
        ao=tex(255), normal=tex(128), height=tex(0),
    )


def _view():
    cam = FreeLookCamera(pos=np.array([0.0, 6.0, -2.0], np.float32),
                         pitch=-50.0)
    return ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, W / H, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )


def _fp():
    return FrameParams(enable_tone_mapping=jnp.int32(0),
                       exposure=jnp.float32(1.0))


def _occluder_scene():
    """Ground plane + a floating quad between it and a straight-down
    directional light → a crisp shadow square."""
    import numpy as np

    ground = batch_from_mesh(
        generate_plane_mesh(),
        np.asarray(m3.compose(m3.translate([0, -1, 4]), m3.scale(8.0))),
    )
    blocker = batch_from_mesh(
        generate_plane_mesh(),
        np.asarray(m3.compose(m3.translate([0, 1.0, 4]), m3.scale(2.0))),
    )
    lights = make_lights(
        [dict(type=2, dir=(0, -1, 0.01), color=(1, 1, 1), intensity=1.5)]
    )
    return SceneData(batches=(ground, blocker), lights=lights)


class TestShadows:
    def test_off_is_parity(self):
        scene = _occluder_scene()
        base = render_frame(scene, _view(), _fp(), _mat(), None,
                            RenderSettings(width=W, height=H, xla_cap=256))
        again = render_frame(scene, _view(), _fp(), _mat(), None,
                             RenderSettings(width=W, height=H, xla_cap=256,
                                            enable_shadows=False))
        np.testing.assert_array_equal(np.asarray(base["image"]),
                                      np.asarray(again["image"]))

    def test_occluder_darkens_ground(self):
        scene = _occluder_scene()
        s_off = RenderSettings(width=W, height=H, xla_cap=256)
        s_on = RenderSettings(width=W, height=H, xla_cap=256,
                              enable_shadows=True, shadow_size=128)
        off = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_off)["image"]
        ).astype(int)
        on = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_on)["image"]
        ).astype(int)
        darkened = (off.sum(-1) - on.sum(-1)) > 30
        assert darkened.sum() > 50, "no shadowed pixels found"
        # Shadows only darken; nothing gets brighter.
        assert (on <= off + 1).all()

    def test_caster_fit_still_darkens(self):
        """shadow_fit_batches fits the map's XY to the casters (the
        blocker, batch 1); the blocker's shadow survives and nothing
        brightens (the ground still rasterizes into the map as an
        occluder/receiver; pixels outside the fitted XY resolve lit)."""
        scene = _occluder_scene()
        s_off = RenderSettings(width=W, height=H, xla_cap=256)
        s_fit = RenderSettings(width=W, height=H, xla_cap=256,
                               enable_shadows=True, shadow_size=128,
                               shadow_fit_batches=(1,))
        off = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_off)["image"]
        ).astype(int)
        on = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_fit)["image"]
        ).astype(int)
        darkened = (off.sum(-1) - on.sum(-1)) > 30
        assert darkened.sum() > 50, "no shadowed pixels with caster fit"
        assert (on <= off + 1).all()

    def test_query_compaction_exact(self):
        """Footprint-compacted PCF (shadow_query_tile_cap) is bit-exact
        vs the full-rate gather when the cap holds the footprint, and a
        too-small cap surfaces as dropped_tiles instead of failing
        silently (dropped footprint tiles render unshadowed)."""
        import dataclasses

        scene = _occluder_scene()
        base = RenderSettings(width=W, height=H, xla_cap=256,
                              enable_shadows=True, shadow_size=128,
                              shadow_fit_batches=(1,))
        nt = base.tiles_x * base.tiles_y
        full = render_frame(scene, _view(), _fp(), _mat(), None, base)
        compact = render_frame(
            scene, _view(), _fp(), _mat(), None,
            dataclasses.replace(base, shadow_query_tile_cap=nt - 1,
                                outputs="image+diag"),
        )
        np.testing.assert_array_equal(np.asarray(full["image"]),
                                      np.asarray(compact["image"]))
        assert int(np.asarray(compact["bin_diag"].dropped_tiles)) == 0
        tiny = render_frame(
            scene, _view(), _fp(), _mat(), None,
            dataclasses.replace(base, shadow_query_tile_cap=1,
                                outputs="image+diag"),
        )
        assert int(np.asarray(tiny["bin_diag"].dropped_tiles)) > 0

    def test_pair_visibility_bounded_and_gated(self):
        """Pair-rate PCF (pair_visibility): renders within the ≤1-px
        penumbra-shift model — frames stay finite, shadows still darken
        the ground, and the setting off is bit-identical to baseline."""
        import dataclasses

        scene = _occluder_scene()
        base = RenderSettings(width=W, height=H, xla_cap=256,
                              enable_shadows=True, shadow_size=128,
                              shadow_fit_batches=(1,))
        full = np.asarray(render_frame(
            scene, _view(), _fp(), _mat(), None, base)["image"])
        pairv = np.asarray(render_frame(
            scene, _view(), _fp(), _mat(), None,
            dataclasses.replace(base, pair_visibility=True))["image"])
        off = np.asarray(render_frame(
            scene, _view(), _fp(), _mat(), None,
            dataclasses.replace(base, pair_visibility=False))["image"])
        np.testing.assert_array_equal(full, off)
        # the shadow edge may shift ≤1 px vertically; everything else
        # (including all fully-lit and fully-shadowed rows) matches
        diff = np.any(pairv != full, axis=-1)
        assert diff.mean() < 0.05, diff.mean()
        # shadows still darken: the pair frame is darker than a
        # no-shadow render over the shadowed region
        noshadow = np.asarray(render_frame(
            scene, _view(), _fp(), _mat(), None,
            dataclasses.replace(base, enable_shadows=False))["image"])
        assert pairv.astype(int).sum() < noshadow.astype(int).sum()

    def test_point_lit_regions_unaffected(self):
        """Only the shadow-casting light is attenuated."""
        scene = _occluder_scene()
        # Second light (point, not shadow-casting) dominates from below.
        scene = scene._replace(
            lights=make_lights(
                [
                    dict(type=2, dir=(0, -1, 0.01), color=(1, 1, 1),
                         intensity=0.0),
                    dict(type=0, pos=(0, 0.5, 4), color=(1, 1, 1),
                         intensity=5.0),
                ]
            )
        )
        s_on = RenderSettings(width=W, height=H, xla_cap=256,
                              enable_shadows=True, shadow_size=128,
                              shadow_light=0)
        s_off = RenderSettings(width=W, height=H, xla_cap=256)
        on = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_on)["image"]
        )
        off = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_off)["image"]
        )
        np.testing.assert_array_equal(on, off)


class TestIbl:
    def test_maps_build(self):
        from bibim_tpu.ops.ibl import make_ibl, make_procedural_sky

        env = make_procedural_sky()
        assert env.shape == (64, 128, 3) and env.min() >= 0
        ibl = make_ibl(env)
        assert ibl.hdr_scale > 0
        for tabs in (ibl.irradiance, ibl.spec_gloss, ibl.spec_rough):
            # small tables stay u8 (MXU path); big gather tables pack int32
            assert tabs[0].quads.dtype in (jnp.uint8, jnp.int32)

    def test_constant_env_irradiance_is_constant(self):
        from bibim_tpu.ops.ibl import _convolve

        env = np.full((16, 32, 3), 2.0, np.float32)
        irr = _convolve(env, 8, 16, power=1.0)
        np.testing.assert_allclose(irr, 2.0, rtol=1e-4)

    def test_ibl_replaces_ambient(self):
        from bibim_tpu.ops.ibl import make_ibl

        scene = _occluder_scene()
        ibl = make_ibl()
        s_off = RenderSettings(width=W, height=H, xla_cap=256)
        s_on = RenderSettings(width=W, height=H, xla_cap=256,
                              enable_ibl=True)
        off = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_off)["image"]
        )
        on = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_on,
                         ibl=ibl)["image"]
        )
        assert not np.array_equal(on, off)
        # sky-lit ambient should be brighter than the 0.03 constant
        hit = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_off)["tri_id"]
        ) >= 0
        assert on[hit].astype(int).mean() > off[hit].astype(int).mean() * 0.5

    def test_analytic_fit_matches_convolved_products(self):
        """The SphPoly+SG fit must track the brute-force convolved maps
        (the table path's ground truth) to a few percent of each map's
        peak — tighter than the table path's u8 quantization for the dim
        products."""
        from bibim_tpu.ops.ibl import (_convolve, _fit_sph_poly,
                                       make_procedural_sky, sph_poly_error)

        env = make_procedural_sky()
        irr = _convolve(env, 16, 32, power=1.0)
        rough = _convolve(env, 24, 48, power=6.0)
        gloss = _convolve(env, 48, 96, power=160.0)
        assert sph_poly_error(_fit_sph_poly(irr, 2, False), irr) < 0.02
        assert sph_poly_error(_fit_sph_poly(rough, 4, True), rough) < 0.02
        assert sph_poly_error(_fit_sph_poly(gloss, 4, True), gloss) < 0.05

    def test_analytic_matches_table_ambient(self):
        """ibl_ambient with IblSH must agree with the IblMaps oracle on
        random shading inputs (both approximate the same convolved
        products; tolerance covers u8 quantization + fit error)."""
        import jax.numpy as jnp
        from bibim_tpu.ops.ibl import ibl_ambient, make_ibl, make_ibl_sh

        tabs = make_ibl()
        sh = make_ibl_sh()
        rng = np.random.default_rng(7)
        n = tuple(jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
                  for _ in range(3))
        v = tuple(jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
                  for _ in range(3))
        alb = tuple(jnp.asarray(rng.uniform(0.1, 1.0, (4, 128)), jnp.float32)
                    for _ in range(3))
        met = jnp.asarray(rng.uniform(0, 1, (4, 128)), jnp.float32)
        rgh = jnp.asarray(rng.uniform(0.05, 1, (4, 128)), jnp.float32)
        ao = jnp.ones((4, 128), jnp.float32)
        a = ibl_ambient(tabs, n, v, alb, met, rgh, ao, 4, 128,
                        use_pallas=False)
        b = ibl_ambient(sh, n, v, alb, met, rgh, ao, 4, 128)
        scale = max(float(np.asarray(c).max()) for c in a)
        for c in range(3):
            err = np.abs(np.asarray(a[c]) - np.asarray(b[c]))
            assert err.max() < 0.12 * scale, err.max() / scale

    def test_analytic_ibl_renders(self):
        from bibim_tpu.ops.ibl import make_ibl_sh

        scene = _occluder_scene()
        s_on = RenderSettings(width=W, height=H, xla_cap=256,
                              enable_ibl=True)
        s_off = RenderSettings(width=W, height=H, xla_cap=256)
        on = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_on,
                         ibl=make_ibl_sh())["image"]
        )
        off = np.asarray(
            render_frame(scene, _view(), _fp(), _mat(), None, s_off)["image"]
        )
        assert not np.array_equal(on, off)
