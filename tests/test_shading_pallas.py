"""Fused shade+tonemap Pallas kernel vs the planar XLA oracle
(shade_pbr_planar → fp16 quantize → tone_map), interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from bibim_tpu.ops.shading_pallas import shade_tonemap_pallas
from bibim_tpu.ops.shading_planar import shade_pbr_planar
from bibim_tpu.ops.tonemap import tone_map
from bibim_tpu.scene.lights import make_lights

NT, NPX = 10, 1024


def _planes(seed=0):
    rng = np.random.default_rng(seed)

    def p(lo=0.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, (NT, NPX)).astype(np.float32))

    return dict(
        world=(p(-5, 5), p(-5, 5), p(-5, 5)),
        normal=(p(-1, 1), p(-1, 1), p(-1, 1)),
        albedo=(p(), p(), p()),
        metallic=p(),
        roughness=p(0.05, 1.0),
        ao=p(),
        valid=jnp.asarray(rng.uniform(0, 1, (NT, NPX)) > 0.3),
    )


def _lights():
    return make_lights([
        dict(type=2, dir=(0.3, -1, 0.5), color=(1, 1, 1), intensity=3.0),
        dict(type=0, pos=(2, 3, -1), color=(1, 0.5, 0.2), intensity=10.0),
        dict(type=1, pos=(0, 5, 0), dir=(0, -1, 0), color=(0.2, 0.8, 1.0),
             intensity=5.0, inner_cutoff=0.9, outer_cutoff=0.5),
    ])


def _oracle(pl_, lights, vp, tm, expo, vis=None, vis_light=0,
            ambient=None):
    light_vis = {vis_light: vis} if vis is not None else None
    hdr = shade_pbr_planar(pl_["world"], pl_["normal"], pl_["albedo"],
                           pl_["metallic"], pl_["roughness"], pl_["ao"],
                           lights, vp, light_vis=light_vis,
                           ambient=ambient)
    hdr = tuple(jnp.where(pl_["valid"], c, 0.0) for c in hdr)
    hdr = tuple(c.astype(jnp.float16).astype(jnp.float32) for c in hdr)
    return tuple(tone_map(c, tm, expo) for c in hdr)



def _assert_close(want, got):
    """FMA association inside the compiled/interpreted kernel can shift a
    value by 1 ulp across an fp16 rounding boundary — same tolerance
    class as the fused raster kernel (≤1 quantum on a sliver of px)."""
    for c in range(3):
        diff = np.abs(np.asarray(want[c]) - np.asarray(got[c]))
        assert (diff > 5e-5).mean() < 1e-3, diff.max()
        assert diff.max() < 2e-3, diff.max()


class TestShadeTonemapPallas:
    def test_matches_oracle_all_light_types(self):
        pl_ = _planes()
        lights = _lights()
        vp = jnp.asarray([0.0, 1.0, -3.0])
        want = _oracle(pl_, lights, vp, jnp.int32(1), jnp.float32(1.3))
        got = shade_tonemap_pallas(
            pl_["world"], pl_["normal"], pl_["albedo"], pl_["metallic"],
            pl_["roughness"], pl_["ao"], pl_["valid"], lights, vp,
            jnp.int32(1), jnp.float32(1.3), interpret=True,
        )
        _assert_close(want, got)

    def test_tonemap_toggle_and_nt_padding(self):
        pl_ = _planes(1)
        # NT=10 is not a TILE_BATCH multiple — exercises the pad path.
        lights = _lights()
        vp = jnp.asarray([1.0, 0.0, 0.0])
        want = _oracle(pl_, lights, vp, jnp.int32(0), jnp.float32(2.0))
        got = shade_tonemap_pallas(
            pl_["world"], pl_["normal"], pl_["albedo"], pl_["metallic"],
            pl_["roughness"], pl_["ao"], pl_["valid"], lights, vp,
            jnp.int32(0), jnp.float32(2.0), interpret=True,
        )
        _assert_close(want, got)
        assert got[0].shape == (NT, NPX)

    def test_shadow_visibility_and_ibl_ambient(self):
        rng = np.random.default_rng(7)
        pl_ = _planes(2)
        lights = _lights()
        vp = jnp.asarray([0.0, 0.0, -2.0])
        vis = jnp.asarray(rng.uniform(0, 1, (NT, NPX)).astype(np.float32))
        amb = tuple(
            jnp.asarray(rng.uniform(0, 0.2, (NT, NPX)).astype(np.float32))
            for _ in range(3)
        )
        want = _oracle(pl_, lights, vp, jnp.int32(1), jnp.float32(1.0),
                       vis=vis, vis_light=0, ambient=amb)
        got = shade_tonemap_pallas(
            pl_["world"], pl_["normal"], pl_["albedo"], pl_["metallic"],
            pl_["roughness"], pl_["ao"], pl_["valid"], lights, vp,
            jnp.int32(1), jnp.float32(1.0), vis_plane=vis, vis_light=0,
            ambient=amb, interpret=True,
        )
        _assert_close(want, got)

    def test_miss_pixels_are_black(self):
        pl_ = _planes(3)
        pl_["valid"] = jnp.zeros((NT, NPX), bool)
        got = shade_tonemap_pallas(
            pl_["world"], pl_["normal"], pl_["albedo"], pl_["metallic"],
            pl_["roughness"], pl_["ao"], pl_["valid"], _lights(),
            jnp.asarray([0.0, 0.0, 0.0]), jnp.int32(1), jnp.float32(1.0),
            interpret=True,
        )
        for c in range(3):
            assert (np.asarray(got[c]) == 0).all()
