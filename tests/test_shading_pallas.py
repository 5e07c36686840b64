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


def _assert_close_rel(want, got):
    """Unquantized HDR can exceed 1.0, so tolerance scales with magnitude
    (same ≤1-ulp-class bound as _assert_close, relative)."""
    for c in range(3):
        w = np.asarray(want[c])
        diff = np.abs(w - np.asarray(got[c])) / (1.0 + np.abs(w))
        assert (diff > 5e-5).mean() < 1e-3, diff.max()
        assert diff.max() < 2e-3, diff.max()


class TestShadeSampledPallas:
    """Fused sampling+normal-map+quantize+shade kernel vs the oracle chain
    (sample_material XLA → apply_normal_map → mask → fp16 → shade)."""

    def _tables(self):
        from bibim_tpu.ops import texture_quad as tq

        rng = np.random.default_rng(11)

        def m(h, w):
            return rng.integers(0, 256, (h, w, 1), dtype=np.uint8)

        maps = {
            "metallic": m(64, 64), "roughness": m(64, 64),
            "ao": m(64, 64), "height": m(64, 64),
            "alb_r": m(16, 16), "alb_g": m(16, 16), "alb_b": m(16, 16),
            "nrm_x": m(16, 16), "nrm_y": m(16, 16), "nrm_z": m(16, 16),
        }
        return tq.build_quad_tables(maps, block_threshold=1024)

    def _px(self, seed=5):
        rng = np.random.default_rng(seed)

        def p(lo=0.0, hi=1.0):
            return jnp.asarray(
                rng.uniform(lo, hi, (NT, NPX)).astype(np.float32))

        return dict(
            u=p(-2, 3), v=p(-2, 3),
            world=(p(-5, 5), p(-5, 5), p(-5, 5)),
            normal=(p(-1, 1), p(-1, 1), p(-1, 1)),
            tangent=(p(-1, 1), p(-1, 1), p(-1, 1)),
            valid=jnp.asarray(rng.uniform(0, 1, (NT, NPX)) > 0.3),
        )

    def _oracle(self, tables, px, lights, vp, nm_enable, gbuffer_mode,
                quantize, vis=None, vis_light=0):
        from bibim_tpu.ops import texture_quad as tq
        from bibim_tpu.ops.shading_planar import apply_normal_map

        slots = tq.sample_material(tables, px["u"], px["v"],
                                   use_pallas=False)
        albedo = (slots["alb_r"], slots["alb_g"], slots["alb_b"])
        nmap = (slots["nrm_x"], slots["nrm_y"], slots["nrm_z"])
        normal = apply_normal_map(px["normal"], px["tangent"], nmap,
                                  nm_enable)
        valid = px["valid"]

        def mq(x):
            if gbuffer_mode:
                x = jnp.where(valid, x, 0.0)
            if quantize:
                x = x.astype(jnp.float16).astype(jnp.float32)
            return x

        world = tuple(mq(c) for c in px["world"])
        normal = tuple(mq(c) for c in normal)
        albedo = tuple(mq(c) for c in albedo)
        met, rough, ao = (mq(slots["metallic"]), mq(slots["roughness"]),
                          mq(slots["ao"]))
        light_vis = {vis_light: vis} if vis is not None else None
        hdr = shade_pbr_planar(world, normal, albedo, met, rough, ao,
                               lights, vp, light_vis=light_vis)
        return tuple(jnp.where(valid, c, 0.0) for c in hdr)

    def _got(self, tables, px, lights, vp, nm_enable, gbuffer_mode,
             quantize, vis=None, vis_light=0):
        from bibim_tpu.ops import texture_quad as tq
        from bibim_tpu.ops.shading_pallas import shade_sampled_pallas

        groups = []
        for t in tables:
            if isinstance(t, tq.BlockTable):
                groups.append(tq.block_prep(t, px["u"], px["v"]))
            else:
                groups.append(tq.small_prep(t, px["u"], px["v"]))
        return shade_sampled_pallas(
            groups, px["world"], px["normal"], px["tangent"], px["valid"],
            lights, vp, nm_enable, vis_plane=vis, vis_light=vis_light,
            gbuffer_mode=gbuffer_mode, quantize=quantize, interpret=True,
        )

    def test_deferred_quantized_normal_map_on(self):
        tables = self._tables()
        px = self._px()
        lights = _lights()
        vp = jnp.asarray([0.0, 1.0, -3.0])
        want = self._oracle(tables, px, lights, vp, jnp.int32(1), True,
                            True)
        got = self._got(tables, px, lights, vp, jnp.int32(1), True, True)
        _assert_close(want, got)

    def test_deferred_normal_map_off_with_vis(self):
        tables = self._tables()
        px = self._px(6)
        rng = np.random.default_rng(9)
        vis = jnp.asarray(rng.uniform(0, 1, (NT, NPX)).astype(np.float32))
        lights = _lights()
        vp = jnp.asarray([1.0, 2.0, 0.0])
        want = self._oracle(tables, px, lights, vp, jnp.int32(0), True,
                            True, vis=vis, vis_light=0)
        got = self._got(tables, px, lights, vp, jnp.int32(0), True, True,
                        vis=vis, vis_light=0)
        _assert_close(want, got)

    def test_forward_unquantized(self):
        tables = self._tables()
        px = self._px(7)
        lights = _lights()
        vp = jnp.asarray([0.0, 0.0, -2.0])
        want = self._oracle(tables, px, lights, vp, jnp.int32(1), False,
                            False)
        got = self._got(tables, px, lights, vp, jnp.int32(1), False,
                        False)
        _assert_close_rel(want, got)

    def test_mipblock_group(self):
        """Trilinear mip-block groups (config 2's binding) inside the
        fused kernel vs the XLA mip sampler + oracle shade chain."""
        from bibim_tpu.ops import texture_quad as tq
        from bibim_tpu.ops.shading_pallas import shade_sampled_pallas
        from bibim_tpu.ops.shading_planar import apply_normal_map

        rng = np.random.default_rng(21)

        def pyramid(base, ch):
            out, s = [], base
            while s >= 4:
                out.append(rng.integers(0, 256, (s, s, ch), np.uint8))
                s //= 2
            return out

        def build_one():
            alb = pyramid(32, 3)
            neutral = rng.integers(0, 256, (4, 4, 1), np.uint8)
            return tq.build_mip_block_tables({
                "alb_r": [m[:, :, 0:1] for m in alb],
                "alb_g": [m[:, :, 1:2] for m in alb],
                "alb_b": [m[:, :, 2:3] for m in alb],
                "metallic": [neutral], "roughness": [neutral],
                "ao": [neutral],
            })

        merged = tq.merge_mip_block_materials((build_one(), build_one()))
        kinds = {type(t).__name__ for t in merged}
        assert kinds == {"MipBlockMulti", "MipQuadMulti"}

        px = self._px(9)
        mat_id = (jnp.arange(NT * NPX, dtype=jnp.int32) % 2).reshape(
            (NT, NPX))
        lights = _lights()
        vp = jnp.asarray([0.0, 1.0, -3.0])

        slots = tq.sample_material_mips_multi(
            merged, mat_id, px["u"], px["v"], tile_h=8, tile_w=128,
            use_pallas=False)
        albedo = (slots["alb_r"], slots["alb_g"], slots["alb_b"])
        nmap = (slots["nrm_x"], slots["nrm_y"], slots["nrm_z"])
        normal = apply_normal_map(px["normal"], px["tangent"], nmap,
                                  jnp.int32(0))
        valid = px["valid"]

        def mq(x):
            return jnp.where(valid, x, 0.0).astype(jnp.float16).astype(
                jnp.float32)

        want = shade_pbr_planar(
            tuple(mq(c) for c in px["world"]), tuple(mq(c) for c in normal),
            tuple(mq(c) for c in albedo), mq(slots["metallic"]),
            mq(slots["roughness"]), mq(slots["ao"]), lights, vp,
        )
        want = tuple(jnp.where(valid, c, 0.0) for c in want)

        groups = []
        for t in merged:
            if isinstance(t, tq.MipBlockMulti):
                groups.append(tq.mip_block_prep(t, mat_id, px["u"],
                                                px["v"], 8, 128))
            else:
                groups.append(tq.small_prep_multi(t, mat_id, px["u"],
                                                  px["v"]))
        got = shade_sampled_pallas(
            groups, px["world"], px["normal"], px["tangent"], valid,
            lights, vp, jnp.int32(0), gbuffer_mode=True, quantize=True,
            interpret=True,
        )
        _assert_close(want, got)

    def test_direct_planes_group(self):
        # Big-table groups sampled upstream enter as direct slot planes.
        from bibim_tpu.ops import texture_quad as tq
        from bibim_tpu.ops.shading_pallas import shade_sampled_pallas

        tables = self._tables()
        px = self._px(8)
        lights = _lights()
        vp = jnp.asarray([0.5, 0.5, -1.0])
        want = self._oracle(tables, px, lights, vp, jnp.int32(1), True,
                            True)
        groups = []
        for t in tables:
            if isinstance(t, tq.BlockTable):
                slots = tq.sample_table_block(t, px["u"], px["v"])
                groups.append({
                    "kind": "direct", "present": t.present,
                    "planes": [slots[s] for s in t.present],
                })
            else:
                groups.append(tq.small_prep(t, px["u"], px["v"]))
        got = shade_sampled_pallas(
            groups, px["world"], px["normal"], px["tangent"], px["valid"],
            lights, vp, jnp.int32(1), gbuffer_mode=True, quantize=True,
            interpret=True,
        )
        _assert_close(want, got)
