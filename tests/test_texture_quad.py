"""Quad-row texture sampling tests: bit-parity with ops.texture's bilinear
sampler (the immutable-sampler contract), size-group splitting, and the
MXU small-table path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bibim_tpu.ops import texture_quad as tq
from bibim_tpu.ops.texture import sample_bilinear

RNG = np.random.default_rng(7)


def _maps(big_shape=(64, 32), small_shape=(16, 16)):
    big = RNG.integers(0, 256, (*big_shape, 4), np.uint8)
    small = RNG.integers(0, 256, (*small_shape, 4), np.uint8)
    maps = {
        "alb_r": big[:, :, 0:1], "alb_g": big[:, :, 1:2],
        "alb_b": big[:, :, 2:3],
        "nrm_x": small[:, :, 0:1], "nrm_y": small[:, :, 1:2],
        "nrm_z": small[:, :, 2:3],
        "metallic": big[:, :, 3:4], "roughness": small[:, :, 3:4],
        "ao": big[:, :, 1:2], "height": small[:, :, 2:3],
    }
    sources = {
        "alb_r": big[:, :, 0:1], "nrm_y": small[:, :, 1:2],
        "metallic": big[:, :, 3:4], "roughness": small[:, :, 3:4],
        "ao": big[:, :, 1:2], "height": small[:, :, 2:3],
    }
    return maps, sources


@pytest.fixture(scope="module")
def uv_planes():
    u = jnp.asarray(RNG.uniform(-1.5, 2.5, (4, 1024)).astype(np.float32))
    v = jnp.asarray(RNG.uniform(-1.5, 2.5, (4, 1024)).astype(np.float32))
    return u, v


class TestQuadTables:
    def test_groups_split_by_resolution(self):
        maps, _ = _maps()
        tables = tq.build_quad_tables(maps)
        assert len(tables) == 2
        sizes = sorted((t.height, t.width) for t in tables)
        assert sizes == [(16, 16), (64, 32)]
        all_slots = sorted(s for t in tables for s in t.present)
        assert all_slots == sorted(tq.SLOTS)

    def test_dense_rows(self):
        maps, _ = _maps()
        tables = tq.build_quad_tables(maps)
        for t in tables:
            # 5 present channels → padded to 8 → 32-byte rows, not 64
            # (large gather tables pack the bytes into int32 lanes).
            if t.quads.dtype == jnp.int32:
                assert t.quads.shape[1] == 8
            else:
                assert t.quads.shape[1] == 4 * 8

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_matches_reference_bilinear(self, uv_planes, use_pallas):
        maps, sources = _maps()
        tables = tq.build_quad_tables(maps)
        u, v = uv_planes
        uv = jnp.stack([u, v], axis=-1)
        out = tq.sample_material(
            tables, u, v, use_pallas=use_pallas, interpret=True
        )
        for slot, img in sources.items():
            ref = np.asarray(sample_bilinear(jnp.asarray(img), uv)[..., 0])
            np.testing.assert_allclose(
                np.asarray(out[slot]), ref, atol=1e-5,
                err_msg=f"slot {slot} (pallas={use_pallas})",
            )

    def test_wrap_addressing(self):
        """REPEAT semantics across the texture seam (quad rows bake the
        wrapped neighbors)."""
        img = np.zeros((8, 8, 1), np.uint8)
        img[0, 0, 0] = 255  # corner texel
        maps = {"ao": img}
        tables = tq.build_quad_tables(maps)
        # Sample exactly between texel (7,7) and wrapped (0,0).
        u = jnp.asarray([[0.0]], jnp.float32)
        v = jnp.asarray([[0.0]], jnp.float32)
        out = tq.sample_material(tables, u, v, use_pallas=False)
        ref = sample_bilinear(
            jnp.asarray(img), jnp.asarray([[[0.0, 0.0]]], jnp.float32)
        )[..., 0]
        np.testing.assert_allclose(np.asarray(out["ao"]),
                                   np.asarray(ref), atol=1e-6)
        assert float(out["ao"][0, 0]) == pytest.approx(0.25, abs=1e-6)


class TestSmallMipRouting:
    """Single-level small mip groups route through the MXU one-hot path
    (no gathers); output must match the gather path exactly."""

    def _mip_maps(self):
        alb = [RNG.integers(0, 256, (32, 32, 1), np.uint8),
               RNG.integers(0, 256, (16, 16, 1), np.uint8)]
        neutral = RNG.integers(0, 256, (4, 4, 1), np.uint8)
        return {"alb_r": alb, "metallic": [neutral]}

    def test_single_level_small_matches_gather(self, uv_planes):
        tables = tq.build_mip_quad_tables(self._mip_maps())
        u, v = uv_planes
        ref = tq.sample_material_mips(tables, u, v, use_pallas=False)
        fast = tq.sample_material_mips(tables, u, v, use_pallas=True,
                                       interpret=True)
        for slot in ("alb_r", "metallic"):
            np.testing.assert_allclose(np.asarray(fast[slot]),
                                       np.asarray(ref[slot]), atol=1e-6)

    def test_multi_material_single_level_small(self, uv_planes):
        m0 = tq.build_mip_quad_tables({"metallic": [np.full((4, 4, 1), 10,
                                                            np.uint8)]})
        m1 = tq.build_mip_quad_tables({"metallic": [np.full((8, 8, 1), 200,
                                                            np.uint8)]})
        merged = tq.merge_mip_quad_materials((m0, m1))
        u, v = uv_planes
        mat_id = (jnp.arange(u.size, dtype=jnp.int32) % 2).reshape(u.shape)
        ref = tq.sample_material_mips_multi(merged, mat_id, u, v,
                                            use_pallas=False)
        fast = tq.sample_material_mips_multi(merged, mat_id, u, v,
                                             use_pallas=True,
                                             interpret=True)
        np.testing.assert_allclose(np.asarray(fast["metallic"]),
                                   np.asarray(ref["metallic"]), atol=1e-6)
        got = np.asarray(fast["metallic"]).ravel()
        want = np.where(np.arange(got.size) % 2 == 0, 10 / 255.0,
                        200 / 255.0)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestPairedTrilinear:
    """Paired mip rows (one gather per trilinear sample) must reproduce
    per-level bilinear sampling blended by the LOD fraction exactly —
    including REPEAT wrap and the clamped last level."""

    def test_matches_per_level_blend(self, uv_planes):
        mips = [RNG.integers(0, 256, (s, s, 1), np.uint8)
                for s in (32, 16, 8)]
        tables = tq.build_mip_quad_tables({"alb_r": mips})
        assert len(tables) == 1 and tables[0].paired
        u, v = uv_planes
        got = tq.sample_mip_table(tables[0], u, v, 4, 256)

        lvl = [tq.build_quad_tables({"alb_r": m})[0] for m in mips]
        lod = tq.quad_lod_planar(u, v, 4, 256, 32, 32)
        l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, 2)
        frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)
        frac = jnp.where(l0 == 2, 0.0, frac)
        s = [tq.sample_table_xla(t, u, v)["alb_r"] for t in lvl]

        def sel(ls):
            out = s[0]
            for li in (1, 2):
                out = jnp.where(ls == li, s[li], out)
            return out

        want = sel(l0) * (1.0 - frac) + sel(jnp.minimum(l0 + 1, 2)) * frac
        np.testing.assert_allclose(np.asarray(got["alb_r"]),
                                   np.asarray(want), atol=1e-5)

    def test_multi_material_paired(self, uv_planes):
        m0 = tq.build_mip_quad_tables(
            {"ao": [np.full((16, 16, 1), 40, np.uint8),
                    np.full((8, 8, 1), 40, np.uint8)]})
        m1 = tq.build_mip_quad_tables(
            {"ao": [np.full((32, 32, 1), 200, np.uint8),
                    np.full((16, 16, 1), 200, np.uint8)]})
        merged = tq.merge_mip_quad_materials((m0, m1))
        assert merged[0].paired
        u, v = uv_planes
        mat_id = (jnp.arange(u.size, dtype=jnp.int32) % 2).reshape(u.shape)
        out = tq.sample_material_mips_multi(merged, mat_id, u, v,
                                            use_pallas=False)
        got = np.asarray(out["ao"]).ravel()
        want = np.where(np.arange(got.size) % 2 == 0, 40 / 255.0,
                        200 / 255.0)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestMipBlockTable:
    """Mip block tables (one gather per TRILINEAR sample): must match the
    paired mip-quad oracle exactly — same taps, same accumulation order,
    dead taps adding exact zeros."""

    def _pyramid(self, rng, base=32, ch=3):
        sizes = []
        s = base
        while s >= 4:
            sizes.append(s)
            s //= 2
        return [rng.integers(0, 256, (s, s, ch), np.uint8) for s in sizes]

    def test_builder_layout(self):
        rng = np.random.default_rng(2)
        mips = self._pyramid(rng, base=64)
        maps = {"alb_r": [m[:, :, 0:1] for m in mips],
                "alb_g": [m[:, :, 1:2] for m in mips],
                "alb_b": [m[:, :, 2:3] for m in mips]}
        (t,) = tq.build_mip_block_tables(maps)
        assert isinstance(t, tq.MipBlockMulti)
        # 3 channels x 41 taps = 123 B -> one 128 B lane row
        assert t.blocks.shape[1] == 128
        assert t.heights == ((64, 32, 16, 8, 4),)
        assert t.last_parent == (False,)
        n_blocks = sum((s // 4) ** 2 for s in (64, 32, 16, 8, 4))
        assert t.blocks.shape[0] == n_blocks

    def test_matches_mip_quad_oracle_exact(self, uv_planes):
        rng = np.random.default_rng(3)
        mips = self._pyramid(rng, base=32, ch=1)
        quad = tq.build_mip_quad_tables({"ao": mips})
        (block,) = tq.build_mip_block_tables({"ao": mips})
        u, v = uv_planes
        want = tq.sample_mip_table(quad[0], u, v, 4, 256)
        zid = jnp.zeros(u.shape, jnp.int32)
        got = tq.sample_mip_block(block, zid, u, v, 4, 256)
        np.testing.assert_array_equal(np.asarray(want["ao"]),
                                      np.asarray(got["ao"]))

    def test_pallas_matches_xla_blend(self, uv_planes):
        rng = np.random.default_rng(5)
        mips = self._pyramid(rng, base=32)
        maps = {"alb_r": [m[:, :, 0:1] for m in mips],
                "alb_g": [m[:, :, 1:2] for m in mips],
                "alb_b": [m[:, :, 2:3] for m in mips]}
        (block,) = tq.build_mip_block_tables(maps)
        u, v = uv_planes
        zid = jnp.zeros(u.shape, jnp.int32)
        want = tq.sample_mip_block(block, zid, u, v, 4, 256)
        got = tq.sample_mip_block_pallas(block, zid, u, v, 4, 256,
                                         interpret=True)
        for slot in ("alb_r", "alb_g", "alb_b"):
            np.testing.assert_allclose(np.asarray(want[slot]),
                                       np.asarray(got[slot]),
                                       rtol=3e-7, atol=3e-7)

    def test_multi_material_routing(self, uv_planes):
        rng = np.random.default_rng(7)
        m0 = tq.build_mip_block_tables(
            {"ao": [np.full((16, 16, 1), 40, np.uint8),
                    np.full((8, 8, 1), 40, np.uint8),
                    np.full((4, 4, 1), 40, np.uint8)]})
        m1 = tq.build_mip_block_tables(
            {"ao": [np.full((32, 32, 1), 200, np.uint8),
                    np.full((16, 16, 1), 200, np.uint8),
                    np.full((8, 8, 1), 200, np.uint8),
                    np.full((4, 4, 1), 200, np.uint8)]})
        merged = tq.merge_mip_block_materials((m0, m1))
        assert len(merged) == 1
        u, v = uv_planes
        mat_id = (jnp.arange(u.size, dtype=jnp.int32) % 2).reshape(u.shape)
        out = tq.sample_material_mips_multi(merged, mat_id, u, v,
                                            tile_h=4, tile_w=256,
                                            use_pallas=False)
        got = np.asarray(out["ao"]).ravel()
        want = np.where(np.arange(got.size) % 2 == 0, 40 / 255.0,
                        200 / 255.0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_truncated_chain_saturates_at_parent(self):
        """A pyramid whose tail is not 4-divisible stops building early;
        lods past the built chain saturate at the stored parent level."""
        rng = np.random.default_rng(9)
        mips = [rng.integers(0, 256, (s, s, 1), np.uint8)
                for s in (16, 8, 4, 2, 1)]
        (t,) = tq.build_mip_block_tables({"ao": mips})
        assert t.heights == ((16, 8, 4),)
        assert t.last_parent == (True,)
        # Huge lod (tiny uv gradient scaled): the blend must produce the
        # deepest reachable level (level 3 = 2x2), fully (frac -> 1).
        nt, npx = 1, 1024
        base = jnp.linspace(0.0, 64.0, npx, dtype=jnp.float32)
        u = base.reshape(nt, npx)
        v = base.reshape(nt, npx)
        zid = jnp.zeros((nt, npx), jnp.int32)
        out = tq.sample_mip_block(t, zid, u, v, 4, 256)
        # level-3 (2x2) bilinear average region: all outputs must lie in
        # the convex hull of that level's texels.
        lvl3 = mips[3][:, :, 0].astype(np.float32) / 255.0
        lo, hi = lvl3.min(), lvl3.max()
        got = np.asarray(out["ao"])[0, 8:]  # skip the low-lod head
        assert got.min() >= lo - 1e-6 and got.max() <= hi + 1e-6


class TestBlockTable:
    def test_block_matches_quad_oracle_bitexact(self, uv_planes):
        """Neighborhood-block sampling must be BIT-exact with the quad
        oracle: same tap products, same accumulation order (dead taps add
        exact zeros)."""
        rng = np.random.default_rng(3)
        h = w = 64
        tex = np.zeros((h, w, 4), np.uint8)
        tex[:, :, 0] = rng.integers(0, 256, (h, w), np.uint8)
        tex[:, :, 1] = rng.integers(0, 256, (h, w), np.uint8)
        maps = {"roughness": tex[:, :, 0:1], "ao": tex[:, :, 1:2]}
        (quad,) = tq.build_quad_tables(maps)
        assert isinstance(quad, tq.QuadTable)
        block = tq._build_block_table(tex, h, w, ("roughness", "ao"), 4)
        u, v = uv_planes
        want = tq.sample_table_xla(quad, u, v)
        got = tq.sample_table_block(block, u, v)
        for slot in ("roughness", "ao"):
            np.testing.assert_array_equal(np.asarray(want[slot]),
                                          np.asarray(got[slot]))

    def test_block_pallas_matches_xla_blend(self, uv_planes):
        """The fused Pallas blend must match the XLA block blend to ≤1 ulp
        (FMA/reassociation differences only — the fused-raster tolerance
        class; the XLA blend stays bit-exact with the quad oracle)."""
        rng = np.random.default_rng(7)
        h = w = 64
        tex = np.zeros((h, w, 4), np.uint8)
        tex[:, :, 0] = rng.integers(0, 256, (h, w), np.uint8)
        tex[:, :, 1] = rng.integers(0, 256, (h, w), np.uint8)
        tex[:, :, 2] = rng.integers(0, 256, (h, w), np.uint8)
        block = tq._build_block_table(
            tex, h, w, ("roughness", "ao", "height"), 4)
        u, v = uv_planes
        want = tq.sample_table_block(block, u, v)
        got = tq.sample_table_block_pallas(block, u, v, interpret=True)
        for slot in ("roughness", "ao", "height"):
            np.testing.assert_allclose(np.asarray(want[slot]),
                                       np.asarray(got[slot]),
                                       rtol=3e-7, atol=3e-7)

    def test_block_pallas_nondivisible_tiles(self):
        """NT not divisible by the tile batch pads and slices back."""
        rng = np.random.default_rng(11)
        h = w = 32
        tex = np.zeros((h, w, 4), np.uint8)
        tex[:, :, 0] = rng.integers(0, 256, (h, w), np.uint8)
        block = tq._build_block_table(tex, h, w, ("metallic",), 4)
        nt, npx = 19, 256
        u = jnp.asarray(
            rng.random((nt, npx), np.float32) * 2.0 - 0.5)
        v = jnp.asarray(
            rng.random((nt, npx), np.float32) * 2.0 - 0.5)
        want = tq.sample_table_block(block, u, v)
        got = tq.sample_table_block_pallas(block, u, v, interpret=True)
        np.testing.assert_allclose(np.asarray(want["metallic"]),
                                   np.asarray(got["metallic"]),
                                   rtol=3e-7, atol=3e-7)

    def test_builder_routes_big_groups_to_block_tables(self):
        big = np.zeros((2048, 1024, 1), np.uint8)
        small = np.zeros((16, 16, 1), np.uint8)
        tables = tq.build_quad_tables({"roughness": big, "ao": small},
                                      block_threshold=1 << 20)
        kinds = {type(t).__name__ for t in tables}
        assert kinds == {"BlockTable", "QuadTable"}
        bt = [t for t in tables if isinstance(t, tq.BlockTable)][0]
        assert bt.blocks.shape == (2048 * 1024 // 16, 128)
        assert bt.blocks.dtype == jnp.uint8

    def test_block_sampling_through_sample_material(self, uv_planes):
        rng = np.random.default_rng(5)
        big = rng.integers(0, 256, (2048, 1024, 1), np.uint8)
        tables = tq.build_quad_tables({"roughness": big},
                                      block_threshold=1 << 20)
        u, v = uv_planes
        out = tq.sample_material(tables, u, v, use_pallas=False)
        # spot check vs direct bilinear at a few points
        want = sample_bilinear(
            jnp.asarray(np.repeat(big, 4, axis=2)),
            jnp.stack([u.reshape(-1, 1)[:8, 0], v.reshape(-1, 1)[:8, 0]],
                      axis=-1)[None],
        )
        np.testing.assert_allclose(
            np.asarray(out["roughness"]).ravel()[:8],
            np.asarray(want)[0, :, 0], atol=1e-6,
        )


class TestPairSampling:
    """Pair-rate block sampling (RenderSettings.pair_sampling): one row
    gather per vertically-adjacent pixel pair, both pixels re-blended in
    the rep's window (ops/texture_quad.block_prep pair_rows)."""

    def _table(self):
        rng = np.random.default_rng(21)
        img = rng.integers(0, 256, (64, 64, 1), np.uint8)
        (tab,) = tq.build_quad_tables({"metallic": img},
                                      block_threshold=1024)
        assert isinstance(tab, tq.BlockTable)
        return tab

    def _uv(self, rho, nt=3, tile_w=128, h=64, w=64):
        rng = np.random.default_rng(9)
        x = (np.arange(tile_w)[None, None, :]
             + rng.uniform(0, 0.2, (nt, 8, tile_w)))
        y = (np.arange(8)[None, :, None]
             + rng.uniform(0, 0.2, (nt, 8, tile_w))
             + 10 * np.arange(nt)[:, None, None])
        u = ((x * rho / w) % 1.0).reshape(nt, -1).astype(np.float32)
        v = ((y * rho / h) % 1.0).reshape(nt, -1).astype(np.float32)
        return jnp.asarray(u), jnp.asarray(v)

    def test_in_window_exact_and_bounded(self):
        """Pairs anchored at the covered-min corner: every in-window
        footprint blends bit-exactly; clamped ones never extrapolate
        outside the window's value hull."""
        tab = self._table()
        u, v = self._uv(rho=1.5)
        nt, npx = u.shape
        ones = jnp.ones((nt, npx), bool)
        full = tq.sample_table_block_pallas(tab, u, v, interpret=True)
        pair = tq.sample_table_block_pallas(
            tab, u, v, interpret=True, pair_rows=True, valid=ones)
        f = np.asarray(full["metallic"])
        p = np.asarray(pair["metallic"])
        assert np.all(p >= 0.0) and np.all(p <= 1.0)
        # At 1.5 texels/px most footprints land inside the min-anchored
        # window and must be EXACT (measured 75% on noise content).
        exact = (f == p).mean()
        assert exact > 0.6, exact
        # Identical uv across each pair → one footprint, always exact.
        u2 = jnp.asarray(np.repeat(np.asarray(u).reshape(nt, 4, 2, 128)
                                   [:, :, :1], 2, axis=2).reshape(nt, npx))
        v2 = jnp.asarray(np.repeat(np.asarray(v).reshape(nt, 4, 2, 128)
                                   [:, :, :1], 2, axis=2).reshape(nt, npx))
        fe = tq.sample_table_block_pallas(tab, u2, v2, interpret=True)
        pe = tq.sample_table_block_pallas(
            tab, u2, v2, interpret=True, pair_rows=True, valid=ones)
        np.testing.assert_array_equal(np.asarray(fe["metallic"]),
                                      np.asarray(pe["metallic"]))

    def test_partners_exact_under_magnification(self):
        tab = self._table()
        u, v = self._uv(rho=0.4)
        nt, npx = u.shape
        ones = jnp.ones((nt, npx), bool)
        full = tq.sample_table_block_pallas(tab, u, v, interpret=True)
        pair = tq.sample_table_block_pallas(
            tab, u, v, interpret=True, pair_rows=True, valid=ones)
        np.testing.assert_array_equal(np.asarray(full["metallic"]),
                                      np.asarray(pair["metallic"]))

    def test_covered_partner_becomes_rep(self):
        """When the even row is uncovered, the pair gathers at the ODD
        row's footprint, which is then bit-exact (silhouette rule)."""
        tab = self._table()
        u, v = self._uv(rho=1.5)
        nt, npx = u.shape
        val = np.zeros((nt, 8, 128), bool)
        val[:, 1::2] = True
        full = tq.sample_table_block_pallas(tab, u, v, interpret=True)
        pair = tq.sample_table_block_pallas(
            tab, u, v, interpret=True, pair_rows=True,
            valid=jnp.asarray(val.reshape(nt, npx)))
        f = np.asarray(full["metallic"]).reshape(nt, 8, 128)
        p = np.asarray(pair["metallic"]).reshape(nt, 8, 128)
        np.testing.assert_array_equal(f[:, 1::2], p[:, 1::2])

    def test_off_is_default_identity(self):
        """pair_rows=False must leave the original prep untouched."""
        tab = self._table()
        u, v = self._uv(rho=1.5)
        a = tq.block_prep(tab, u, v)
        b = tq.block_prep(tab, u, v, pair_rows=False)
        for k in ("qt", "lx", "ly", "tx", "ty"):
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))

    def test_xla_twin_matches_pallas_pair(self):
        """sample_table_block(pair_rows) is the XLA oracle of the fused
        kernel's pair path: identical prep, ≤1-ulp blend difference."""
        tab = self._table()
        u, v = self._uv(rho=1.7)
        nt, npx = u.shape
        rng = np.random.default_rng(3)
        val = jnp.asarray(rng.random((nt, npx)) > 0.2)
        a = tq.sample_table_block(tab, u, v, pair_rows=True, valid=val)
        b = tq.sample_table_block_pallas(tab, u, v, interpret=True,
                                         pair_rows=True, valid=val)
        np.testing.assert_allclose(np.asarray(a["metallic"]),
                                   np.asarray(b["metallic"]),
                                   rtol=3e-7, atol=3e-7)

    def test_sample_material_threads_pair(self):
        tab = self._table()
        u, v = self._uv(rho=0.4)
        nt, npx = u.shape
        ones = jnp.ones((nt, npx), bool)
        full = tq.sample_material((tab,), u, v, use_pallas=False)
        pair = tq.sample_material((tab,), u, v, use_pallas=False,
                                  pair_rows=True, valid=ones)
        np.testing.assert_array_equal(np.asarray(full["metallic"]),
                                      np.asarray(pair["metallic"]))
