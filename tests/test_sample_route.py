"""Exact routing for pair/quad-rate block sampling.

The production sampler shares one texture-row gather per 2×1/2×2 pixel
group (RenderSettings.pair_sampling) — bit-exact only for footprints
inside the group's shared (B+1)² texel window. framegraph._sampled_hdr
routes tiles: zero-escape tiles (ops/texture_quad.escape_tiles) take the
group-rate pass, the rest a per-pixel exact pass, so the frame is
bit-identical to pair_sampling=0 BY CONSTRUCTION. These tests pin the
two legs that make that construction sound on CPU:

1. escape_tiles is a faithful guarantee: on tiles it marks clean, the
   group-rate sampler (XLA twin of the fused kernel's pair path, pinned
   against it by tests/test_texture_quad.py) equals the exact sampler
   bitwise; flags are computed with the sampler's own window math.
2. The slot partition covers every slot exactly once, cascades clean
   overflow into the exact pass, and counts escape overflow.

The full routed frame (Pallas-only) is pinned on real TPU by
tests/test_tpu.py::test_pair_sampling_routed_exact.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from bibim_tpu.ops import texture_quad as tq


def _table(seed=21, size=64):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (size, size, 1), np.uint8)
    (tab,) = tq.build_quad_tables({"metallic": img}, block_threshold=1024)
    assert isinstance(tab, tq.BlockTable)
    return tab


def _uv_mixed(nt=6, tile_w=128, h=64, w=64, seed=9):
    """First nt//2 tiles: uv CONSTANT within every 2×2 pixel group (zero
    group spread → provably clean at any pair level); rest: minified
    noise (escapes near-surely). Escape flags must split them."""
    rng = np.random.default_rng(seed)
    rho = np.linspace(0.4, 4.0, nt)[:, None, None]
    x = np.arange(tile_w)[None, None, :] + rng.uniform(0, 0.3, (nt, 8, tile_w))
    y = (np.arange(8)[None, :, None] + rng.uniform(0, 0.3, (nt, 8, tile_w))
         + 16 * np.arange(nt)[:, None, None])
    u = (x * rho / w) % 1.0
    v = (y * rho / h) % 1.0
    nc = nt // 2
    for p in (u, v):
        g = p[:nc].reshape(nc, 4, 2, 64, 2)
        g[:] = g[:, :, :1, :, :1]
    return (jnp.asarray(u.reshape(nt, -1).astype(np.float32)),
            jnp.asarray(v.reshape(nt, -1).astype(np.float32)))


class TestEscapeTiles:
    def test_clean_tiles_sample_bit_exact(self):
        """The routing guarantee itself: clean flag ⇒ group-rate sampling
        equals exact sampling bitwise on every covered pixel."""
        tab = _table()
        u, v = _uv_mixed()
        nt, npx = u.shape
        rng = np.random.default_rng(3)
        valid = jnp.asarray(rng.random((nt, npx)) > 0.15)
        exact = np.asarray(
            tq.sample_table_block(tab, u, v)["metallic"])
        vnp = np.asarray(valid)
        for pair in (1, 2):
            esc = np.asarray(
                tq.escape_tiles(tab, u, v, valid, pair))
            # Non-vacuous: the mixed-rho stream must split the tiles.
            assert esc.any() and not esc.all(), esc
            grp = np.asarray(tq.sample_table_block(
                tab, u, v, pair_rows=pair, valid=valid)["metallic"])
            clean = ~esc
            np.testing.assert_array_equal(
                np.where(vnp[clean], grp[clean], 0.0),
                np.where(vnp[clean], exact[clean], 0.0),
            )
            # Escape flags are not dead weight: at least one flagged tile
            # really differs on a noise table.
            assert np.any((grp != exact) & vnp & esc[:, None])

    def test_uncovered_pixels_never_escape(self):
        tab = _table()
        u, v = _uv_mixed()
        nt, npx = u.shape
        none = jnp.zeros((nt, npx), bool)
        for pair in (1, 2):
            esc = np.asarray(tq.escape_tiles(tab, u, v, none, pair))
            assert not esc.any()

    def test_hw_variant_matches_table(self):
        tab = _table()
        u, v = _uv_mixed()
        valid = jnp.ones(u.shape, bool)
        for pair in (1, 2):
            a = np.asarray(tq.escape_tiles(tab, u, v, valid, pair))
            b = np.asarray(tq.escape_tiles_hw(
                tab.height, tab.width, u, v, valid, pair))
            np.testing.assert_array_equal(a, b)

    def test_group_constant_stream_is_all_clean(self):
        """Zero group spread (uv constant within each 2×2 group) always
        fits the window: no escapes at either pair level."""
        tab = _table()
        u, v = _uv_mixed(nt=4)
        u = u[:2]
        v = v[:2]
        valid = jnp.ones(u.shape, bool)
        for pair in (1, 2):
            assert not np.asarray(
                tq.escape_tiles(tab, u, v, valid, pair)).any()


class TestRoutePartition:
    def _partition(self, flags, q_cap, e_cap):
        """Replicates _sampled_hdr's slot partition."""
        from bibim_tpu.pipeline.framegraph import _compact_ids

        nt = flags.shape[0]
        clean = ~flags
        rank = jnp.cumsum(clean.astype(jnp.int32)) - 1
        over_q = clean & (rank >= q_cap)
        clean_ids, _ = _compact_ids(clean & ~over_q, q_cap, nt)
        esc_ids, esc_over = _compact_ids(flags | over_q, e_cap, nt)
        return (np.asarray(clean_ids), np.asarray(esc_ids),
                int(esc_over))

    def test_every_slot_exactly_once(self):
        rng = np.random.default_rng(11)
        flags = jnp.asarray(rng.random(37) < 0.4)
        nt = 37
        q_ids, e_ids, over = self._partition(flags, 40, 40)
        assert over == 0
        real = np.concatenate([q_ids[q_ids < nt], e_ids[e_ids < nt]])
        np.testing.assert_array_equal(np.sort(real), np.arange(nt))

    def test_clean_overflow_cascades_to_exact(self):
        flags = jnp.zeros(16, bool)  # all clean
        q_ids, e_ids, over = self._partition(flags, 10, 16)
        assert over == 0
        assert (q_ids < 16).sum() == 10
        assert (e_ids < 16).sum() == 6
        real = np.concatenate([q_ids[q_ids < 16], e_ids[e_ids < 16]])
        np.testing.assert_array_equal(np.sort(real), np.arange(16))

    def test_escape_overflow_is_counted(self):
        flags = jnp.ones(16, bool)
        _, e_ids, over = self._partition(flags, 16, 10)
        assert over == 6
        assert (e_ids < 16).sum() == 10

    def test_compact_ids_sentinel(self):
        from bibim_tpu.pipeline.framegraph import _compact_ids

        mask = jnp.asarray([0, 1, 0, 1, 1, 0, 0, 0], bool)
        ids, over = _compact_ids(mask, 5, 99)
        ids = np.asarray(ids)
        assert int(over) == 0
        np.testing.assert_array_equal(ids[:3], [1, 3, 4])
        np.testing.assert_array_equal(ids[3:], [99, 99])
