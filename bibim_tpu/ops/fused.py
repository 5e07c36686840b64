"""Fused raster + attribute-resolve — the TPU performance path.

Replaces the round-1 pipeline of [Pallas raster → XLA pixel-rate gathers for
bary/attributes] with ONE Pallas kernel per screen tile that:

1. rasterizes (homogeneous edge functions, reversed-Z GREATER_OR_EQUAL,
   later-candidate tie wins — same semantics as ops/raster.py),
2. resolves the winning candidate's per-triangle record to every pixel via a
   one-hot matmul on the MXU, and
3. interpolates all vertex attributes (uv, normal, tangent, world position,
   color) with perspective-correct barycentrics, emitting them as *planar*
   (NT, NPX) channels.

Why this shape (all measured on v5e through the bench harness):
- XLA row gathers cost ~8 ns *per row* regardless of row size, so any
  pixel-rate gather formulation is 100+ ms/frame at 1080p. The one-hot
  resolve turns "gather per pixel" into "matmul per tile" on the MXU.
- (H, W, C) arrays put C in the 128-lane minor dim → 125/128 lanes wasted;
  channel-sliced reads of (NT, C, NPX) tensors relayout at ~30 GB/s. Planar
  (NT, NPX) per-channel arrays are perfectly VPU-tiled, so every downstream
  stage (texture addressing, GGX shading, tonemap) is dense vector math.
- Per-tile candidate records are fetched with one DMA from a sorted pair
  list (sparse binning) — no dense (NT, cap) pre-gather.
- Binning expands (triangle → tile) pairs densely per triangle (span_cap
  slots, pure elementwise) then sorts by tile id: cumsum+searchsorted
  "exact" expansion was measured 2× slower (searchsorted = 14 rounds of
  gathers).

The reference analog of this stage is the fixed-function rasterizer +
attribute interpolation between gbuffer.vert and gbuffer.frag
(/root/reference/src/shaders/gbuffer.vert:18-36, clipless-homogeneous
formulation per ops/raster.py docs).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bibim_tpu.ops.raster import PlanarSetup, TriangleSetup, triangle_setup

CHUNK = 8
_LOW3 = ~7  # clears the 3 lane-index bits from a packed depth key
# Tile-group sizing for the per-tile fused kernel: batch GROUP_SIZES[0]
# tiles per grid step when the double-buffered record slab fits
# GROUP_SLAB_BYTES of scoped VMEM (amortizes the fixed per-step cost;
# see make_call). Module-level so experiments can sweep them.
GROUP_SIZES = (8, 4, 2, 1)
GROUP_SLAB_BYTES = 6 << 20
NSUB_FINE = 8  # fine-bin subtiles per coarse tile (raster_fused_pallas
# fine_bins): tile_w/8 = 16-px-wide bins, tile_h tall — one VPU row
# (128 px) of pixels per subtile.
GROUP_VMEM_LIMIT = None  # scoped-VMEM override for big groups (bytes)
# Merged coverage schedule (raster_fused_pallas merged_coverage=True):
# ONE fori_loop per grid step at the group's max chunk count (dead
# chunks masked by _chunk_test's `live` — bit-identical results)
# instead of `group` dynamic fori_loops, plus chunk-class-sorted
# compact slots so each group's max ≈ its mean. Measured
# (tools/exp_merged.py): config 4 (x64, 5 passes, fat windows)
# 7.24 → 6.87 ms raster stage; the single-pass thin-tile headline
# REGRESSES (3.73 → 4.26) — autotune enables it only for multi-pass
# configs.
# Record rows are 128 f32 wide: Mosaic DMA slices must be lane-aligned
# (128), and the MXU pads the resolve matmul's M dim to 128 regardless.
REC_CH = 128

# Record channel layout (see build_record_table):
_A, _B, _C = 0, 3, 6  # edge coefficients A0A1A2 B0B1B2 C0C1C2
_ZC, _WC = 9, 12  # z / w interpolation coefficients
_ID = 15  # triangle id + 1 (0 = miss)
_U, _V = 16, 19  # uv corners (u0 u1 u2, v0 v1 v2)
_N = 22  # normal corners, axis-major: nx0 nx1 nx2 ny0 .. nz2
_T = 31  # tangent corners
_W = 40  # world-position corners
_COL = 49  # vertex-color corners
_MAT = 58  # material id of the triangle (corner-0 vertex)
_ZUB = 59  # conservative NDC-depth upper bound (setup.zub) — the
# early-z coverage loop's remaining-work bound. (setup.zub itself is
# 1.0 for w_ok-false rows; the record row is zeroed for culled rows by
# the final `rec * valid` multiply in the builders below.)
_USED = 60


class FusedPixels(NamedTuple):
    """Tiled-planar per-pixel output; every array is (NT, NPX) with
    NPX = tile_h*tile_w. Use :func:`untile` for (H, W) images."""

    tri_id: jnp.ndarray  # int32, -1 = miss
    depth: jnp.ndarray  # reversed-Z depth (0 = far/clear)
    bary: tuple  # (b0, b1, b2) perspective-correct
    uv: tuple  # (u, v)
    normal: tuple  # (nx, ny, nz) world-space (interpolated, unnormalized)
    tangent: tuple  # (tx, ty, tz)
    world: tuple  # (wx, wy, wz)
    color: tuple  # (r, g, b) vertex color
    mat_id: jnp.ndarray  # int32 material index (0 where miss)


class BinDiag(NamedTuple):
    """Binning-capacity diagnostics (traced scalars). Non-zero values mean
    geometry was dropped — surfaced via utils.validation."""

    dropped_overflow: jnp.ndarray  # big triangles beyond overflow slots
    dropped_cap: jnp.ndarray  # per-tile candidates beyond max_candidates
    dropped_pairs: jnp.ndarray  # live pairs beyond pair_budget
    dropped_tiles: object = 0  # covered tiles beyond an overlay pass's
    # compact-grid capacity (composite_overlay_pallas max_tiles)


def build_record_table(setup: TriangleSetup, tris: jnp.ndarray,
                       uv, normal, tangent, world, color,
                       mat_id=None, sequential: bool = False) -> jnp.ndarray:
    """Pack per-triangle raster coefficients + corner attributes into one
    (T, 128) f32 record table (one DMA/gather-friendly row per triangle).

    Attribute args are (V, k) vertex arrays; ``mat_id`` is (V,) int32 or
    None. Invalid (culled) triangles get all-zero rows so a stray candidate
    can never cover a pixel.
    """
    t = tris.shape[0]
    v = uv.shape[0]
    if mat_id is None:
        mat_id = jnp.zeros((v,), jnp.int32)
    # One combined per-vertex attr matrix → a single (T,3) row gather.
    vert = jnp.concatenate(
        [
            uv,  # 0:2
            normal,  # 2:5
            tangent,  # 5:8
            world,  # 8:11
            color,  # 11:14
            mat_id.astype(jnp.float32)[:, None],  # 14
            jnp.zeros((v, 1), jnp.float32),
        ],
        axis=-1,
    )  # (V, 16)
    # De-indexed scenes: corner fetch by reshape (see batch_from_mesh).
    va = vert.reshape(-1, 3, 16) if sequential else vert[tris]  # (T,3,16)

    def corners(ch):
        return va[:, :, ch]  # (T,3)

    ids = jnp.arange(t, dtype=jnp.float32) + 1.0

    cols = [
        setup.edge_a,  # 0:3
        setup.edge_b,  # 3:6
        setup.edge_c,  # 6:9
        setup.z_coef,  # 9:12
        setup.w_coef,  # 12:15
        ids[:, None],  # 15
        corners(0),  # u 16:19
        corners(1),  # v 19:22
        corners(2), corners(3), corners(4),  # n 22:31
        corners(5), corners(6), corners(7),  # t 31:40
        corners(8), corners(9), corners(10),  # w 40:49
        corners(11), corners(12), corners(13),  # col 49:58
        va[:, 0:1, 14],  # mat (corner 0) 58
        (setup.zub[:, None] if setup.zub is not None
         else jnp.zeros((t, 1), jnp.float32)),  # 59
        jnp.zeros((t, REC_CH - _USED), jnp.float32),
    ]
    rec = jnp.concatenate(cols, axis=-1)
    return rec * setup.valid.astype(jnp.float32)[:, None]


def build_record_table_planar(setup: PlanarSetup, soup) -> jnp.ndarray:
    """Corner-planar :func:`build_record_table`: stack 60 dense (T,)
    channel planes channel-major and transpose once into the (T, 128) row
    layout the per-tile DMA needs. Replaces ~20 narrow lane-dim concats of
    (T, 3) pieces (3/128-lane ops — ~16 ms at 625k triangles) with one
    dense block transpose. Channel order matches build_record_table
    exactly (same record constants _A.._USED)."""
    t = setup.valid.shape[0]
    ids = jnp.arange(t, dtype=jnp.float32) + 1.0
    planes = [
        *setup.edge_a, *setup.edge_b, *setup.edge_c,  # 0:9
        *setup.z_coef, *setup.w_coef,  # 9:15
        ids,  # 15
        *soup.uv[0], *soup.uv[1],  # 16:22
        *soup.normal[0], *soup.normal[1], *soup.normal[2],  # 22:31
        *soup.tangent[0], *soup.tangent[1], *soup.tangent[2],  # 31:40
        *soup.world[0], *soup.world[1], *soup.world[2],  # 40:49
        *soup.color[0], *soup.color[1], *soup.color[2],  # 49:58
        soup.mat,  # 58
        (setup.zub if setup.zub is not None
         else jnp.zeros_like(setup.valid, jnp.float32)),  # 59
    ]
    assert len(planes) == _USED
    cm = jnp.stack(planes, axis=0)  # (60, T) — sublane-dim stack, dense
    rec = jnp.pad(jnp.transpose(cm, (1, 0)), ((0, 0), (0, REC_CH - _USED)))
    return rec * setup.valid.astype(jnp.float32)[:, None]


def shift_record_table_y(rec_table: jnp.ndarray, y0) -> jnp.ndarray:
    """Rebase a record table to band-local pixel rows (multi-chip bands).

    E(px, py_global) = A·px + B·(py_local + y0) + C, so shifting the
    constant terms (C += B·y0, likewise for the z/w interpolation planes)
    lets the unmodified kernel rasterize a horizontal band with local row
    coordinates. ``y0`` may be a traced scalar (shard_map axis index)."""
    y0 = jnp.asarray(y0, jnp.float32)
    c_new = rec_table[:, _C : _C + 3] + rec_table[:, _B : _B + 3] * y0
    cz_new = rec_table[:, _ZC + 2 : _ZC + 3] + (
        rec_table[:, _ZC + 1 : _ZC + 2] * y0
    )
    cw_new = rec_table[:, _WC + 2 : _WC + 3] + (
        rec_table[:, _WC + 1 : _WC + 2] * y0
    )
    return jnp.concatenate(
        [
            rec_table[:, :_C],
            c_new,
            rec_table[:, _ZC : _ZC + 2],
            cz_new,
            rec_table[:, _WC : _WC + 2],
            cw_new,
            rec_table[:, _ID:],
        ],
        axis=-1,
    )


SPAN_DENSE = 2  # dense expansion slots per triangle in span-class mode


def bin_pairs(
    setup: TriangleSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    span_cap: int = 16,
    overflow_cap: int = 64,
    max_candidates: int = 320,
    pair_budget: int | None = None,
    span_mid_cap: int | None = None,
    zorder: bool = False,
):
    """Sort-based sparse binning: (triangle, tile) pairs → contiguous
    per-tile [start, count) ranges into one sorted pair list.

    Each triangle expands to ``span_cap`` dense pair slots (pure elementwise
    math over (T, span_cap) — measured faster than "exact"
    cumsum/searchsorted expansion, whose binary search is ~14 rounds of
    gathers); a stable argsort by tile id groups pairs per tile while
    preserving draw order. Triangles spanning more than span_cap tiles (the
    100× ground plane, near-plane-external tris) go to a shared overflow
    list tested before every tile's own candidates.

    ``span_mid_cap`` enables SPAN-CLASS binning: most triangles cover ≤
    SPAN_DENSE tiles (the headline frame: 16.7k live pairs in 156k
    span-16 slots), so every triangle expands only SPAN_DENSE slots and
    the few spanning (SPAN_DENSE, span_cap] tiles are compacted into a
    ``span_mid_cap``-triangle list that expands at span_cap. The sorted
    (tile, tri) pair set — and therefore the raster — is IDENTICAL; the
    sort input shrinks ~span_cap/2-fold. Mid-list overflow is counted in
    dropped_pairs (a validated capacity like the rest).

    Returns (sorted_tri (P,) int32, starts (NT,), counts (NT,) clamped to
    max_candidates, big_ids (OC,), n_big, diag, tiles_y, tiles_x).
    """
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    nt = tiles_x * tiles_y

    if isinstance(setup, PlanarSetup):
        bx0, by0, bx1, by1 = setup.bbox
    else:
        bx0, by0, bx1, by1 = (setup.bbox[:, i] for i in range(4))
    tx0 = bx0 // tile_w
    ty0 = by0 // tile_h
    tx1 = bx1 // tile_w
    ty1 = by1 // tile_h
    span_w = tx1 - tx0 + 1
    area = span_w * (ty1 - ty0 + 1)

    small = setup.valid & (area <= span_cap)
    big = setup.valid & (area > span_cap)
    dropped_mid = jnp.int32(0)

    def slot_tile(k, live_k):
        """Tile id of a triangle's k-th bbox tile as a FULL-LANE (T,)
        plane. The naive (T, span) expansion puts the span on the minor
        axis (span/128 lane occupancy) and pays a variable-divisor
        integer div per slot — measured ~1.5 ms of config 4's 3.0 ms
        binning (tools/exp_bin64.py). Per-k planes replace k//span_w
        with a compare-sum ladder (floor(k/w) = Σ_{m≤k} [m·w ≤ k]) and
        run at 128/128 lanes. Slot order changes (k-major, not
        tri-major) but the unstable unique-pair sort output is
        identical."""
        if k == 0:
            dy = jnp.zeros_like(span_w)
        else:
            dy = (span_w <= k).astype(jnp.int32)
            for m in range(2, k + 1):
                dy = dy + (m * span_w <= k).astype(jnp.int32)
        dx = k - dy * span_w
        return jnp.where(live_k, (ty0 + dy) * tiles_x + (tx0 + dx), nt)

    if span_mid_cap is not None and span_cap > SPAN_DENSE:
        t = area.shape[0]
        # Dense class: every triangle, SPAN_DENSE slots (k-major planes).
        dense = small & (area <= SPAN_DENSE)
        tile_d = jnp.stack(
            [slot_tile(k, dense & (k < area)) for k in range(SPAN_DENSE)]
        )
        tri_d = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None, :], (SPAN_DENSE, t)
        )

        # Mid class: compacted list of triangles spanning
        # (SPAN_DENSE, span_cap] tiles. ONE top_k compacts BOTH the mid
        # and the big/overflow class (disjoint masks): packed keys rank
        # every big triangle (ascending id) before every mid triangle
        # (ascending id), so bigs occupy a prefix and mids follow at
        # offset n_big — two 156k-row top_k calls were ~1.1 ms of config
        # 4's binning (tools/exp_bin64.py). If bigs overflow their cap
        # they crowd mids out of the window; both overflows stay loudly
        # counted (dropped_overflow / dropped_mid).
        assert t < (1 << 28)
        mid = small & (area > SPAN_DENSE)
        big_base = jnp.int32(3 << 28)
        mid_base = jnp.int32(1 << 28)
        ids_iota = jnp.arange(t, dtype=jnp.int32)
        key = jnp.where(
            big, big_base - ids_iota,
            jnp.where(mid, mid_base - ids_iota, jnp.int32(-(1 << 30))),
        )
        k_sel = overflow_cap + span_mid_cap
        k_top = min(k_sel, t)
        top, _ = lax.top_k(key, k_top)
        if k_top < k_sel:
            top = jnp.pad(top, (0, k_sel - k_top),
                          constant_values=-(1 << 30))
        big_ids = jnp.where(top[:overflow_cap] > jnp.int32(2 << 28),
                            big_base - top[:overflow_cap], -1)
        n_big = jnp.minimum(jnp.sum(big, dtype=jnp.int32), overflow_cap)
        mid_win = lax.dynamic_slice(top, (n_big,), (span_mid_cap,))
        mid_ids = jnp.where(
            (mid_win > 0) & (mid_win <= mid_base),
            mid_base - mid_win, -1,
        )
        msel = jnp.maximum(mid_ids, 0)
        mvalid = mid_ids >= 0
        tx0m = tx0[msel]
        ty0m = ty0[msel]
        span_w_m = span_w[msel]
        area_m = jnp.where(mvalid, area[msel], 0)
        km = jnp.arange(span_cap, dtype=jnp.int32)
        dxm = km[None, :] % span_w_m[:, None]
        dym = km[None, :] // span_w_m[:, None]
        tile_m = (ty0m[:, None] + dym) * tiles_x + (tx0m[:, None] + dxm)
        live_m = mvalid[:, None] & (km[None, :] < area_m[:, None])
        tile_m = jnp.where(live_m, tile_m, nt)
        tri_m = jnp.broadcast_to(msel[:, None], (span_mid_cap, span_cap))

        flat_tile = jnp.concatenate(
            [tile_d.reshape(-1), tile_m.reshape(-1)]
        )
        tri_of_pair = jnp.concatenate(
            [tri_d.reshape(-1), tri_m.reshape(-1)]
        )
        flat_zub = None
        if zorder and setup.zub is not None:
            zub_m = jnp.where(mvalid, setup.zub[msel], 0.0)
            flat_zub = jnp.concatenate([
                jnp.broadcast_to(setup.zub[None, :],
                                 (SPAN_DENSE, t)).reshape(-1),
                jnp.broadcast_to(zub_m[:, None],
                                 (span_mid_cap, span_cap)).reshape(-1),
            ])
        # Mid triangles beyond the cap lose ALL their pairs — count them.
        total_mid_pairs = jnp.sum(jnp.where(mid, area, 0))
        kept_mid_pairs = jnp.sum(area_m)
        dropped_mid = (total_mid_pairs - kept_mid_pairs).astype(jnp.int32)
    else:
        t = area.shape[0]
        tile = jnp.stack(
            [slot_tile(k, small & (k < area)) for k in range(span_cap)]
        )
        flat_tile = tile.reshape(-1)
        tri_of_pair = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None, :], (span_cap, t)
        ).reshape(-1)
        flat_zub = None
        if zorder and setup.zub is not None:
            flat_zub = jnp.broadcast_to(
                setup.zub[None, :], (span_cap, t)).reshape(-1)
        # Smallest overflow_cap indices of `big` via top_k on negated
        # ids (nonzero() was measured slower on TPU).
        neg = jnp.where(big, -jnp.arange(t, dtype=jnp.int32),
                        jnp.int32(-(1 << 30)))
        k_top = min(overflow_cap, t)
        top, _ = lax.top_k(neg, k_top)
        big_ids = jnp.where(top > -(1 << 30), -top, -1)
        if k_top < overflow_cap:
            big_ids = jnp.pad(big_ids, (0, overflow_cap - k_top),
                              constant_values=-1)
        n_big = jnp.minimum(jnp.sum(big, dtype=jnp.int32), overflow_cap)
    # Multi-operand sort carries the payload through the sort — sorting an
    # argsort permutation and gathering afterwards costs an extra
    # P-element gather (~8 ns/row: 80 ms at 10M pairs). Sorting UNSTABLY
    # on BOTH keys is ~40% faster than a stable tile-key sort at 8M pairs
    # (measured, tools/exp_sort.py) and gives the identical order: live
    # (tile, tri) pairs are unique, so the total order by (tile, tri) is
    # deterministic and equals stable-by-tile draw order; equal sentinel
    # pairs are dead tail entries. On TPU the pair list is sorted
    # entirely in VMEM (ops/sort_pallas.py): lax.sort pays ~0.7 ms of
    # fixed per-round HBM latency at binning sizes.
    from bibim_tpu.ops.sort_pallas import sort_pairs as _sort_pairs

    if zorder and setup.zub is not None:
        # Early-z candidate ordering: per tile, DESCENDING conservative
        # depth bucket (reversed-Z: near first), draw order within a
        # bucket. The kernel's explicit draw-order tie carry keeps
        # results bit-identical to the draw-ordered scan; the ordering
        # only enables the coverage loop's remaining-work break.
        from bibim_tpu.ops.sort_pallas import sort_pairs_z, zorder_bits

        sorted_tile, sorted_tri = sort_pairs_z(
            flat_tile, flat_zub, tri_of_pair, nt,
            t_count=int(area.shape[0]),
            bits=zorder_bits(nt, int(area.shape[0])),
        )
    else:
        sorted_tile, sorted_tri = _sort_pairs(
            flat_tile, tri_of_pair, nt, t_count=int(area.shape[0])
        )

    boundaries = jnp.searchsorted(
        sorted_tile, jnp.arange(nt + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    starts = boundaries[:-1]
    counts_raw = boundaries[1:] - starts

    counts = jnp.minimum(counts_raw, max_candidates)
    dropped_pairs = jnp.int32(0)
    if pair_budget is not None and sorted_tri.shape[0] > pair_budget:
        # Live pairs sort before the sentinel tail, so slicing to the
        # (static) budget keeps them all unless the scene exceeds it —
        # which the diagnostics report instead of silently truncating.
        live_total = boundaries[-1]
        dropped_pairs = jnp.maximum(live_total - pair_budget, 0)
        sorted_tri = sorted_tri[:pair_budget]
        starts = jnp.minimum(starts, pair_budget)
        counts = jnp.minimum(counts, pair_budget - starts)
    diag = BinDiag(
        dropped_overflow=jnp.maximum(
            jnp.sum(big, dtype=jnp.int32) - overflow_cap, 0
        ),
        dropped_cap=jnp.sum(jnp.maximum(counts_raw - max_candidates, 0)),
        dropped_pairs=dropped_pairs + dropped_mid,
    )
    return sorted_tri, starts, counts, big_ids, n_big, diag, tiles_y, tiles_x


# Kernel per-pixel output channels (beyond the int32 depth-key plane).
_OUT_FIELDS = (
    "depth", "idf", "u", "v", "nx", "ny", "nz", "tx", "ty", "tz",
    "wx", "wy", "wz", "cr", "cg", "cb", "matf", "b0", "b1",
)

# Per-field value thunks for the resolve stage: (depth_val, blend, r,
# idf, b0, b1) → plane. Only the fields a call emits are computed —
# static output pruning drops both the blend math and the output DMA
# (the production deferred path never reads depth/color/bary planes).
_FIELD_VALS = {
    "depth": lambda d, bl, r, idf, b0, b1: d(),
    "idf": lambda d, bl, r, idf, b0, b1: idf,
    "u": lambda d, bl, r, idf, b0, b1: bl(_U),
    "v": lambda d, bl, r, idf, b0, b1: bl(_V),
    "nx": lambda d, bl, r, idf, b0, b1: bl(_N),
    "ny": lambda d, bl, r, idf, b0, b1: bl(_N + 3),
    "nz": lambda d, bl, r, idf, b0, b1: bl(_N + 6),
    "tx": lambda d, bl, r, idf, b0, b1: bl(_T),
    "ty": lambda d, bl, r, idf, b0, b1: bl(_T + 3),
    "tz": lambda d, bl, r, idf, b0, b1: bl(_T + 6),
    "wx": lambda d, bl, r, idf, b0, b1: bl(_W),
    "wy": lambda d, bl, r, idf, b0, b1: bl(_W + 3),
    "wz": lambda d, bl, r, idf, b0, b1: bl(_W + 6),
    "cr": lambda d, bl, r, idf, b0, b1: bl(_COL),
    "cg": lambda d, bl, r, idf, b0, b1: bl(_COL + 3),
    "cb": lambda d, bl, r, idf, b0, b1: bl(_COL + 6),
    "matf": lambda d, bl, r, idf, b0, b1: r(_MAT),
    "b0": lambda d, bl, r, idf, b0, b1: b0,
    "b1": lambda d, bl, r, idf, b0, b1: b1,
}


def _chunk_test(blk, px, py, chunk_idx, k, base, count, carry):
    """One CHUNK-row coverage/depth test: homogeneous edge tests,
    reversed-Z GEQ packed-key resolve, later-candidate tie win. The body
    shared (op-for-op) by every coverage loop variant."""
    best_key, best_cand = carry

    def coef(j):
        return blk[:, j][:, None]  # (CHUNK, 1)

    e0 = coef(_A + 0) * px + coef(_B + 0) * py + coef(_C + 0)
    e1 = coef(_A + 1) * px + coef(_B + 1) * py + coef(_C + 1)
    e2 = coef(_A + 2) * px + coef(_B + 2) * py + coef(_C + 2)
    zn = coef(_ZC) * px + coef(_ZC + 1) * py + coef(_ZC + 2)
    wn = coef(_WC) * px + coef(_WC + 1) * py + coef(_WC + 2)

    live = (k + chunk_idx) < count
    ok = (
        (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & live
        & (wn > 0.0) & (zn >= 0.0) & (zn <= wn)
    )
    z = zn * pl.reciprocal(jnp.where(wn == 0.0, 1.0, wn), approx=False)
    z = jnp.where(ok, z, -1.0)  # negative float → negative bits
    zbits = pltpu.bitcast(z, jnp.int32)
    key = (zbits & _LOW3) | chunk_idx  # later candidate wins ties
    kmax = jnp.max(key, axis=0, keepdims=True)  # (1, NPX)

    kz = kmax & _LOW3
    accept = kz >= best_key  # int cmp == float cmp for z >= 0
    cand = jnp.where(accept, base + k + (kmax & 7), best_cand)
    return jnp.where(accept, kz, best_key), cand


def _coverage_loop(scratch, px, py, chunk_idx, base, count, carry):
    """Chunked candidate coverage/depth loop over scratch rows
    [base, base+count). Shared by the per-tile fused kernel and the
    compact overlay kernel."""

    def body(c, carry):
        k = c * CHUNK
        blk = scratch[pl.ds(base + k, CHUNK), :]  # (CHUNK, 128)
        return _chunk_test(blk, px, py, chunk_idx, k, base, count, carry)

    return lax.fori_loop(
        0, lax.div(count + (CHUNK - 1), CHUNK), body, carry, unroll=False
    )


def _chunk_test_ord(blk, px, py, chunk_idx, k, base, count, carry):
    """:func:`_chunk_test` with an EXPLICIT draw-order tie carry: the
    winner is the lexicographic argmax of (masked depth key, triangle
    id) over the candidate SET — order-independent, so the early-z
    schedule may scan candidates near-first. Ties the scan-position rule
    resolved by window position (the documented big/small-split and
    multipass knife-edges) resolve here by TRUE draw order — the
    reference's submission-order rule (render.cpp:1121 GEQ + draw
    order). carry = (best_key, best_ord, best_cand)."""
    best_key, best_ord, best_cand = carry

    def coef(j):
        return blk[:, j][:, None]  # (CHUNK, 1)

    e0 = coef(_A + 0) * px + coef(_B + 0) * py + coef(_C + 0)
    e1 = coef(_A + 1) * px + coef(_B + 1) * py + coef(_C + 1)
    e2 = coef(_A + 2) * px + coef(_B + 2) * py + coef(_C + 2)
    zn = coef(_ZC) * px + coef(_ZC + 1) * py + coef(_ZC + 2)
    wn = coef(_WC) * px + coef(_WC + 1) * py + coef(_WC + 2)

    live = (k + chunk_idx) < count
    ok = (
        (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & live
        & (wn > 0.0) & (zn >= 0.0) & (zn <= wn)
    )
    z = zn * pl.reciprocal(jnp.where(wn == 0.0, 1.0, wn), approx=False)
    z = jnp.where(ok, z, -1.0)  # negative float → negative bits
    kz = pltpu.bitcast(z, jnp.int32) & _LOW3
    ordc = jnp.where(ok, coef(_ID), -1.0)  # tri id + 1; −1 when dead
    kmax = jnp.max(kz, axis=0, keepdims=True)  # (1, NPX)
    omax = jnp.max(jnp.where(kz == kmax, ordc, -1.0), axis=0,
                   keepdims=True)
    rsel = (kz == kmax) & (ordc == omax)
    ridx = jnp.max(jnp.where(rsel, chunk_idx, -1), axis=0, keepdims=True)
    accept = (kmax > best_key) | ((kmax == best_key) & (omax >= best_ord))
    return (
        jnp.where(accept, kmax, best_key),
        jnp.where(accept, omax, best_ord),
        jnp.where(accept, base + k + ridx, best_cand),
    )


_ZB_SENTINEL = 1 << 20  # > any depth bucket (buckets are < 2^16)


def _coverage_loop_earlyz(scratch, px, py, chunk_idx, base, count, carry,
                          nov_chunks, zsh: int):
    """Early-z coverage scan. Chunks past the overflow prefix hold
    candidates in DESCENDING conservative-depth-bucket order
    (bin_pairs zorder), so once every pixel's winner key is at or above
    the remaining candidates' bucket upper bound the loop BREAKS: a
    remaining row's masked key is strictly below every winner and can
    neither beat nor tie it (ties go through the explicit draw-order
    carry, which only engages at EQUAL keys). ``zsh`` must match the
    sort's bucket shift (sort_pallas.zbucket)."""
    nc = lax.div(count + (CHUNK - 1), CHUNK)
    row_iota = chunk_idx[:, :1]  # (CHUNK, 1)

    def cond(state):
        c, _ = state
        return c < nc

    def body(state):
        c, carry = state
        k = c * CHUNK
        blk = scratch[pl.ds(base + k, CHUNK), :]
        carry = _chunk_test_ord(blk, px, py, chunk_idx, k, base, count,
                                carry)
        # Remaining-work bound: the chunk's min LIVE bucket upper-bounds
        # every later candidate's depth (descending order).
        live_col = (k + row_iota) < count
        bucket = pltpu.bitcast(blk[:, _ZUB][:, None], jnp.int32) >> zsh
        bmin = jnp.min(jnp.where(live_col, bucket,
                                 jnp.int32(_ZB_SENTINEL)))
        minbest = jnp.min(carry[0])
        # Only CANDIDATE chunks (past the unsorted overflow prefix) may
        # bound the remaining work. One extra bucket of slack (+2, not
        # +1): per-pixel f32 plane evaluation can overshoot the corner
        # max zub by ulps, so a zero-slack break at a bucket boundary
        # could skip a candidate that ties the winner; the slack costs
        # at most one extra chunk scan per tile.
        done = ((c >= nov_chunks) & (bmin < _ZB_SENTINEL)
                & (((bmin + 2) << zsh) <= minbest))
        return (jnp.where(done, nc, c + 1), carry)

    _, carry = lax.while_loop(cond, body, (jnp.int32(0), carry))
    return carry


def _resolve_winner(scratch, best_cand, rows, npx):
    """One-hot MXU resolve: broadcast the winning candidate's full record
    row to every pixel. The one-hot select must be f32-exact, but the
    default f32 matmul truncates inputs to bf16 — splitting the table into
    three bf16-exact parts (8 mantissa bits each) and summing the three
    default-precision products is exact for a 0/1 RHS and measured ~2x
    cheaper than precision=HIGHEST. Only the _USED=59 record channels are
    resolved (lane-sliced to 64): the padding columns are zeros, and
    halving the matmul N dim halves the resolve FLOPs — the dominant term
    of the kernel's MXU cost at production capacities. (A stacked-K
    single-dot variant — parts concatenated on K, one-hot replicated via
    iota-mod-rows — measured 0.39 ms WORSE on the headline frame: the
    (3R, NPX) one-hot build costs more VPU than the two extra dots.)
    Returns (64, NPX): row j = resolved record channel j (j < 64)."""
    # Both operands as TRUE bf16 arrays (halves the one-hot's VMEM
    # footprint; native-rate dots). Still exact: each split part is
    # bf16-valued by construction, the one-hot is 0/1, and accumulation
    # stays f32.
    oh = (
        lax.broadcasted_iota(jnp.int32, (rows, npx), 0) == best_cand
    ).astype(jnp.bfloat16)
    t = scratch[:, :64]
    hi = t.astype(jnp.bfloat16)
    rem = t - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(part):
        return lax.dot_general(
            part, oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return dot(hi) + dot(mid) + dot(lo)


def _fused_kernel(
    # scalar prefetch (all tile-indexed; ids maps tile slot → screen tile,
    # identity for the full pass-0 grid, a compacted live list for dense
    # extra passes)
    ids_ref, starts_ref, counts_ref, nbig_ref,
    # inputs
    ov_ref,  # (OC, 128) f32 overflow records, VMEM
    tab_ref,  # (P_pad, 128) f32 sorted pair records, HBM (manual DMA)
    init_ref,  # (G, th, tw) int32 initial depth keys, or None
    # outputs: zkey (G, th, tw) int32 + one (G, th, tw) f32 per _OUT_FIELDS
    # entry, then scratch (2, G, OC+MAXC, 128) f32 and a (2, G) DMA
    # semaphore. In-kernel math runs planar — (CHUNK, NPX) for the
    # candidate loop (full 8-sublane occupancy), (1, NPX) rows for the
    # resolve — and each output write reshapes once to the (th, tw) block.
    #
    # Each grid step processes ``group`` tiles: the ~0.9 µs fixed
    # per-step cost (tools/exp_stepcost.py) dominated a mostly-empty
    # 1024-step pass-0 grid, so batching amortizes it ~group-fold while
    # per-tile compute (count-bounded coverage loop, resolve matmul) is
    # unchanged.
    *refs,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    oc: int,
    maxc: int,
    skip_empty: bool,
    group: int,
    merged: bool = False,
    out_fields: tuple = _OUT_FIELDS,
    earlyz: bool = False,
    zsh: int = 0,
):
    if earlyz:
        # Extra input: (G, th, tw) f32 winner-ord chain plane; extra
        # output: the winner's draw-order carry (multipass chaining).
        oinit_ref = refs[0]
        zkey_out = refs[1]
        okey_out = refs[2]
        outs = dict(zip(out_fields, refs[3: 3 + len(out_fields)]))
        slabs, sem = refs[3 + len(out_fields):]
    else:
        zkey_out = refs[0]
        outs = dict(zip(out_fields, refs[1: 1 + len(out_fields)]))
        slabs, sem = refs[1 + len(out_fields):]
    npx = tile_h * tile_w

    i = pl.program_id(0)
    nb = nbig_ref[0]
    n_steps = pl.num_programs(0)
    slot = lax.rem(i, 2)

    def tile_dma(step, j, s):
        return pltpu.make_async_copy(
            tab_ref.at[pl.ds(starts_ref[step * group + j], maxc), :],
            slabs.at[s, j, pl.ds(oc, maxc), :],
            sem.at[s, j],
        )

    # Double-buffered record fetch: this step's DMAs were started by the
    # previous grid step; kick off the next step's before computing.
    @pl.when(i == 0)
    def _():
        for j in range(group):
            slabs[0, j, 0:oc, :] = ov_ref[:]  # overflow prefix, copied once
            slabs[1, j, 0:oc, :] = ov_ref[:]
            tile_dma(0, j, 0).start()

    @pl.when(i + 1 < n_steps)
    def _():
        for j in range(group):
            tile_dma(i + 1, j, 1 - slot).start()

    pix = lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    chunk_idx = lax.broadcasted_iota(jnp.int32, (CHUNK, npx), 0)

    # Per-tile addressing + carries. The coverage scan runs over
    # [oc − ceil8(nb), oc + cnt): a dynamic fori_loop costs µs-scale
    # fixed overhead, and the split overflow/candidate formulation paid
    # it twice per tile. The driver tail-aligns the overflow records
    # inside the oc prefix (live rows end exactly at row oc), so the
    # merged scan touches only ceil8(nb) overflow chunks then the
    # candidates, contiguously. The ≤7 alignment rows below nb and any
    # rows past cnt are zero records (wn > 0 fails — can never cover);
    # candidate indices are scratch rows in both segments, rows per
    # chunk stay 8-aligned, and overflow still tests first, so
    # keys/tie-breaks are bit-identical to the split loops. Extra
    # dense passes (nb == 0) start at oc and pay nothing.
    nb_al = lax.div(nb + (CHUNK - 1), CHUNK) * CHUNK
    base = oc - nb_al
    cnts, pxs, pys, carries = [], [], [], []
    for j in range(group):
        cnt = counts_ref[i * group + j]
        tid = ids_ref[i * group + j]
        row = tid // tiles_x
        col = lax.rem(tid, tiles_x)
        pxs.append((pix % tile_w + col * tile_w).astype(jnp.float32) + 0.5)
        pys.append((pix // tile_w + row * tile_h).astype(jnp.float32)
                   + 0.5)
        cnts.append(nb_al + cnt)
        # The driver always materializes an init plane (zeros = clear).
        init_key = init_ref[j].reshape(1, npx) & _LOW3
        if earlyz:
            carries.append((init_key, oinit_ref[j].reshape(1, npx),
                            jnp.full((1, npx), -1, jnp.int32)))
        else:
            carries.append((init_key, jnp.full((1, npx), -1, jnp.int32)))

    if merged and group > 1:
        # ONE fori_loop for the whole group: iteration c tests chunk c
        # of every tile (chunks past a tile's count are dead via
        # _chunk_test's `live` mask — same keys, same tie-breaks, so
        # results stay bit-identical to the per-tile loops). Saves
        # (group − 1) dynamic-loop setups per step; the dead-chunk work
        # it adds is bounded by the group's count spread, which the
        # driver's chunk-class slot sort keeps small. (With earlyz the
        # dual-key test runs, but the group loop has no break —
        # autotune.derive_settings therefore never derives
        # merged_coverage=True when early_z is on; the combination is
        # legal-but-unoptimized if pinned by hand.)
        for j in range(group):
            tile_dma(i, j, slot).wait()
        cmax = cnts[0]
        for c in cnts[1:]:
            cmax = jnp.maximum(cmax, c)

        test = _chunk_test_ord if earlyz else _chunk_test

        def gbody(c, carry):
            k = c * CHUNK
            out = []
            for j in range(group):
                blk = slabs[slot, j, pl.ds(base + k, CHUNK), :]
                out.append(test(blk, pxs[j], pys[j], chunk_idx,
                                k, base, cnts[j], carry[j]))
            return tuple(out)

        carries = lax.fori_loop(
            0, lax.div(cmax + (CHUNK - 1), CHUNK), gbody,
            tuple(carries), unroll=False,
        )

    for j in range(group):
        scratch = slabs.at[slot, j]
        px, py = pxs[j], pys[j]
        best_ord = None
        if merged and group > 1:
            if earlyz:
                best_key, best_ord, best_cand = carries[j]
            else:
                best_key, best_cand = carries[j]
        elif earlyz:
            tile_dma(i, j, slot).wait()
            best_key, best_ord, best_cand = _coverage_loop_earlyz(
                scratch, px, py, chunk_idx, base, cnts[j], carries[j],
                lax.div(nb_al, CHUNK), zsh,
            )
        else:
            tile_dma(i, j, slot).wait()
            best_key, best_cand = _coverage_loop(
                scratch, px, py, chunk_idx, base, cnts[j], carries[j]
            )

        zkey_out[j] = best_key.reshape(tile_h, tile_w)
        if earlyz:
            okey_out[j] = best_ord.reshape(tile_h, tile_w)

        def resolve(scratch=scratch, best_cand=best_cand, px=px, py=py,
                    j=j):
            planes = _resolve_field_planes(
                scratch, best_cand, oc + maxc, px, py, out_fields
            )
            for name in out_fields:
                outs[name][j] = planes[name].reshape(tile_h, tile_w)

        def write_empty(j=j):
            for name in out_fields:
                outs[name][j] = jnp.zeros((tile_h, tile_w), jnp.float32)

        if skip_empty:
            # Overlay passes: most tiles have no coverage — skip the
            # matmul.
            any_hit = jnp.any(best_cand >= 0)

            @pl.when(any_hit)
            def _():
                resolve()

            @pl.when(jnp.logical_not(any_hit))
            def _():
                write_empty()
        else:
            resolve()


def _resolve_field_planes(scratch, best_cand, rows, px, py, out_fields):
    """Resolve winner records for one tile's pixels and compute the
    requested output field planes ((1, NPX) each). Shared by the kernel
    variants whose resolve runs over the full coarse-tile pixel row."""
    npx = px.shape[1]
    recT = _resolve_winner(scratch, best_cand, rows, npx)

    def r(k):
        return recT[k : k + 1, :]  # (1, NPX)

    idf = r(_ID)
    hit = idf >= 0.5
    e0 = r(_A + 0) * px + r(_B + 0) * py + r(_C + 0)
    e1 = r(_A + 1) * px + r(_B + 1) * py + r(_C + 1)
    e2 = r(_A + 2) * px + r(_B + 2) * py + r(_C + 2)
    esum = e0 + e1 + e2
    inv = pl.reciprocal(jnp.where(esum == 0.0, 1.0, esum), approx=False)
    b0 = jnp.where(hit, e0 * inv, 0.0)
    b1 = jnp.where(hit, e1 * inv, 0.0)
    b2 = jnp.where(hit, e2 * inv, 0.0)

    def depth_val():
        zn = r(_ZC) * px + r(_ZC + 1) * py + r(_ZC + 2)
        wn = r(_WC) * px + r(_WC + 1) * py + r(_WC + 2)
        return jnp.where(
            hit,
            zn * pl.reciprocal(jnp.where(wn == 0.0, 1.0, wn),
                               approx=False),
            0.0,
        )

    def blend(base):
        return r(base) * b0 + r(base + 1) * b1 + r(base + 2) * b2

    return {
        name: _FIELD_VALS[name](depth_val, blend, r, idf, b0, b1)
        for name in out_fields
    }


def _fused_kernel_fine(
    # scalar prefetch: tile slot → screen tile / candidate-window start;
    # per-SUBTILE window-local base (8-aligned) and count; n_big
    ids_ref, starts_ref, lb_ref, cnt_ref, nbig_ref,
    # inputs
    ov_ref,  # (OC, 128) f32 overflow records, VMEM
    tab_ref,  # (P_pad, 128) f32 sorted pair records, HBM (manual DMA)
    init_ref,  # (G, th, tw) int32 initial depth keys
    *refs,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    oc: int,
    maxc: int,
    skip_empty: bool,
    group: int,
    nsub: int,
    out_fields: tuple = _OUT_FIELDS,
):
    """FINE-SUBTILE variant of :func:`_fused_kernel` (pass 0 of
    small-triangle-dominated scenes, e.g. dense instancing).

    The per-tile kernel tests every candidate chunk against all
    tile_h×tile_w pixels, but when most binned pairs come from triangles
    smaller than a (tile_w/nsub)×tile_h SUBTILE (config 4: 95% of pairs
    are sub-16×8 px, tools/exp_trisize.py), ~7/8 of that coverage math is
    provably dead. Here the pair list is binned at subtile granularity
    (one coarse tile = ``nsub`` consecutive fine bins, so the coarse
    candidate window stays ONE contiguous DMA) and the coverage loop
    tests each subtile's own candidates against only its 128 pixels:
    per-iteration work is nsub × (CHUNK, 128) = the same vector volume as
    one (CHUNK, npx) chunk, but it consumes nsub chunks of candidates.

    Exactness: subtile bases align down to CHUNK, so up to 7 prefix rows
    from the previous subtile are retested — a triangle covering pixels
    of subtile g always has its own pair in g (coverage ⊆ bbox), which
    sits at a later loop position and wins the duplicate tie, so keys and
    draw-order tie-breaks match the coarse kernel. The overflow prefix is
    tested per-subtile inside the same single fori_loop (segment select
    on scalars), keeping the one-loop-per-tile structure.

    Layout: all tile blocks (init, zkey, fields) are in FINE order — row
    g holds subtile g's 128 pixels (y·sub_w + xl) — so every in-kernel
    access is a native sublane slice/concat; the driver permutes blocks
    to/from screen order on the XLA side (a (k,8,8,16) transpose,
    ~µs-scale) instead of paying Mosaic lane/sublane relayouts per
    tile."""
    zkey_out = refs[0]
    outs = dict(zip(out_fields, refs[1 : 1 + len(out_fields)]))
    slabs, sem = refs[1 + len(out_fields) :]
    npx = tile_h * tile_w
    sub_w = tile_w // nsub
    spx = tile_h * sub_w  # 128: one VPU row of pixels per subtile

    i = pl.program_id(0)
    nb = nbig_ref[0]
    n_steps = pl.num_programs(0)
    slot = lax.rem(i, 2)

    def tile_dma(step, j, s):
        return pltpu.make_async_copy(
            tab_ref.at[pl.ds(starts_ref[step * group + j], maxc), :],
            slabs.at[s, j, pl.ds(oc, maxc), :],
            sem.at[s, j],
        )

    @pl.when(i == 0)
    def _():
        for j in range(group):
            slabs[0, j, 0:oc, :] = ov_ref[:]  # overflow prefix, copied once
            slabs[1, j, 0:oc, :] = ov_ref[:]
            tile_dma(0, j, 0).start()

    @pl.when(i + 1 < n_steps)
    def _():
        for j in range(group):
            tile_dma(i + 1, j, 1 - slot).start()

    lane = lax.broadcasted_iota(jnp.int32, (1, spx), 1)
    chunk_idx = lax.broadcasted_iota(jnp.int32, (CHUNK, spx), 0)
    pix = lax.broadcasted_iota(jnp.int32, (1, npx), 1)

    nb_al = lax.div(nb + (CHUNK - 1), CHUNK) * CHUNK
    nov = lax.div(nb_al, CHUNK)  # overflow chunks (shared by all subtiles)
    ov_base = oc - nb_al

    for j in range(group):
        scratch = slabs.at[slot, j]
        tid = ids_ref[i * group + j]
        row = tid // tiles_x
        col = lax.rem(tid, tiles_x)
        init_c = init_ref[j]  # (nsub, spx) fine-ordered (driver permutes)
        tile_dma(i, j, slot).wait()

        pxs, pys, carries, bases, cnts = [], [], [], [], []
        for g in range(nsub):
            px = (lane % sub_w + col * tile_w
                  + g * sub_w).astype(jnp.float32) + 0.5
            py = (lane // sub_w + row * tile_h).astype(jnp.float32) + 0.5
            ik = init_c[g : g + 1, :]  # (1, spx) sublane slice
            carries.append((ik & _LOW3,
                            jnp.full((1, spx), -1, jnp.int32)))
            pxs.append(px)
            pys.append(py)
            bases.append(oc + lb_ref[(i * group + j) * nsub + g])
            cnts.append(cnt_ref[(i * group + j) * nsub + g])

        max_cnt = cnts[0]
        for g in range(1, nsub):
            max_cnt = jnp.maximum(max_cnt, cnts[g])
        ncand = lax.div(max_cnt + (CHUNK - 1), CHUNK)

        def body(c, carries, bases=bases, cnts=cnts, pxs=pxs, pys=pys):
            in_ov = c < nov
            k_ov = c * CHUNK
            k_cd = (c - nov) * CHUNK
            new = []
            for g in range(nsub):
                base = jnp.where(in_ov, ov_base, bases[g])
                k = jnp.where(in_ov, k_ov, k_cd)
                count = jnp.where(in_ov, nb_al, cnts[g])
                # The loop runs to the group's max chunk count; clamp the
                # slab slice for exhausted subtiles (their rows are dead
                # via the `live` mask in _chunk_test, so the clamped
                # reread is never accepted).
                off = jnp.minimum(base + k, oc + maxc - CHUNK)
                blk = scratch[pl.ds(off, CHUNK), :]
                new.append(
                    _chunk_test(blk, pxs[g], pys[g], chunk_idx, k, base,
                                count, carries[g])
                )
            return tuple(new)

        carries = lax.fori_loop(0, nov + ncand, body, tuple(carries),
                                unroll=False)

        # Outputs stay fine-ordered: row g = subtile g (sublane concat of
        # the (1, spx) carries); the driver transposes back to screen
        # order. The resolve runs once over all npx fine-ordered pixels.
        zkey_out[j] = jnp.concatenate(
            [carries[g][0] for g in range(nsub)], axis=0
        )
        # Sublane concat + row fold (the same reshape class the coarse
        # kernel uses for init_ref): a lane-dim concat of (1, 128) rows
        # at different sublane offsets is not a Mosaic-supported op.
        cand_all = jnp.concatenate(
            [carries[g][1] for g in range(nsub)], axis=0
        ).reshape(1, npx)  # fine-ordered

        gl = pix // spx  # subtile index of each fine-ordered position
        ll = pix % spx
        pxf = (ll % sub_w + gl * sub_w
               + col * tile_w).astype(jnp.float32) + 0.5
        pyf = (ll // sub_w + row * tile_h).astype(jnp.float32) + 0.5

        def resolve(scratch=scratch, cand_all=cand_all, pxf=pxf, pyf=pyf,
                    j=j):
            planes = _resolve_field_planes(scratch, cand_all, oc + maxc,
                                           pxf, pyf, out_fields)
            for name in out_fields:
                outs[name][j] = planes[name].reshape(tile_h, tile_w)

        def write_empty(j=j):
            for name in out_fields:
                outs[name][j] = jnp.zeros((tile_h, tile_w), jnp.float32)

        if skip_empty:
            any_hit = jnp.any(cand_all >= 0)

            @pl.when(any_hit)
            def _():
                resolve()

            @pl.when(jnp.logical_not(any_hit))
            def _():
                write_empty()
        else:
            resolve()


def _fused_kernel_gw(
    # scalar prefetch: tile slot → screen tile / window-local candidate
    # base (8-aligned) / effective count; per-step window start row; n_big
    ids_ref, lbase_ref, counts_ref, nbig_ref, win_ref,
    # inputs
    ov_ref,  # (OC, 128) f32 overflow records, VMEM
    tab_ref,  # (P_pad, 128) f32 sorted pair records, HBM (manual DMA)
    init_ref,  # (G, th, tw) int32 initial depth keys
    *refs,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    oc: int,
    gcap: int,
    skip_empty: bool,
    group: int,
    out_fields: tuple = _OUT_FIELDS,
):
    """GROUP-WINDOW variant of :func:`_fused_kernel` (single-pass configs).

    The per-tile kernel issues 3 resolve dots and a record DMA per tile —
    at group=8 that is 24 small matmuls per grid step, and their ~0.4 µs
    fixed cost dominates the step (tools exp_resolve: removing two of the
    three split dots saved 0.4 ms over 128 steps). The sorted pair list
    is contiguous in compact-id order, so the whole group's candidates
    are ONE window: one DMA per step into a shared scratch, each tile
    covering its own (8-aligned) subrange, and ONE 3-dot resolve over the
    group's concatenated pixels (K = oc+gcap ≈ the group's actual pair
    sum, not group × max_candidates). Attribute blends also run once on
    (1, group·NPX) planes. Alignment prefix rows belong to the previous
    tile: testing them is exact-noop (coverage ⊆ bbox → no pixel of this
    tile), and duplicated pairs resolve to identical records."""
    zkey_out = refs[0]
    outs = dict(zip(out_fields, refs[1 : 1 + len(out_fields)]))
    slabs, sem = refs[1 + len(out_fields) :]
    npx = tile_h * tile_w

    i = pl.program_id(0)
    nb = nbig_ref[0]
    n_steps = pl.num_programs(0)
    slot = lax.rem(i, 2)

    def win_dma(step, s):
        return pltpu.make_async_copy(
            tab_ref.at[pl.ds(win_ref[step], gcap), :],
            slabs.at[s, pl.ds(oc, gcap), :],
            sem.at[s],
        )

    @pl.when(i == 0)
    def _():
        slabs[0, 0:oc, :] = ov_ref[:]
        slabs[1, 0:oc, :] = ov_ref[:]
        win_dma(0, 0).start()

    @pl.when(i + 1 < n_steps)
    def _():
        win_dma(i + 1, 1 - slot).start()

    scratch = slabs.at[slot]
    pix = lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    chunk_idx = lax.broadcasted_iota(jnp.int32, (CHUNK, npx), 0)

    pxs, pys, carries = [], [], []
    for j in range(group):
        tid = ids_ref[i * group + j]
        row = tid // tiles_x
        col = lax.rem(tid, tiles_x)
        px = (pix % tile_w + col * tile_w).astype(jnp.float32) + 0.5
        py = (pix // tile_w + row * tile_h).astype(jnp.float32) + 0.5
        pxs.append(px)
        pys.append(py)
        init_key = init_ref[j].reshape(1, npx) & _LOW3
        carries.append((init_key, jnp.full((1, npx), -1, jnp.int32)))

    # ONE overflow loop for the whole group (the prefix rows are shared,
    # so each chunk is read once) — a dynamic fori_loop costs µs-scale
    # fixed overhead, and the per-tile formulation paid it 16× per step.
    # The driver tail-aligns the live overflow rows to end at row oc
    # (see raster_fused_pallas), so the scan starts at oc − ceil8(nb).
    nb_al = lax.div(nb + (CHUNK - 1), CHUNK) * CHUNK
    ov_base = oc - nb_al

    def ov_body(c, carries):
        k = c * CHUNK
        blk = scratch[pl.ds(ov_base + k, CHUNK), :]
        return tuple(
            _chunk_test(blk, pxs[j], pys[j], chunk_idx, k, ov_base, nb,
                        carries[j])
            for j in range(group)
        )

    carries = lax.fori_loop(
        0, lax.div(nb + (CHUNK - 1), CHUNK), ov_body, tuple(carries),
        unroll=False,
    )
    win_dma(i, slot).wait()

    # ONE candidate loop for the whole group, bound by the group's max
    # count; exhausted tiles mask dead rows via their own live predicate.
    bases = [oc + lbase_ref[i * group + j] for j in range(group)]
    cnts = [counts_ref[i * group + j] for j in range(group)]
    max_cnt = cnts[0]
    for j in range(1, group):
        max_cnt = jnp.maximum(max_cnt, cnts[j])

    def cand_body(c, carries):
        k = c * CHUNK
        new = []
        for j in range(group):
            blk = scratch[pl.ds(bases[j] + k, CHUNK), :]
            new.append(
                _chunk_test(blk, pxs[j], pys[j], chunk_idx, k, bases[j],
                            cnts[j], carries[j])
            )
        return tuple(new)

    carries = lax.fori_loop(
        0, lax.div(max_cnt + (CHUNK - 1), CHUNK), cand_body,
        tuple(carries), unroll=False,
    )

    cands = []
    for j in range(group):
        best_key, best_cand = carries[j]
        zkey_out[j] = best_key.reshape(tile_h, tile_w)
        cands.append(best_cand)

    px_all = jnp.concatenate(pxs, axis=1)  # (1, group·npx)
    py_all = jnp.concatenate(pys, axis=1)
    cand_all = jnp.concatenate(cands, axis=1)

    def resolve():
        recT = _resolve_winner(scratch, cand_all, oc + gcap, group * npx)

        def r(k):
            return recT[k : k + 1, :]  # (1, group·npx)

        idf = r(_ID)
        hit = idf >= 0.5
        e0 = r(_A + 0) * px_all + r(_B + 0) * py_all + r(_C + 0)
        e1 = r(_A + 1) * px_all + r(_B + 1) * py_all + r(_C + 1)
        e2 = r(_A + 2) * px_all + r(_B + 2) * py_all + r(_C + 2)
        esum = e0 + e1 + e2
        inv = pl.reciprocal(jnp.where(esum == 0.0, 1.0, esum),
                            approx=False)
        b0 = jnp.where(hit, e0 * inv, 0.0)
        b1 = jnp.where(hit, e1 * inv, 0.0)
        b2 = jnp.where(hit, e2 * inv, 0.0)

        def depth_val():
            zn = r(_ZC) * px_all + r(_ZC + 1) * py_all + r(_ZC + 2)
            wn = r(_WC) * px_all + r(_WC + 1) * py_all + r(_WC + 2)
            return jnp.where(
                hit,
                zn * pl.reciprocal(jnp.where(wn == 0.0, 1.0, wn),
                                   approx=False),
                0.0,
            )

        def blend(base):
            return r(base) * b0 + r(base + 1) * b1 + r(base + 2) * b2

        for name in out_fields:
            v = _FIELD_VALS[name](depth_val, blend, r, idf, b0, b1)
            for j in range(group):
                outs[name][j] = v[:, j * npx : (j + 1) * npx].reshape(
                    tile_h, tile_w
                )

    def write_empty():
        for name in out_fields:
            for j in range(group):
                outs[name][j] = jnp.zeros((tile_h, tile_w), jnp.float32)

    if skip_empty:
        any_hit = jnp.any(cand_all >= 0)

        @pl.when(any_hit)
        def _():
            resolve()

        @pl.when(jnp.logical_not(any_hit))
        def _():
            write_empty()
    else:
        resolve()


def _pixels_from_fields(f: dict) -> FusedPixels:
    # Pruned fields (drop_fields) come back as miss-valued zeros.
    zero = jnp.zeros_like(f["idf"])
    f = {name: f.get(name, zero) for name in _OUT_FIELDS}
    hit = f["idf"] >= 0.5
    b0, b1 = f["b0"], f["b1"]
    return FusedPixels(
        tri_id=jnp.round(f["idf"]).astype(jnp.int32) - 1,
        depth=f["depth"],
        bary=(b0, b1, jnp.where(hit, 1.0 - b0 - b1, 0.0)),
        uv=(f["u"], f["v"]),
        normal=(f["nx"], f["ny"], f["nz"]),
        tangent=(f["tx"], f["ty"], f["tz"]),
        world=(f["wx"], f["wy"], f["wz"]),
        color=(f["cr"], f["cg"], f["cb"]),
        mat_id=jnp.round(f["matf"]).astype(jnp.int32),
    )


def raster_fused_pallas(
    rec_table: jnp.ndarray,  # (T, 128) f32
    setup: TriangleSetup,
    width: int,
    height: int,
    tile_h: int = 8,
    tile_w: int = 128,
    max_candidates: int = 320,
    overflow_cap: int = 64,
    span_cap: int = 16,
    init_zkey: jnp.ndarray | None = None,  # (NT, NPX) int32
    skip_empty: bool = True,
    interpret: bool = False,
    pair_budget: int = 262144,
    passes: int = 1,
    dense_tile_cap: int | None = None,  # compact-grid size for passes ≥ 1
    raster_tile_cap: int | None = None,  # compact-grid size for pass 0
    span_mid_cap: int | None = None,  # span-class binning (bin_pairs)
    group_pair_cap: int | None = None,  # group-window kernel (pass 0,
    # single-pass configs): static row budget for one tile-group's
    # contiguous candidate window — a validated capacity (window overflow
    # counts into dropped_cap). None = per-tile-window kernel.
    drop_fields: tuple = (),  # static output pruning: FusedPixels fields
    # the caller never reads (their planes come back as zeros); saves the
    # kernel's blend math and output DMA for those planes.
    fine_bins: bool = False,  # bin at (tile_w/8)-wide SUBTILE granularity
    # and run pass 0 with the fine-subtile kernel (_fused_kernel_fine):
    # ~8x less dead coverage math when most triangles are subtile-sized
    # (dense instancing). Extra passes and the overflow list are
    # unchanged; mutually exclusive with group_pair_cap (fine wins).
    merged_coverage: bool = False,  # ONE coverage fori_loop per tile
    # group (trip count = group max; dead chunks masked — bit-identical)
    # + chunk-class-sorted compact slots. Wins on multi-pass fat-window
    # configs (x64: −0.37 ms), loses on the single-pass thin-tile
    # headline — autotune derives it from raster_passes
    # (tools/exp_merged.py).
    earlyz: bool = False,  # early-z coverage: per-tile candidates sort
    # by DESCENDING conservative depth bucket (setup.zub) and the
    # coverage loop BREAKS once every pixel's winner provably beats all
    # remaining candidates. Bit-identical results: the winner is the
    # lexicographic argmax of (masked key, triangle id), with the
    # draw-order carry chained across passes — which also closes the
    # big/small-split and multipass tie knife-edges (docstring below).
):
    """Rasterize + resolve + interpolate with the Pallas TPU kernel.

    Returns (pixels: FusedPixels, zkey (NT, NPX) int32, diag: BinDiag).
    ``init_zkey`` continues over an existing depth buffer (the analog of a
    later subpass drawing depth-tested against the same depth attachment,
    main.cpp:128-171).

    Known knife-edge vs the reference's pure draw-order rule: overflow
    ("big") triangles are depth-tested before a tile's binned candidates
    on BOTH backends, so an exact depth tie between a big triangle drawn
    later and a small one drawn earlier resolves to the small one (the
    reference, with no big/small split, would pick the later draw). This
    requires a bit-exact z tie across the split — unobserved in practice,
    and the CONSTRUCTED coplanar cross-split tie measures reference-true
    in both draw orders on both schedules (tests/test_fused.py::
    TestEarlyZ::test_constructed_big_small_tie_both_orders_both_paths);
    ``earlyz`` additionally carries an explicit draw-order tie key, so
    it is reference-true by construction, not just by measurement.

    A second knife-edge exists for ``fine_bins`` with ``passes`` > 1: the
    dense extra passes run the COARSE kernel over the fine-ordered
    candidate window and test every row against all tile pixels, so a
    lower-draw triangle whose duplicate pair sits in a later fine bin
    occupies a later window position and wins the >= tie against the
    correct pass-0 winner when their depths are bit-equal. Pass 0 itself
    and coarse multipass are exact (coarse binning orders each window by
    draw order). Like the big/small split above, this needs a bit-exact
    z tie between two different triangles overlapping the same pixel —
    unobserved in practice and absent from all golden configs.

    ``passes`` > 1 handles tiles denser than ``max_candidates`` without
    inflating the one-hot resolve: pass p covers candidate window
    [p·maxc, (p+1)·maxc), depth-chained via the previous pass's keys.
    GREATER_OR_EQUAL acceptance keeps draw order across windows, and
    skip_empty makes extra passes nearly free for the tiles that are
    already exhausted."""
    assert tile_h % 8 == 0 and tile_w % 128 == 0, "VPU-aligned tiles required"
    maxc = ((max_candidates + CHUNK - 1) // CHUNK) * CHUNK
    oc = ((overflow_cap + CHUNK - 1) // CHUNK) * CHUNK
    npx = tile_h * tile_w

    # Group-window path decided up front (static): early-z is mutually
    # exclusive with it and with fine_bins (those kernels keep their own
    # schedules), and needs a setup that carries zub.
    nt_static = (-(-width // tile_w)) * (-(-height // tile_h))
    use_gw = (group_pair_cap is not None and passes == 1
              and raster_tile_cap is not None
              and raster_tile_cap <= nt_static and not fine_bins)
    earlyz = (earlyz and not fine_bins and not use_gw
              and getattr(setup, "zub", None) is not None)
    nsub = NSUB_FINE if fine_bins else 1
    if fine_bins:
        # The fine kernel's layout equates row g of the driver-permuted
        # (tile_h, tile_w) block with subtile g, which holds only when
        # tile_h == NSUB_FINE (i.e. tile_h * sub_w == tile_w). Any other
        # VPU-legal shape would fail deep in tracing with an opaque
        # carry-shape error — reject it here instead.
        assert tile_h == NSUB_FINE and tile_h * (tile_w // NSUB_FINE) == (
            tile_w
        ), f"fine_bins requires tile_h == {NSUB_FINE} (got {tile_h})"
        # Fine binning: nsub consecutive fine bins per coarse tile (the
        # fine tile id linearization ty·(tiles_x·nsub)+txf groups them),
        # so each coarse tile's candidate window stays ONE contiguous
        # run of the sorted pair list. Binning must see the PADDED width
        # (tiles_x·tile_w) so fine columns fold exactly nsub-per-coarse.
        tiles_x = -(-width // tile_w)
        sorted_tri, starts_f, counts_f, big_ids, n_big, diag, tiles_y, _ = (
            bin_pairs(setup, tiles_x * tile_w, height, tile_h,
                      tile_w // nsub, span_cap, oc, maxc * passes,
                      pair_budget=pair_budget, span_mid_cap=span_mid_cap)
        )
        nt = tiles_y * tiles_x
        starts_m = starts_f.reshape(nt, nsub)  # (NT, nsub)
        counts_m = counts_f.reshape(nt, nsub)
        starts = starts_m[:, 0]
        counts_raw_c = jnp.sum(counts_m, axis=1)
        counts = jnp.minimum(counts_raw_c, maxc * passes)
        diag = diag._replace(
            dropped_cap=diag.dropped_cap
            + jnp.sum(jnp.maximum(counts_raw_c - maxc * passes, 0))
        )
        lb_raw = starts_m - starts[:, None]  # window-local subtile bases
    else:
        sorted_tri, starts, counts, big_ids, n_big, diag, tiles_y, tiles_x = (
            bin_pairs(setup, width, height, tile_h, tile_w, span_cap, oc,
                      maxc * passes, pair_budget=pair_budget,
                      span_mid_cap=span_mid_cap, zorder=earlyz)
        )
        nt = tiles_y * tiles_x

    # Gather pair records once, pad so any DMA window of any pass stays in
    # bounds.
    # Group-window kernel only on the COMPACTED pass-0 grid: its static
    # window budget is probed over 8-aligned groups of the compact
    # live-tile list; raw full-grid order would group differently and
    # could exceed the probed bound on the probed frame itself.
    assert nt == nt_static
    gcap = 0
    if use_gw:
        gcap = ((group_pair_cap + CHUNK - 1) // CHUNK) * CHUNK
    pair_rec = rec_table[sorted_tri]
    pair_rec = jnp.concatenate(
        [pair_rec,
         jnp.zeros((max(maxc * passes, gcap), REC_CH), jnp.float32)],
        axis=0,
    )
    ov = rec_table[jnp.maximum(big_ids, 0)] * (
        big_ids >= 0
    ).astype(jnp.float32)[:, None]
    # Tail-align the live overflow rows inside the oc prefix (live rows
    # end exactly at row oc): both kernels run their overflow scan from
    # oc − ceil8(n_big), so the bucketed prefix's dead rows cost nothing.
    # The wrapped rows are zeros (dead by construction); row order — and
    # therefore draw-order tie-breaking — is preserved. _big_cover_mask
    # below keeps big_ids↔row alignment, so it uses the unrolled table.
    nb_al = ((n_big + (CHUNK - 1)) // CHUNK) * CHUNK
    ov_k = jnp.roll(ov, oc - nb_al, axis=0)

    if init_zkey is None:
        init_zkey = jnp.zeros((nt, npx), jnp.int32)
    if dense_tile_cap is None:
        dense_tile_cap = min(nt, max(64, nt // 4))

    out_fields = tuple(
        f for f in _OUT_FIELDS if f not in drop_fields or f == "idf"
    )
    n_out = (2 if earlyz else 1) + len(out_fields)
    if earlyz:
        from bibim_tpu.ops.sort_pallas import zorder_bits

        zb = zorder_bits(nt, int(setup.valid.shape[0]))
        zsh = 30 - (zb if zb > 0 else 16)
    else:
        zsh = 0

    def make_call(k):
        # Largest tile group that divides the grid (compacted caps are
        # multiples of 64 → group 8; a full nt grid may fall back to 1),
        # capped so the double-buffered record slab stays within ~6 MB of
        # scoped VMEM (4K runs 1088 candidate rows: group 8 put the whole
        # kernel 512 KB over the 48 MB scoped limit).
        slab_tile_bytes = 2 * (oc + maxc) * REC_CH * 4
        gmax = max(1, GROUP_SLAB_BYTES // slab_tile_bytes)
        group = next(g for g in GROUP_SIZES if g <= gmax and k % g == 0)
        kernel = functools.partial(
            _fused_kernel,
            tile_h=tile_h,
            tile_w=tile_w,
            tiles_x=tiles_x,
            oc=oc,
            maxc=maxc,
            skip_empty=skip_empty,
            group=group,
            merged=merged_coverage,
            out_fields=out_fields,
            earlyz=earlyz,
            zsh=zsh,
        )
        plane_spec = pl.BlockSpec((group, tile_h, tile_w),
                                  lambda i, *_: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((oc, REC_CH), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            plane_spec,  # initial depth keys (zeros = clear)
        ]
        if earlyz:
            in_specs.append(plane_spec)  # winner-ord chain (f32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(k // group,),
            in_specs=in_specs,
            out_specs=[plane_spec] * n_out,
            scratch_shapes=[
                pltpu.VMEM((2, group, oc + maxc, REC_CH), jnp.float32),
                pltpu.SemaphoreType.DMA((2, group)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((k, tile_h, tile_w), jnp.int32)]
            + [jax.ShapeDtypeStruct((k, tile_h, tile_w), jnp.float32)]
            * (n_out - 1),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                **({"vmem_limit_bytes": GROUP_VMEM_LIMIT}
                   if GROUP_VMEM_LIMIT else {}),
            ),
            interpret=interpret,
        )

    def make_call_gw(k, group):
        kernel = functools.partial(
            _fused_kernel_gw,
            tile_h=tile_h,
            tile_w=tile_w,
            tiles_x=tiles_x,
            oc=oc,
            gcap=gcap,
            skip_empty=skip_empty,
            group=group,
            out_fields=out_fields,
        )
        plane_spec = pl.BlockSpec((group, tile_h, tile_w),
                                  lambda i, *_: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((oc, REC_CH), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            plane_spec,  # initial depth keys (zeros = clear)
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(k // group,),
            in_specs=in_specs,
            out_specs=[plane_spec] * n_out,
            scratch_shapes=[
                pltpu.VMEM((2, oc + gcap, REC_CH), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((k, tile_h, tile_w), jnp.int32)]
            + [jax.ShapeDtypeStruct((k, tile_h, tile_w), jnp.float32)]
            * len(out_fields),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # The group-pixel one-hot ((oc+gcap) × group·NPX f32)
                # exceeds the default 16 MB scope.
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )

    def make_call_fine(k):
        slab_tile_bytes = 2 * (oc + maxc) * REC_CH * 4
        gmax = max(1, GROUP_SLAB_BYTES // slab_tile_bytes)
        group = next(g for g in GROUP_SIZES if g <= gmax and k % g == 0)
        kernel = functools.partial(
            _fused_kernel_fine,
            tile_h=tile_h,
            tile_w=tile_w,
            tiles_x=tiles_x,
            oc=oc,
            maxc=maxc,
            skip_empty=skip_empty,
            group=group,
            nsub=nsub,
            out_fields=out_fields,
        )
        plane_spec = pl.BlockSpec((group, tile_h, tile_w),
                                  lambda i, *_: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((oc, REC_CH), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            plane_spec,  # initial depth keys (zeros = clear)
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(k // group,),
            in_specs=in_specs,
            out_specs=[plane_spec] * n_out,
            scratch_shapes=[
                pltpu.VMEM((2, group, oc + maxc, REC_CH), jnp.float32),
                pltpu.SemaphoreType.DMA((2, group)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((k, tile_h, tile_w), jnp.int32)]
            + [jax.ShapeDtypeStruct((k, tile_h, tile_w), jnp.float32)]
            * len(out_fields),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                **({"vmem_limit_bytes": GROUP_VMEM_LIMIT}
                   if GROUP_VMEM_LIMIT else {}),
            ),
            interpret=interpret,
        )

    fields = None
    zkey = init_zkey
    # Winner draw-order chain (earlyz): −1 = clear/init (any candidate
    # tying the init key wins, matching the GEQ-accept semantics).
    okey = jnp.full((nt, npx), -1.0, jnp.float32) if earlyz else None
    arange_nt = jnp.arange(nt, dtype=jnp.int32)
    dropped_dense = jnp.int32(0)
    dropped_win = jnp.int32(0)
    for p in range(passes):
        # Big (overflow) triangles are tested in pass 0 only.
        nb_p = n_big if p == 0 else jnp.int32(0)
        scatter_ids = None  # pass-0 compaction: drop-mode scatter targets
        if p == 0 and raster_tile_cap is not None and raster_tile_cap <= nt:
            # Pass-0 compaction: only tiles that can have geometry — own
            # candidates or conservative big-triangle cover — get a grid
            # step; the rest keep clear/init values through the
            # scatter-back (a mostly-empty full grid costs ~2.4 µs/step).
            live0 = (counts > 0) | _big_cover_mask(
                ov, big_ids, nt, tiles_x, tile_h, tile_w
            )
            k = raster_tile_cap
            ids, dropped0 = _compact_tile_list(live0, k)
            dropped_dense = dropped_dense + dropped0
            # Dead slots (padding of a worst-frame-sized list) do no work
            # and their writes drop, instead of recomputing the first
            # live tile.
            n_live = jnp.minimum(jnp.sum(live0, dtype=jnp.int32), k)
            slot_live = jnp.arange(k, dtype=jnp.int32) < n_live
            if merged_coverage and not use_gw and not fine_bins:
                # Count-homogeneous kernel groups (merged coverage):
                # slot order is free — outputs scatter back by tile id —
                # so order live slots by descending CHUNK count (the
                # merged loop's actual trip unit; dead slots sink with
                # key 1). Sorting on BOTH keys keeps tile ids ascending
                # within a chunk class: same trip counts, but the
                # zkey/field gathers and scatters stay run-coherent
                # (a 1-key sort's arbitrary tie order cost ~1 ms on
                # config 4 — tools/exp_merged.py).
                ckey = jnp.where(
                    slot_live,
                    -lax.div(jnp.minimum(counts[ids], maxc)
                             + (CHUNK - 1), CHUNK),
                    jnp.int32(1),
                )
                _, ids = lax.sort((ckey, ids), num_keys=2,
                                  is_stable=False)
            scatter_ids = jnp.where(slot_live, ids, nt)
            starts_p = starts[ids]
            counts_p = jnp.where(slot_live, jnp.minimum(counts[ids], maxc),
                                 0)
            zk_in = zkey[ids].reshape(k, tile_h, tile_w)
        elif p == 0:
            k, ids = nt, arange_nt
            starts_p = starts
            counts_p = jnp.minimum(counts, maxc)
            zk_in = zkey.reshape(nt, tile_h, tile_w)
        else:
            # Dense extra passes run on a COMPACT list of the tiles whose
            # candidates exceed the previous windows (a full grid costs
            # ~2-5 ms in per-step overhead even when every tile
            # early-outs). Dead slots do no work (zero counts) and their
            # scatter writes drop below.
            live = counts > p * maxc
            k = dense_tile_cap
            ids, dropped_p = _compact_tile_list(live, k)
            dropped_dense = dropped_dense + dropped_p
            n_live_p = jnp.minimum(jnp.sum(live, dtype=jnp.int32), k)
            slot_live_p = jnp.arange(k, dtype=jnp.int32) < n_live_p
            if merged_coverage and not fine_bins:
                # Same chunk-class ordering as pass 0 (see above).
                ckey = jnp.where(
                    slot_live_p,
                    -lax.div(jnp.clip(counts[ids] - p * maxc, 0, maxc)
                             + (CHUNK - 1), CHUNK),
                    jnp.int32(1),
                )
                _, ids = lax.sort((ckey, ids), num_keys=2,
                                  is_stable=False)
            starts_p = starts[ids] + p * maxc
            counts_p = jnp.where(
                slot_live_p, jnp.clip(counts[ids] - p * maxc, 0, maxc), 0
            )
            zk_in = zkey[ids].reshape(k, tile_h, tile_w)
        if p == 0 and fine_bins:
            # Fine-subtile pass 0: per-slot subtile bases/counts into the
            # coarse window. Subtiles whose base exceeds the pass-0
            # window keep nothing here (dense extra passes pick their
            # rows up from the same fine-ordered list); bases align down
            # to CHUNK — the ≤7 prefix rows retested belong to earlier
            # subtiles and lose duplicate ties exactly (kernel doc).
            lbp = lb_raw[ids]  # (k, nsub)
            cfp = counts_m[ids]
            kept = jnp.clip(maxc - lbp, 0, cfp)
            lb_al = (lbp // CHUNK) * CHUNK
            cntk = jnp.where(kept > 0, kept + (lbp - lb_al), 0)
            if scatter_ids is not None:
                cntk = cntk * slot_live[:, None].astype(jnp.int32)
            sub_w = tile_w // nsub
            # Screen order ↔ fine order (kernel rows = subtiles): a tiny
            # (k, th, nsub, sub_w) transpose on the XLA side keeps every
            # in-kernel access a native sublane slice.
            zk_fine = (
                zk_in.reshape(k, tile_h, nsub, sub_w)
                .transpose(0, 2, 1, 3)
                .reshape(k, tile_h, tile_w)
            )
            out = make_call_fine(k)(
                ids, starts_p, lb_al.reshape(-1), cntk.reshape(-1),
                nb_p[None], ov_k, pair_rec, zk_fine
            )
            out = [
                o.reshape(k, nsub, tile_h, sub_w)
                .transpose(0, 2, 1, 3)
                .reshape(k, tile_h, tile_w)
                for o in out
            ]
        elif p == 0 and use_gw:
            # Group-window path: each group of `group` compact slots
            # fetches ONE contiguous candidate window (the sorted pair
            # list is contiguous in compact-id order) and resolves all
            # its pixels with one 3-dot matmul. Per-tile bases are
            # 8-aligned downward — prefix rows belong to earlier tiles
            # and cannot cover this tile (coverage ⊆ bbox).
            # Bound the group by the resolve one-hot's VMEM footprint
            # ((oc+gcap) × group·npx bf16) the same way make_call bounds
            # its slab — a dense-scene gcap must shrink the group, not
            # blow the scoped-VMEM limit at compile time.
            oh_tile_bytes = (oc + gcap) * npx * 2
            gmax = max(1, (32 << 20) // oh_tile_bytes)
            group = next(
                g for g in (8, 4, 2, 1) if g <= gmax and k % g == 0
            )
            win = starts_p.reshape(k // group, group)[:, 0]
            lb = jnp.clip(starts_p - jnp.repeat(win, group), 0, gcap)
            kept = jnp.clip(gcap - lb, 0, counts_p)
            dropped_win = dropped_win + jnp.sum(counts_p - kept)
            lb_al = (lb // CHUNK) * CHUNK
            cnt_k = kept + (lb - lb_al)
            out = make_call_gw(k, group)(
                ids, lb_al, cnt_k, nb_p[None], win, ov_k, pair_rec, zk_in
            )
        else:
            args = [ids, starts_p, counts_p, nb_p[None], ov_k, pair_rec,
                    zk_in]
            if earlyz:
                args.append(okey[ids].reshape(k, tile_h, tile_w))
            out = make_call(k)(*args)
        zk_new = out[0].reshape(k, npx)
        if earlyz:
            ok_new = out[1].reshape(k, npx)
            fouts = out[2:]
        else:
            ok_new = None
            fouts = out[1:]
        fields_p = {
            f: v.reshape(k, npx) for f, v in zip(out_fields, fouts)
        }
        if p == 0 and scatter_ids is not None:
            # Unlisted tiles keep clear/init depth (masked like the
            # kernel's own writes) and miss-valued (zero) fields; dead
            # compact slots drop their writes (out-of-bounds target).
            # Gate on compaction, NOT k < nt: at raster_tile_cap == nt
            # the slot list is still a live-first permutation, and a
            # direct assign would place tiles at compact-slot order
            # whenever any tile is dead.
            zkey = (zkey & _LOW3).at[scatter_ids].set(zk_new, mode="drop")
            if earlyz:
                okey = okey.at[scatter_ids].set(ok_new, mode="drop")
            fields = {
                f: jnp.zeros((nt, npx), jnp.float32).at[scatter_ids].set(
                    fields_p[f], mode="drop")
                for f in fields_p
            }
        elif p == 0:
            zkey, fields = zk_new, fields_p
            if earlyz:
                okey = ok_new
        else:
            # Dead compact slots carry stale values (zero counts skip
            # their work), so their scatter writes must DROP — a stale
            # duplicate racing the live slot's update at the same index
            # would nondeterministically regress it.
            ids_sc = jnp.where(slot_live_p, ids, nt)
            hit = fields_p["idf"] >= 0.5  # pass-p winner beat the chain
            zkey = zkey.at[ids_sc].set(zk_new, mode="drop")
            if earlyz:
                okey = okey.at[ids_sc].set(ok_new, mode="drop")
            fields = {
                f: fields[f].at[ids_sc].set(
                    jnp.where(hit, fields_p[f], fields[f][ids]),
                    mode="drop",
                )
                for f in fields
            }
    diag = diag._replace(
        dropped_cap=diag.dropped_cap + dropped_win,
        dropped_tiles=diag.dropped_tiles + dropped_dense,
    )
    return _pixels_from_fields(fields), zkey, diag



def _big_cover_mask(ov: jnp.ndarray, big_ids: jnp.ndarray, nt: int,
                    tiles_x: int, tile_h: int, tile_w: int) -> jnp.ndarray:
    """(NT,) conservative mask of tiles possibly covered by any big
    (overflow) triangle. Big triangles include near-plane externals whose
    bbox is conservatively full-screen, so instead each tile rectangle is
    tested against the triangle's affine edge/w/z planes from its record
    row: an affine function's max over a rectangle is at a corner, so
    max(A*x0, A*x1) + max(B*y0, B*y1) + C >= 0 is an exact conservative
    cover test per plane."""
    tcol = (jnp.arange(nt, dtype=jnp.int32) % tiles_x).astype(jnp.float32)
    trow = (jnp.arange(nt, dtype=jnp.int32) // tiles_x).astype(jnp.float32)
    x0 = (tcol * tile_w)[:, None]
    x1 = x0 + tile_w
    y0 = (trow * tile_h)[:, None]
    y1 = y0 + tile_h

    def plane_max(a, b, c):  # (NT, OC) max of a*x + b*y + c over the tile
        return (jnp.maximum(x0 * a[None, :], x1 * a[None, :])
                + jnp.maximum(y0 * b[None, :], y1 * b[None, :])
                + c[None, :])

    covers = jnp.broadcast_to((big_ids >= 0)[None, :], (nt, ov.shape[0]))
    for e in range(3):
        covers = covers & (
            plane_max(ov[:, _A + e], ov[:, _B + e], ov[:, _C + e]) >= 0
        )
    covers = covers & (
        plane_max(ov[:, _ZC], ov[:, _ZC + 1], ov[:, _ZC + 2]) >= 0
    )
    covers = covers & (
        plane_max(ov[:, _WC], ov[:, _WC + 1], ov[:, _WC + 2]) > 0
    )
    covers = covers & (  # somewhere zn <= wn (depth in range)
        plane_max(ov[:, _WC] - ov[:, _ZC],
                  ov[:, _WC + 1] - ov[:, _ZC + 1],
                  ov[:, _WC + 2] - ov[:, _ZC + 2]) >= 0
    )
    return jnp.any(covers, axis=1)


def _compact_tile_list(live: jnp.ndarray, k: int):
    """Compact a (NT,) liveness mask to k tile ids (dead slots duplicate
    the first listed tile — idempotent under recompute + scatter-back).
    Returns (ids (k,), dropped count)."""
    nt = live.shape[0]
    neg = jnp.where(live, -jnp.arange(nt, dtype=jnp.int32),
                    jnp.int32(-(1 << 30)))
    top, _ = lax.top_k(neg, k)
    slot_live = top > -(1 << 30)
    ids = jnp.where(slot_live, -top, 0)
    ids = jnp.where(slot_live, ids, ids[0])
    dropped = jnp.maximum(jnp.sum(live, dtype=jnp.int32) - k, 0)
    return ids, dropped


def _overlay_kernel(
    # scalar prefetch (all compacted to the live-tile list)
    ids_ref, starts_ref, counts_ref, nbig_ref,
    # inputs
    ov_ref,  # (OC, 128) f32 overflow records, VMEM
    tab_ref,  # (P_pad, 128) f32 sorted pair records, HBM (manual DMA)
    zkey_ref,  # (G, th, tw) int32 scene depth keys (compact)
    lr_ref, lg_ref, lb_ref,  # (G, th, tw) f32 LDR planes (compact)
    # outputs
    or_ref, og_ref, ob_ref,
    # scratch
    slabs, sem,
    *, tile_h, tile_w, tiles_x, oc, maxc, group,
):
    """Depth-tested flat-color overlay composite over a COMPACT tile list
    (light.vert/frag + main.cpp:138-148): same coverage/depth semantics as
    the main kernel, but the grid only visits tiles the overlay geometry
    touches — a full-frame pass for 3 light spheres costs a 2025-step grid
    (~5 ms measured); this costs ~max_tiles/group steps. Like the main
    kernel, each step processes ``group`` tiles to amortize the ~0.9 µs
    fixed per-step cost (a 384-slot compact list at 1 tile/step measured
    ~0.9 ms of pure overhead — most slots are idempotent duplicates)."""
    npx = tile_h * tile_w
    i = pl.program_id(0)
    nb = nbig_ref[0]
    n_steps = pl.num_programs(0)
    slot = lax.rem(i, 2)

    def tile_dma(step, j, s):
        return pltpu.make_async_copy(
            tab_ref.at[pl.ds(starts_ref[step * group + j], maxc), :],
            slabs.at[s, j, pl.ds(oc, maxc), :],
            sem.at[s, j],
        )

    # The record fetch stays UNCONDITIONAL even for zero-count slots: a
    # tile can be live via big-triangle cover alone, and its resolve
    # reduces over every scratch row — skipping the DMA would leave
    # rows [oc, oc+maxc) as uninitialized VMEM whose garbage bit
    # patterns (0·NaN = NaN) could poison the one-hot product. (A
    # conditional fetch also measured no win — the dead-slot cost was
    # the duplicated coverage/resolve work, fixed by zeroed counts.)
    @pl.when(i == 0)
    def _():
        for j in range(group):
            slabs[0, j, 0:oc, :] = ov_ref[:]
            slabs[1, j, 0:oc, :] = ov_ref[:]
            tile_dma(0, j, 0).start()

    @pl.when(i + 1 < n_steps)
    def _():
        for j in range(group):
            tile_dma(i + 1, j, 1 - slot).start()

    pix = lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    chunk_idx = lax.broadcasted_iota(jnp.int32, (CHUNK, npx), 0)

    for j in range(group):
        scratch = slabs.at[slot, j]
        cnt = counts_ref[i * group + j]
        tid = ids_ref[i * group + j]
        row = tid // tiles_x
        col = lax.rem(tid, tiles_x)
        px = (pix % tile_w + col * tile_w).astype(jnp.float32) + 0.5
        py = (pix // tile_w + row * tile_h).astype(jnp.float32) + 0.5

        init_key = zkey_ref[j].reshape(1, npx) & _LOW3
        carry = (init_key, jnp.full((1, npx), -1, jnp.int32))
        carry = _coverage_loop(scratch, px, py, chunk_idx, 0, nb, carry)

        tile_dma(i, j, slot).wait()
        _, best_cand = _coverage_loop(scratch, px, py, chunk_idx, oc, cnt,
                                      carry)

        ldr = (lr_ref[j].reshape(1, npx), lg_ref[j].reshape(1, npx),
               lb_ref[j].reshape(1, npx))
        outs = (or_ref, og_ref, ob_ref)
        any_hit = jnp.any(best_cand >= 0)

        def composite(scratch=scratch, best_cand=best_cand, px=px, py=py,
                      ldr=ldr, j=j):
            recT = _resolve_winner(scratch, best_cand, oc + maxc, npx)

            def r(k):
                return recT[k : k + 1, :]

            hit = r(_ID) >= 0.5
            e0 = r(_A + 0) * px + r(_B + 0) * py + r(_C + 0)
            e1 = r(_A + 1) * px + r(_B + 1) * py + r(_C + 1)
            e2 = r(_A + 2) * px + r(_B + 2) * py + r(_C + 2)
            esum = e0 + e1 + e2
            inv = pl.reciprocal(jnp.where(esum == 0.0, 1.0, esum),
                                approx=False)
            b = (e0 * inv, e1 * inv, e2 * inv)

            for c in range(3):
                col3 = (r(_COL + 3 * c) * b[0] + r(_COL + 3 * c + 1) * b[1]
                        + r(_COL + 3 * c + 2) * b[2])
                outs[c][j] = jnp.where(hit, col3, ldr[c]).reshape(
                    tile_h, tile_w)

        def passthrough(ldr=ldr, j=j):
            for c in range(3):
                outs[c][j] = ldr[c].reshape(tile_h, tile_w)

        @pl.when(any_hit)
        def _():
            composite()

        @pl.when(jnp.logical_not(any_hit))
        def _():
            passthrough()


def composite_overlay_pallas(
    rec_table: jnp.ndarray,  # (T, 128) f32 overlay records
    setup,  # TriangleSetup | PlanarSetup of the overlay geometry
    ldr3: tuple,  # three (NT, NPX) planes
    zkey: jnp.ndarray,  # (NT, NPX) int32 scene depth keys
    width: int,
    height: int,
    tile_h: int = 8,
    tile_w: int = 128,
    max_candidates: int = 128,
    overflow_cap: int = 64,
    span_cap: int = 64,
    max_tiles: int = 512,
    pair_budget: int = 65536,
    span_mid_cap: int | None = None,
    interpret: bool = False,
):
    """Composite depth-tested flat-color overlay geometry into LDR planes,
    visiting only the tiles the geometry touches.

    Returns (ldr3', diag). Tiles beyond ``max_tiles`` are reported in
    diag.dropped_tiles (surfaced by utils.validation) instead of silently
    losing overlay pixels — raise max_tiles if it fires. ``span_mid_cap``
    enables span-class binning (bin_pairs): overlay geometry is mostly
    tiny triangles, so the pair sort shrinks ~span_cap/2-fold."""
    maxc = ((max_candidates + CHUNK - 1) // CHUNK) * CHUNK
    oc = ((overflow_cap + CHUNK - 1) // CHUNK) * CHUNK
    npx = tile_h * tile_w

    sorted_tri, starts, counts, big_ids, n_big, diag, tiles_y, tiles_x = (
        bin_pairs(setup, width, height, tile_h, tile_w, span_cap, oc,
                  maxc, pair_budget=pair_budget, span_mid_cap=span_mid_cap)
    )
    nt = tiles_y * tiles_x

    pair_rec = rec_table[sorted_tri]
    pair_rec = jnp.concatenate(
        [pair_rec, jnp.zeros((maxc, REC_CH), jnp.float32)], axis=0
    )
    ov = rec_table[jnp.maximum(big_ids, 0)] * (
        big_ids >= 0
    ).astype(jnp.float32)[:, None]

    # Live tiles: own candidates, or possibly covered by a big (overflow)
    # triangle (conservative per-tile edge-plane test; see
    # _big_cover_mask).
    live = (counts > 0) | _big_cover_mask(ov, big_ids, nt, tiles_x,
                                          tile_h, tile_w)
    k_top = min(max_tiles, nt)
    ids, dropped = _compact_tile_list(live, k_top)
    diag = diag._replace(dropped_tiles=dropped)

    # Dead compact slots must not redo the first live tile's full
    # coverage+resolve (an overlay list sized for the worst frame is
    # mostly dead slots — 384 slots for ~30 sphere-covered tiles measured
    # ~1 ms of duplicate work): zero their candidate counts so they take
    # the passthrough branch, and drop their scatter writes (a dead
    # slot's passthrough would otherwise race the live slot's composite
    # at the same index).
    n_live = jnp.minimum(jnp.sum(live, dtype=jnp.int32), k_top)
    slot_live = jnp.arange(k_top, dtype=jnp.int32) < n_live
    starts_c = starts[ids]
    counts_c = jnp.where(slot_live, counts[ids], 0)
    scatter_ids = jnp.where(slot_live, ids, nt)  # nt = out of bounds
    zkey_c = zkey[ids].reshape(k_top, tile_h, tile_w)
    ldr_c = [c[ids].reshape(k_top, tile_h, tile_w) for c in ldr3]

    group = next(g for g in (8, 4, 2, 1) if k_top % g == 0)
    kernel = functools.partial(
        _overlay_kernel, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
        oc=oc, maxc=maxc, group=group,
    )
    plane_spec = pl.BlockSpec((group, tile_h, tile_w),
                              lambda i, *_: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(k_top // group,),
        in_specs=[
            pl.BlockSpec((oc, REC_CH), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            plane_spec, plane_spec, plane_spec, plane_spec,
        ],
        out_specs=[plane_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, group, oc + maxc, REC_CH), jnp.float32),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((k_top, tile_h, tile_w), jnp.float32)]
        * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(ids, starts_c, counts_c, n_big[None], ov, pair_rec, zkey_c, *ldr_c)

    ldr_new = tuple(
        ldr3[c].at[scatter_ids].set(out[c].reshape(k_top, npx),
                                    mode="drop")
        for c in range(3)
    )
    return ldr_new, diag


def raster_fused_xla(
    rec_table: jnp.ndarray,
    setup: TriangleSetup,
    clip: jnp.ndarray,
    tris: jnp.ndarray,
    width: int,
    height: int,
    tile_h: int = 8,
    tile_w: int = 128,
    cap: int = 2048,
    init_zkey: jnp.ndarray | None = None,
    viewport_height: int | None = None,
    y_origin=0,
    diag_caps: tuple | None = None,
    span_cap: int = 16,
    overflow_cap: int = 64,
):
    """XLA fallback with identical outputs (CPU tests / non-TPU backends).

    Uses ops.raster.rasterize for the visibility pass, then gathers whole
    record rows per pixel (pixel-rate gathers are fine on CPU).
    ``span_cap``/``overflow_cap`` feed this path's OWN binning (must match
    the Pallas call's configuration or the oracle can drop different
    geometry). For band rendering pass the full-frame ``viewport_height``
    + traced ``y_origin`` and a shift_record_table_y-rebased
    ``rec_table``. ``diag_caps`` = (span_cap, overflow_cap,
    max_candidates[, pair_budget]) reports the drops the Pallas path's
    binning would incur with those capacities, so CPU tests can validate
    TPU capacity settings; the fallback's own cap/overflow drops are
    always counted on top (no silent geometry loss on any backend)."""
    from bibim_tpu.ops.raster import VisibilityBuffer, rasterize

    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)

    init = None
    if init_zkey is not None:
        depth_init = lax.bitcast_convert_type(
            jnp.maximum(init_zkey, 0), jnp.float32
        )
        img = untile(depth_init, width, height, tiles_x, tile_h, tile_w)
        init = VisibilityBuffer(
            tri_id=jnp.full((height, width), -1, jnp.int32),
            bary=jnp.zeros((height, width, 2), jnp.float32),
            depth=img,
        )

    vis = rasterize(clip, tris, width, height, tile_h=tile_h,
                    tile_w=tile_w, cap=cap, init=init,
                    viewport_height=viewport_height, y_origin=y_origin,
                    span_cap=span_cap, overflow_cap=overflow_cap)
    hit = vis.tri_id >= 0
    rec_px = rec_table[jnp.maximum(vis.tri_id, 0)]  # (H, W, 128)
    rec_px = rec_px * hit.astype(jnp.float32)[..., None]

    xs = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    ys = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5

    def r(j):
        return rec_px[..., j]

    idf = r(_ID)
    e = [r(_A + c) * xs + r(_B + c) * ys + r(_C + c) for c in range(3)]
    esum = e[0] + e[1] + e[2]
    inv = 1.0 / jnp.where(esum == 0.0, 1.0, esum)
    b0 = jnp.where(hit, e[0] * inv, 0.0)
    b1 = jnp.where(hit, e[1] * inv, 0.0)
    b2 = jnp.where(hit, e[2] * inv, 0.0)  # matches kernel (not 1-b0-b1)

    zn = r(_ZC) * xs + r(_ZC + 1) * ys + r(_ZC + 2)
    wn = r(_WC) * xs + r(_WC + 1) * ys + r(_WC + 2)
    depth = jnp.where(hit, zn / jnp.where(wn == 0.0, 1.0, wn), 0.0)

    def blend(base):
        return r(base) * b0 + r(base + 1) * b1 + r(base + 2) * b2

    def t(img, fill=0.0):
        return tile_plane(img, tiles_x, tiles_y, tile_h, tile_w, fill)

    fields = {
        "depth": t(depth),
        "idf": t(idf),
        "u": t(blend(_U)),
        "v": t(blend(_V)),
        "nx": t(blend(_N)), "ny": t(blend(_N + 3)), "nz": t(blend(_N + 6)),
        "tx": t(blend(_T)), "ty": t(blend(_T + 3)), "tz": t(blend(_T + 6)),
        "wx": t(blend(_W)), "wy": t(blend(_W + 3)), "wz": t(blend(_W + 6)),
        "cr": t(blend(_COL)), "cg": t(blend(_COL + 3)),
        "cb": t(blend(_COL + 6)),
        "matf": t(r(_MAT)),
        "b0": t(b0),
        "b1": t(b1),
    }
    zbits = lax.bitcast_convert_type(vis.depth, jnp.int32)
    zkey = tile_plane(
        (zbits & _LOW3).astype(jnp.int32), tiles_x, tiles_y, tile_h, tile_w, 0
    )
    # This path's OWN capacity drops (same bbox/span model as its
    # binning; the shared-cap big prefix makes dropped_cap a slight
    # under-count in the rare big+dense-tile overlap, never an
    # over-count of healthy frames).
    *_, own_diag, _, _ = bin_pairs(
        setup, width, height, tile_h, tile_w, span_cap, overflow_cap, cap
    )
    diag = BinDiag(
        dropped_overflow=own_diag.dropped_overflow,
        dropped_cap=own_diag.dropped_cap,
        dropped_pairs=jnp.int32(0),
    )
    if diag_caps is not None:
        p_span, p_overflow, p_maxc = diag_caps[:3]
        p_budget = diag_caps[3] if len(diag_caps) > 3 else None
        *_, pdiag, _, _ = bin_pairs(
            setup, width, height, tile_h, tile_w, p_span,
            p_overflow, p_maxc, pair_budget=p_budget,
        )
        diag = BinDiag(
            dropped_overflow=diag.dropped_overflow + pdiag.dropped_overflow,
            dropped_cap=diag.dropped_cap + pdiag.dropped_cap,
            dropped_pairs=pdiag.dropped_pairs,
        )
    return _pixels_from_fields(fields), zkey, diag


def untile(plane: jnp.ndarray, width: int, height: int, tiles_x: int,
           tile_h: int, tile_w: int) -> jnp.ndarray:
    """(NT, NPX) tiled-planar → (H, W) image."""
    nt = plane.shape[0]
    tiles_y = nt // tiles_x
    img = (
        plane.reshape(tiles_y, tiles_x, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y * tile_h, tiles_x * tile_w)
    )
    return img[:height, :width]


def tile_plane(img: jnp.ndarray, tiles_x: int, tiles_y: int, tile_h: int,
               tile_w: int, fill=0.0) -> jnp.ndarray:
    """(H, W) image → (NT, NPX) tiled-planar (pads to tile multiples)."""
    h, w = img.shape
    pad_h, pad_w = tiles_y * tile_h - h, tiles_x * tile_w - w
    img = jnp.pad(img, ((0, pad_h), (0, pad_w)), constant_values=fill)
    return (
        img.reshape(tiles_y, tile_h, tiles_x, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(tiles_y * tiles_x, tile_h * tile_w)
    )
