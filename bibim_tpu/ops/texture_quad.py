"""Quad-row texture sampling — the TPU material-sampling path.

Replaces per-pixel "4 taps × 6 maps = 24 gathers" bilinear sampling
(round 1: 430 ms/frame at 1080p — row gathers cost ~8 ns each on v5e
regardless of row size) with ONE gather per pixel:

- All material maps of one resolution are packed into a single 16-channel
  texture (channel slots below), and every texel row additionally stores its
  2×2 wrap-correct neighborhood: a row holds [t00 | t01 | t10 | t11] × 16
  channels = 64 bytes. A bilinear sample therefore needs exactly one row
  gather; the blend is dense vector math on planar (NT, NPX) arrays.
- Maps of different resolutions (the reference's per-map default fallback,
  render.cpp:1328-1336, yields e.g. 2048² roughness + 16² albedo) form
  separate groups: one gather per group.
- Small groups (≤ SMALL_ROWS texels) skip gathers entirely: a Pallas kernel
  resolves them with a one-hot matmul on the MXU per screen tile — the same
  trick ops/fused.py uses for attribute resolve.

Sampling semantics are bit-compatible with ops/texture.sample_bilinear
(LINEAR filter, REPEAT addressing, texel centers at +0.5, u8 × 1/255
dequant): the immutable-sampler contract of createImmutableSamplers
(/root/reference/src/render.cpp:1338-1371), mip-less like the reference
(mipLevels=1, resource.cpp:191).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Material channel slots a sample produces.
SLOTS = (
    "alb_r", "alb_g", "alb_b",
    "nrm_x", "nrm_y", "nrm_z",
    "metallic", "roughness", "ao", "height",
)

# Tables with at most this many texel rows use the MXU one-hot path
# (one-hot select cost grows linearly with rows; the XLA gather it
# replaces is flat ~8 ns/pixel — crossover is well above 2048 rows,
# which covers the IBL products and every fallback map).
SMALL_ROWS = 2048

# Neighborhood-BLOCK tables (opt-in via build_quad_tables
# block_threshold): one row per BLOCK_B×BLOCK_B texel block holding the
# (B+1)² wrap-correct neighborhood. The row count drops B²× into the
# fast gather regime (the 2048² group's gather: ~5.2 → ~2.5 ms on the
# headline stream), but the 25-tap bilinear blend runs at 4/128-lane
# occupancy and eats the entire saving — measured production regression
# 7.84 → 8.47 ms on the sampling stage (BENCH r2; tools/exp_block2.py's
# prettier numbers were an XLA-DCE artifact). Kept as a tested,
# documented alternative: it becomes the win iff the blend moves into a
# full-lane Pallas pass.
BLOCK_ROWS = None  # opt-in only
BLOCK_B = 4


class QuadTable(NamedTuple):
    """One size-group of packed material maps.

    Registered as a pytree with ``quads`` as the only traced leaf (the
    table is hundreds of MB for 2048² materials — it must travel as a jit
    argument, never as an embedded constant) and height/width/present as
    static metadata."""

    quads: jnp.ndarray  # (H*W, 4*C) uint8 — [t00|t01|t10|t11] × C channels
    height: int  # static
    width: int  # static
    present: tuple  # slot names stored, in channel order; C = padded len


jax.tree_util.register_pytree_node(
    QuadTable,
    lambda t: ((t.quads,), (t.height, t.width, t.present)),
    lambda aux, ch: QuadTable(ch[0], *aux),
)


class BlockTable(NamedTuple):
    """Neighborhood-block table for big size-groups: one u8 row per
    BLOCK_B×BLOCK_B texel block holding its (B+1)² wrap-correct texel
    neighborhood, channel layout [tap (j,i) row-major] × C, lane-padded
    to 128 B. Any bilinear footprint whose top-left tap lies in the block
    is served by ONE row gather; see texture_quad module docstring and
    tools/exp_block2.py for the measured rationale."""

    blocks: jnp.ndarray  # (H*W/B², 128) uint8
    height: int
    width: int
    present: tuple


jax.tree_util.register_pytree_node(
    BlockTable,
    lambda t: ((t.blocks,), (t.height, t.width, t.present)),
    lambda aux, ch: BlockTable(ch[0], *aux),
)


def _ceil4(n: int) -> int:
    return -(-n // 4) * 4


def build_quad_tables(maps: dict,
                      block_threshold: int | None = None) -> tuple:
    """Group per-slot (H, W, ≥1)-channel uint8 maps by resolution and pack
    each group into a QuadTable. ``maps`` maps slot name → numpy uint8 array
    (channel 0 used for scalar slots; alb_*/nrm_* take their own channel).

    Rows are dense — 4 taps × only-the-present channels (padded to 4) — so
    a 3-channel 2048² group costs 16-byte gathers, not 64 (measured 2.6×
    faster at 1080p). Build runs on host numpy once per material bind."""
    groups: dict = {}
    for slot, img in maps.items():
        key = (int(img.shape[0]), int(img.shape[1]))
        groups.setdefault(key, {})[slot] = img

    tables = []
    for (h, w), slot_imgs in sorted(groups.items()):
        present = tuple(sorted(slot_imgs, key=SLOTS.index))
        cpad = _ceil4(len(present))
        tex = np.zeros((h, w, cpad), np.uint8)
        for k, slot in enumerate(present):
            img = slot_imgs[slot]
            tex[:, :, k] = img[:, :, 0] if img.ndim == 3 else img
        if (block_threshold is not None and h * w > block_threshold
                and h % BLOCK_B == 0 and w % BLOCK_B == 0):
            tables.append(_build_block_table(tex, h, w, present, cpad))
            continue
        # 2×2 wrap-correct neighborhoods via rolls (REPEAT addressing).
        t00 = tex
        t01 = np.roll(tex, -1, axis=1)
        t10 = np.roll(tex, -1, axis=0)
        t11 = np.roll(t01, -1, axis=0)
        quads = np.concatenate([t00, t01, t10, t11], axis=-1).reshape(
            h * w, 4 * cpad
        )
        if h * w >= (1 << 16):
            # Big gather tables store rows as int32 lanes (4 bytes/lane):
            # measured ~7% faster than u8 rows at 1080p (narrower lane
            # footprint); bytes unpack exactly after the gather. Mid-size
            # tables stay u8 — the unpack's interleave relayout costs more
            # than the gather saves when the table isn't in the slow
            # row-count regime (and small tables feed the MXU path).
            quads = np.ascontiguousarray(quads).view(np.int32)
        tables.append(
            QuadTable(
                quads=jnp.asarray(quads),
                height=h,
                width=w,
                present=present,
            )
        )
    return tuple(tables)


def _build_block_table(tex: np.ndarray, h: int, w: int, present: tuple,
                       cpad: int) -> BlockTable:
    """Pack a (h, w, cpad) texel image into BLOCK_B×BLOCK_B neighborhood
    rows: tap (j, i) row-major × cpad channels, wrap-correct, lane-padded
    to a 128-byte multiple."""
    b = BLOCK_B
    s = b + 1
    nby, nbx = h // b, w // b
    ay = (np.arange(nby) * b)[:, None]
    ax = (np.arange(nbx) * b)[None, :]
    taps = [tex[(ay + j) % h, (ax + i) % w]
            for j in range(s) for i in range(s)]
    raw = np.concatenate(taps, axis=-1).reshape(nby * nbx, s * s * cpad)
    pad = (-raw.shape[1]) % 128
    if pad:
        raw = np.pad(raw, ((0, 0), (0, pad)))
    return BlockTable(blocks=jnp.asarray(raw), height=h, width=w,
                      present=present)


def sample_table_block(table: BlockTable, u, v, pair_rows: bool = False,
                       valid=None, tile_w: int = 128) -> dict:
    """One block-row gather per pixel + transpose-planar bilinear blend.

    Bit-exact with :func:`sample_table_xla` on the quad layout: the tap
    accumulation visits (j, i) row-major, so the four live taps add in
    the oracle's w00, w01, w10, w11 order and the 21 dead taps contribute
    exact fp zeros. The gathered rows transpose once to planar (lane =
    pixel) so the 25-tap blend runs at full VPU width (pixel-major
    (N, C) slices use 4/128 lanes — tools/exp_block2.py measured the
    planar blend ~0.3 ms cheaper and the whole path 4.4 ms vs 5.2 for
    the 4.19M-row quad gather).

    ``pair_rows``: pair-rate sampling (see :func:`block_prep`) — the XLA
    twin of the fused kernel's pair path, same prep, same blend."""
    shape = u.shape
    h, w = table.height, table.width
    b = BLOCK_B
    s = b + 1
    nbx = w // b
    cpad = _ceil4(len(table.present))
    if pair_rows:
        prep = block_prep(table, u, v, pair_rows=True, valid=valid,
                          tile_w=tile_w)
        nt, npx = u.shape
        rw = table.blocks.shape[1]
        qt = (jnp.transpose(prep["qt"], (1, 0, 2)).reshape(rw, nt * npx)
              .astype(jnp.float32) * (1.0 / 255.0))
        lx = prep["lx"].reshape(-1)
        ly = prep["ly"].reshape(-1)
        tx = prep["tx"].reshape(-1)
        ty = prep["ty"].reshape(-1)
    else:
        uf = u.reshape(-1)
        vf = v.reshape(-1)
        fx = uf * w - 0.5
        fy = vf * h - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0
        x0i = jnp.remainder(x0.astype(jnp.int32), w)
        y0i = jnp.remainder(y0.astype(jnp.int32), h)
        q = table.blocks[(y0i // b) * nbx + (x0i // b)]  # (N, 128) u8
        qt = q.T.astype(jnp.float32) * (1.0 / 255.0)  # (128, N) planar
        lx = x0i % b
        ly = y0i % b
    one_m_tx = 1.0 - tx
    one_m_ty = 1.0 - ty
    acc = [None] * len(table.present)
    for j in range(s):
        wy = (jnp.where(ly == j, one_m_ty, 0.0)
              + jnp.where(ly + 1 == j, ty, 0.0))[None, :]
        for i in range(s):
            wx = (jnp.where(lx == i, one_m_tx, 0.0)
                  + jnp.where(lx + 1 == i, tx, 0.0))[None, :]
            wgt = wx * wy
            for c in range(len(table.present)):
                row = (j * s + i) * cpad + c
                term = qt[row:row + 1, :] * wgt
                acc[c] = term if acc[c] is None else acc[c] + term
    return {
        slot: acc[k].reshape(shape)
        for k, slot in enumerate(table.present)
    }


# Tiles per grid step of the block-blend kernel: the qt block is
# (g, 128, NPX) u8 = g·128 KB — g=16 keeps the double-buffered footprint
# ~4 MB and the fixed ~2.4 µs/step overhead under 0.15 ms at 1080p.
BLOCK_TILE_BATCH = 16


def block_blend_acc(tap_of_row, lx, ly, tx, ty, cpad: int, n_out: int):
    """25-tap neighborhood blend at full VPU width: pixels on lanes, taps
    on sublanes (each tap row is a static sublane select).
    ``tap_of_row(row)`` returns the u8 tap row as an array castable via
    i32 (Mosaic has no u8→f32 cast; the i32 hop is exact). Shared by the
    standalone block-blend kernel and the fused sampled-shade kernel —
    identical op order keeps them bit-compatible."""
    s = BLOCK_B + 1
    one_m_tx = 1.0 - tx
    one_m_ty = 1.0 - ty
    acc = [None] * n_out
    for j in range(s):
        wy = (jnp.where(ly == j, one_m_ty, 0.0)
              + jnp.where(ly + 1 == j, ty, 0.0))
        for i in range(s):
            wx = (jnp.where(lx == i, one_m_tx, 0.0)
                  + jnp.where(lx + 1 == i, tx, 0.0))
            wgt = wx * wy
            for c in range(n_out):
                row = (j * s + i) * cpad + c
                tap = tap_of_row(row).astype(jnp.int32).astype(
                    jnp.float32) * (1.0 / 255.0)
                term = tap * wgt
                acc[c] = term if acc[c] is None else acc[c] + term
    return acc


def onehot_sample_planes(tex, idx, tx, ty, rows: int, cpad: int,
                         n_out: int):
    """Gather-free small-table bilinear sample on the MXU (op order
    identical to the standalone ``_small_kernel``): ``tex`` is the
    (rows, 4·cpad) f32 quad table; ``idx``/``tx``/``ty`` are (G, NPX)
    planes. Returns n_out channel planes shaped like ``idx``."""
    gdim, npx = idx.shape
    n = gdim * npx
    oh = (
        lax.broadcasted_iota(jnp.int32, (rows, n), 0) == idx.reshape(1, n)
    ).astype(jnp.float32)
    taps = lax.dot_general(
        tex, oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / 255.0)  # (4*C, N)

    def qf(tap, ci):
        j = tap * cpad + ci
        return taps[j : j + 1, :]

    txf = tx.reshape(1, n)
    tyf = ty.reshape(1, n)
    return [
        _blend(qf, txf, tyf, k).reshape(gdim, npx) for k in range(n_out)
    ]


def _block_blend_kernel(qt_ref, lx_ref, ly_ref, tx_ref, ty_ref, *out_refs,
                        cpad, n_out, expand=1):
    def tap_row(row):
        t = qt_ref[:, row, :]
        if expand == 1:
            return t
        # Member-major rep-rate rows expand by lane-segment concat
        # (see member_perm) — VMEM copies, no pixel-rate HBM qt.
        return jnp.concatenate([t] * expand, axis=1)

    acc = block_blend_acc(
        tap_row, lx_ref[...], ly_ref[...],
        tx_ref[...], ty_ref[...], cpad, n_out,
    )
    for c, out in enumerate(out_refs):
        out[...] = acc[c]


def pair_factors(pair_rows) -> tuple:
    """(ry, rx) pixel-group factors for a pair_sampling level."""
    ry = 2
    rx = 2 if int(pair_rows) >= 2 else 1
    return ry, rx


def member_perm(p, ry: int, rx: int, tile_w: int):
    """Pixel-order (NT, NPX) plane → member-major order: the npx axis
    becomes [member(0,0) pixels | member(0,1) | ...], each segment in
    group order. In this layout a rep-rate plane expands to pixel rate
    by CONCATENATING ry·rx copies — inside a Pallas kernel that is pure
    lane-segment copies, where the pixel-order expansion would be an
    interleave (a per-element lane shuffle Mosaic has no cheap op for)."""
    nt, npx = p.shape
    rows = npx // tile_w
    g = p.reshape(nt, rows // ry, ry, tile_w // rx, rx)
    return jnp.transpose(g, (0, 2, 4, 1, 3)).reshape(nt, npx)


def member_unperm(p, ry: int, rx: int, tile_w: int):
    """Inverse of :func:`member_perm`."""
    nt, npx = p.shape
    rows = npx // tile_w
    g = p.reshape(nt, ry, rx, rows // ry, tile_w // rx)
    return jnp.transpose(g, (0, 3, 1, 4, 2)).reshape(nt, npx)


def _footprint_ints(u, v, h, w):
    """Bilinear footprint integers + fractions (REPEAT addressing, texel
    centers at +0.5): the one place the footprint math lives —
    :func:`block_prep` and :func:`escape_tiles` MUST agree bit-for-bit on
    these, or routing would misclassify a clamped pixel as exact."""
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.remainder(x0.astype(jnp.int32), w)
    y0i = jnp.remainder(y0.astype(jnp.int32), h)
    return x0i, y0i, tx, ty


def _rep_min(p, vp):
    """Per-group window anchor for one axis: the MIN top-left tap over the
    group's covered members, falling back to the plain min when the whole
    group is uncovered (masked off downstream anyway). The block
    containing the min corner covers every member footprint whose texel
    spread fits the window — strictly more in-window (exact) coverage
    than anchoring at any single member's own block.

    ``p``/``vp``: (nt, hp, ry, wp, rx) group-shaped tap/valid planes.
    Returns (nt, hp, wp)."""
    ry, rx = p.shape[2], p.shape[4]
    big = jnp.int32(1 << 30)
    mn_cov = mn_all = anyv = None
    for i in range(ry):
        for j in range(rx):
            m, vm = p[:, :, i, :, j], vp[:, :, i, :, j]
            mc = jnp.where(vm, m, big)
            mn_cov = mc if mn_cov is None else jnp.minimum(mn_cov, mc)
            mn_all = m if mn_all is None else jnp.minimum(mn_all, m)
            anyv = vm if anyv is None else (anyv | vm)
    return jnp.where(anyv, mn_cov, mn_all)


def escape_tiles(table: "BlockTable", u, v, valid, pair_rows,
                 tile_w: int = 128) -> jnp.ndarray:
    """Per-tile WINDOW-ESCAPE flags for pair/quad-rate block sampling:
    True where ANY covered pixel's bilinear footprint falls outside its
    group's shared (B+1)² texel window — i.e. where :func:`block_prep`
    with ``pair_rows`` would clamp taps and the sampled result would not
    be bit-exact. Tiles with a False flag are guaranteed bit-exact under
    group-rate sampling (the basis of the framegraph's exact routing:
    clean tiles sample at group rate, escaping tiles at pixel rate).

    Uses the same footprint/anchor/window math as block_prep (via
    :func:`_footprint_ints` / :func:`_rep_min`); all integer, so the two
    agree exactly. Returns (NT,) bool."""
    return escape_tiles_hw(table.height, table.width, u, v, valid,
                           pair_rows, tile_w)


def escape_tiles_hw(h: int, w: int, u, v, valid, pair_rows,
                    tile_w: int = 128) -> jnp.ndarray:
    """:func:`escape_tiles` from a table's (height, width) alone — the
    autotune capacity probe sizes the routing passes without binding the
    table data."""
    nt, npx = u.shape
    b = BLOCK_B
    x0i, y0i, _, _ = _footprint_ints(u, v, h, w)
    ry, rx = pair_factors(pair_rows)
    rows = npx // tile_w
    hp = rows // ry

    def groups(p):
        return p.reshape(nt, hp, ry, tile_w // rx, rx)

    x0p, y0p, vp = groups(x0i), groups(y0i), groups(valid)
    xr = _rep_min(x0p, vp)
    yr = _rep_min(y0p, vp)
    bx = (xr // b) * b
    by = (yr // b) * b
    esc = None
    for i in range(ry):
        for j in range(rx):
            cx = jnp.remainder(x0p[:, :, i, :, j] - bx + w // 2, w) - w // 2
            cy = jnp.remainder(y0p[:, :, i, :, j] - by + h // 2, h) - h // 2
            inw = ((cx >= 0) & (cx <= b - 1)
                   & (cy >= 0) & (cy <= b - 1))
            e = vp[:, :, i, :, j] & ~inw
            esc = e if esc is None else (esc | e)
    return jnp.any(esc.reshape(nt, -1), axis=1)


def block_prep(table: BlockTable, u, v, pair_rows: bool = False,
               valid=None, tile_w: int = 128,
               layout: str = "pixel") -> dict:
    """XLA-side prep for in-kernel block-table blending: the per-pixel
    block-row gather + one batched transpose to (NT, 128, NPX) (taps on
    sublanes, pixels on lanes) + the footprint planes the blend needs.
    Shared by :func:`sample_table_block_pallas` and the fused sampled-
    shade kernel (ops/shading_pallas.shade_sampled_pallas).

    ``pair_rows``: pair-rate sampling (RenderSettings.pair_sampling) —
    ONE row gather per vertically-adjacent pixel pair instead of one per
    pixel. The sampling stage is gather-issue-bound
    (docs/PERFORMANCE.md), so halving the query count halves its
    dominant term. Each pair gathers at its representative pixel's
    footprint (the covered one, preferring the even row) and BOTH pixels
    re-blend at their own uv in coordinates relative to the rep's
    (B+1)² window, taps clamped to the window edge. Rep pixels stay
    bit-exact; partners are exact whenever their footprint lies inside
    the rep's window (|Δtexel| ≤ B-1-lx_rep) and edge-clamped otherwise
    — an error bounded by the pair's uv step (≈ the per-pixel texel
    rate), measured on real content in tests/test_texture_pair.py."""
    nt, npx = u.shape
    h, w = table.height, table.width
    b = BLOCK_B
    nbx = w // b
    cpad = _ceil4(len(table.present))
    x0i_p, y0i_p, tx_p, ty_p = _footprint_ints(u, v, h, w)
    x0i = x0i_p.reshape(-1)
    y0i = y0i_p.reshape(-1)
    tx = tx_p.reshape(-1)
    ty = ty_p.reshape(-1)
    if not pair_rows:
        q = table.blocks[(y0i // b) * nbx + (x0i // b)]  # (N, 128) u8
        # One batched block transpose: taps (minor 128) ↔ pixels (lanes).
        qt = jnp.transpose(q.reshape(nt, npx, 128), (0, 2, 1))
        return {
            "kind": "block",
            "qt": qt,
            "expand": 1,
            "lx": (x0i % b).reshape(nt, npx),
            "ly": (y0i % b).reshape(nt, npx),
            "tx": tx.reshape(nt, npx),
            "ty": ty.reshape(nt, npx),
            "present": table.present,
            "cpad": cpad,
        }

    ry, rx = pair_factors(pair_rows)  # rx=2 → 2×2 quads (4 px/gather)
    rows = npx // tile_w
    assert rows % ry == 0, "pair_rows needs an even tile_h"
    assert tile_w % rx == 0
    hp, wp = rows // ry, tile_w // rx

    def groups(p):  # (nt, npx) → (nt, hp, ry, wp, rx)
        return p.reshape(nt, hp, ry, wp, rx)

    x0p = groups(x0i.reshape(nt, npx))
    y0p = groups(y0i.reshape(nt, npx))
    if valid is not None:
        vp = groups(valid.reshape(nt, npx))
    else:
        vp = jnp.ones((nt, hp, ry, wp, rx), jnp.bool_)

    # Window anchor per axis (shared with escape_tiles — see _rep_min).
    xr = _rep_min(x0p, vp)  # (nt, hp, wp) window-anchor top-left texel
    yr = _rep_min(y0p, vp)
    rw = table.blocks.shape[1]  # lane-padded block-row width
    reps = ry * rx
    q = table.blocks[((yr // b) * nbx + (xr // b)).reshape(-1)]
    qt = jnp.transpose(q.reshape(nt, npx // reps, rw), (0, 2, 1))

    if layout == "member":
        # Member-major layout: qt stays at REP rate — the consumer kernel
        # expands it by concatenating `expand` lane-segment copies
        # (see member_perm) — no pixel-rate qt ever touches HBM (the XLA
        # repeat below costs ~0.6 ms at 1080p and ~2.5 ms at 4K).
        expand = reps

        def full(p):  # rep plane → member-major pixel rate
            return jnp.concatenate(
                [p.reshape(nt, npx // reps)] * reps, axis=1)

        def px_plane(p):  # pixel-order (N,) plane → member-major
            return member_perm(p.reshape(nt, npx), ry, rx, tile_w)
    else:
        expand = 1
        # Expand back to pixel rate: each pixel reads its group's row.
        qt = jnp.repeat(qt.reshape(nt, rw, hp, wp), ry, axis=2)
        if rx > 1:
            qt = jnp.repeat(qt, rx, axis=3)
        qt = qt.reshape(nt, rw, npx)

        def full(p):  # (nt, hp, wp) rep plane → (nt, npx) all members
            p = jnp.repeat(p[:, :, None, :], ry, axis=2)
            if rx > 1:
                p = jnp.repeat(p[..., None], rx, axis=4)
            return p.reshape(nt, npx)

        def px_plane(p):
            return p.reshape(nt, npx)

    # Window-relative footprint: tap col/row of each pixel's top-left
    # bilinear tap measured from its pair rep's block origin, wrapped
    # (REPEAT addressing) and clamped to the (B+1)² window.
    bx = full((xr // b) * b)
    by = full((yr // b) * b)
    cx = jnp.remainder(px_plane(x0i) - bx + w // 2, w) - w // 2
    cy = jnp.remainder(px_plane(y0i) - by + h // 2, h) - h // 2
    in_x = (cx >= 0) & (cx <= b - 1)
    in_y = (cy >= 0) & (cy <= b - 1)
    txp = px_plane(tx)
    typ = px_plane(ty)
    return {
        "kind": "block",
        "qt": qt,
        "expand": expand,
        "lx": jnp.clip(cx, 0, b - 1),
        "ly": jnp.clip(cy, 0, b - 1),
        "tx": jnp.where(in_x, txp, jnp.where(cx < 0, 0.0, 1.0)),
        "ty": jnp.where(in_y, typ, jnp.where(cy < 0, 0.0, 1.0)),
        "present": table.present,
        "cpad": cpad,
    }


def small_prep(table: QuadTable, u, v) -> dict:
    """XLA-side prep for the in-kernel small-table MXU sample: the padded
    f32 quad table + footprint planes (same contract as
    :func:`sample_rows_small_pallas`)."""
    assert table.quads.dtype == jnp.uint8, "MXU path needs u8 tables"
    rows = table.quads.shape[0]
    rows_pad = max(8, -(-rows // 8) * 8)
    texf = table.quads.astype(jnp.float32)  # integer-valued: bf16-exact
    if rows_pad != rows:
        texf = jnp.pad(texf, ((0, rows_pad - rows), (0, 0)))
    idx, tx, ty = _footprint(u, v, table.height, table.width)
    return {
        "kind": "small",
        "tex": texf,
        "idx": idx,
        "tx": tx,
        "ty": ty,
        "present": table.present,
        "cpad": table.quads.shape[1] // 4,
        "rows": rows_pad,
    }


def sample_table_block_pallas(table: BlockTable, u, v,
                              interpret: bool = False,
                              pair_rows: bool = False, valid=None,
                              tile_w: int = 128) -> dict:
    """Block-table sampling with the blend fused into one Pallas pass.

    The XLA blend (:func:`sample_table_block`) materializes each of its
    ~100 (1, N)-sliced intermediates through HBM across fusion
    boundaries, which eats the block table's 2× gather win
    (docs/PERFORMANCE.md). Here the gathered rows transpose once to
    (NT, 128, NPX) — taps on sublanes, pixels on lanes — and the whole
    25-tap × C blend runs in VMEM at full lane width. Tap products and
    their accumulation order match :func:`sample_table_block` op-for-op
    (compiled FMA fusion may differ by ≤1 ulp, the fused-raster
    tolerance class)."""
    nt, npx = u.shape
    cpad = _ceil4(len(table.present))
    prep = block_prep(table, u, v, pair_rows=pair_rows, valid=valid,
                      tile_w=tile_w,
                      layout="member" if int(pair_rows) >= 2 else "pixel")
    expand = prep.get("expand", 1)
    qt = prep["qt"]  # (nt, rw, npx // expand)
    x0i_b = prep["lx"].reshape(-1)
    y0i_b = prep["ly"].reshape(-1)
    tx = prep["tx"].reshape(-1)
    ty = prep["ty"].reshape(-1)

    g = min(BLOCK_TILE_BATCH, nt)
    nt_pad = -(-nt // g) * g

    def plane(x):
        p = x.reshape(nt, npx)
        if nt_pad != nt:
            p = jnp.pad(p, ((0, nt_pad - nt), (0, 0)))
        return p
    if nt_pad != nt:
        qt = jnp.pad(qt, ((0, nt_pad - nt), (0, 0), (0, 0)))

    n_out = len(table.present)
    kernel = functools.partial(_block_blend_kernel, cpad=cpad, n_out=n_out,
                               expand=expand)
    pspec = pl.BlockSpec((g, npx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nt_pad // g,),
        in_specs=[
            pl.BlockSpec((g, qt.shape[1], qt.shape[2]),
                         lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pspec, pspec, pspec, pspec,
        ],
        out_specs=[pspec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((nt_pad, npx), jnp.float32)]
        * n_out,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The unrolled 25-tap × C loop's stack temporaries exceed the
            # default 16 MB scoped-VMEM budget at g=16 (measured 30.2 MB);
            # v5e has 128 MB of VMEM — raise the scope instead of
            # shrinking the batch (g=4 would add ~0.5 ms of grid-step
            # overhead at 1080p).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qt, plane(x0i_b), plane(y0i_b), plane(tx), plane(ty))
    if n_out == 1 and not isinstance(out, (list, tuple)):
        out = [out]
    if expand > 1:  # member layout: outputs come back member-major
        ry, rx = pair_factors(pair_rows)
        out = [member_unperm(o, ry, rx, tile_w) for o in out]
    return {
        slot: o[:nt] for slot, o in zip(table.present, out)
    }


def pack_material_maps(material_set, index: int) -> dict:
    """Slot → uint8 map dict for one material (level-0 maps, per-map default
    fallback — createFrame material wiring, render.cpp:1598-1636)."""
    from bibim_tpu.assets.materials import PBRMapType

    def level0(t):
        return np.asarray(material_set.get_pbr_map_or_default(index, t)[0])

    alb = level0(PBRMapType.ALBEDO)
    nrm = level0(PBRMapType.NORMAL)
    return {
        "alb_r": alb[:, :, 0:1],
        "alb_g": alb[:, :, 1:2],
        "alb_b": alb[:, :, 2:3],
        "nrm_x": nrm[:, :, 0:1],
        "nrm_y": nrm[:, :, 1:2],
        "nrm_z": nrm[:, :, 2:3],
        "metallic": level0(PBRMapType.METALLIC),
        "roughness": level0(PBRMapType.ROUGHNESS),
        "ao": level0(PBRMapType.AO),
        "height": level0(PBRMapType.HEIGHT),
    }


def _footprint(u, v, h: int, w: int):
    """Bilinear footprint: flat quad index + (tx, ty) weights (planar)."""
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.remainder(x0.astype(jnp.int32), w)
    y0i = jnp.remainder(y0.astype(jnp.int32), h)
    return y0i * w + x0i, tx, ty


def _blend(qf, tx, ty, ci: int):
    """qf: per-tap channel planes indexable as qf(tap, channel)."""
    top = qf(0, ci) * (1.0 - tx) + qf(1, ci) * tx
    bot = qf(2, ci) * (1.0 - tx) + qf(3, ci) * tx
    return top * (1.0 - ty) + bot * ty


def _rows_to_f32(q) -> jnp.ndarray:
    """Gathered table rows → f32 channel layout: u8 rows cast directly;
    int32-packed rows unpack their little-endian byte lanes (exact)."""
    if q.dtype == jnp.int32:
        parts = [((q >> (8 * b)) & 0xFF).astype(jnp.float32)
                 for b in range(4)]
        return jnp.stack(parts, axis=-1).reshape(q.shape[0], -1)
    return q.astype(jnp.float32)


def sample_table_xla(table: QuadTable, u, v) -> dict:
    """One row-gather per pixel + dense tap-slice blend (large tables)."""
    shape = u.shape
    idx, tx, ty = _footprint(u.reshape(-1), v.reshape(-1),
                             table.height, table.width)
    q = _rows_to_f32(table.quads[idx]) * (1.0 / 255.0)
    cpad = q.shape[1] // 4
    w00 = ((1.0 - tx) * (1.0 - ty))[:, None]
    w01 = (tx * (1.0 - ty))[:, None]
    w10 = ((1.0 - tx) * ty)[:, None]
    w11 = (tx * ty)[:, None]
    out = (
        q[:, 0:cpad] * w00
        + q[:, cpad : 2 * cpad] * w01
        + q[:, 2 * cpad : 3 * cpad] * w10
        + q[:, 3 * cpad :] * w11
    )  # (N, C)
    return {
        slot: out[:, k].reshape(shape)
        for k, slot in enumerate(table.present)
    }


# Tiles per grid step of the small-table MXU kernel: a grid step costs
# ~2.4 µs in fixed overhead, so per-tile steps dominated at 4K (3200
# compacted tiles ≈ 8 ms before any math). Batching widens the one-hot
# matmul's N dim instead — same FLOPs, 1/8 the steps.
SMALL_TILE_BATCH = 8


def _small_kernel(idx_ref, tx_ref, ty_ref, tex_ref, *out_refs, g, tile_h,
                  tile_w, rows, cpad):
    npx = g * tile_h * tile_w
    idx = idx_ref[...].reshape(1, npx)
    tx = tx_ref[...].reshape(1, npx)
    ty = ty_ref[...].reshape(1, npx)
    oh = (
        lax.broadcasted_iota(jnp.int32, (rows, npx), 0) == idx
    ).astype(jnp.float32)
    # The table holds raw integer texel values (0..255) which are exactly
    # bf16-representable, so the default-precision MXU pass is an exact
    # select; dequantization happens after the matmul.
    taps = lax.dot_general(
        tex_ref[:, :], oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / 255.0)  # (4*C, NPX)

    def qf(tap, ci):
        j = tap * cpad + ci
        return taps[j : j + 1, :]

    for k, out in enumerate(out_refs):
        out[...] = _blend(qf, tx, ty, k).reshape(g, tile_h, tile_w)


def sample_rows_small_pallas(quads: jnp.ndarray, idx, tx, ty,
                             tile_h: int, tile_w: int, present: tuple,
                             interpret: bool = False) -> dict:
    """Gather-free row select + bilinear blend on the MXU for quad tables
    with ≤ SMALL_ROWS rows. ``idx``/``tx``/``ty`` are (NT, NPX) planar
    (precomputed footprints — callers handle REPEAT wrap, mip offsets,
    material routing)."""
    nt, npx = idx.shape
    rows = quads.shape[0]
    rows_pad = max(8, -(-rows // 8) * 8)
    assert quads.dtype == jnp.uint8, "MXU path needs u8 tables"
    texf = quads.astype(jnp.float32)  # integer-valued: bf16-exact
    if rows_pad != rows:
        texf = jnp.pad(texf, ((0, rows_pad - rows), (0, 0)))
    cpad = quads.shape[1] // 4

    g = min(SMALL_TILE_BATCH, nt)
    nt_pad = -(-nt // g) * g
    if nt_pad != nt:
        # Padded tiles re-blend row 0 — sliced off below.
        pad = ((0, nt_pad - nt), (0, 0))
        idx = jnp.pad(idx, pad)
        tx = jnp.pad(tx, pad)
        ty = jnp.pad(ty, pad)

    kernel = functools.partial(
        _small_kernel, g=g, tile_h=tile_h, tile_w=tile_w, rows=rows_pad,
        cpad=cpad,
    )
    plane_spec = pl.BlockSpec((g, tile_h, tile_w), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nt_pad // g,),
        in_specs=[
            plane_spec,
            plane_spec,
            plane_spec,
            pl.BlockSpec((rows_pad, 4 * cpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[plane_spec] * len(present),
        out_shape=[jax.ShapeDtypeStruct((nt_pad, tile_h, tile_w),
                                        jnp.float32)]
        * len(present),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        idx.reshape(nt_pad, tile_h, tile_w),
        tx.reshape(nt_pad, tile_h, tile_w),
        ty.reshape(nt_pad, tile_h, tile_w),
        texf,
    )
    if len(present) == 1 and not isinstance(out, (list, tuple)):
        out = [out]
    return {
        slot: plane.reshape(nt_pad, npx)[:nt]
        for slot, plane in zip(present, out)
    }


def sample_table_small_pallas(table: QuadTable, u, v, tile_h: int,
                              tile_w: int, interpret: bool = False) -> dict:
    """Gather-free small-table sampling: one-hot texel select on the MXU.

    ``u``/``v`` are (NT, NPX) planar; returns slot → (NT, NPX) planes."""
    idx, tx, ty = _footprint(u, v, table.height, table.width)
    return sample_rows_small_pallas(table.quads, idx, tx, ty, tile_h,
                                    tile_w, table.present,
                                    interpret=interpret)


def sample_material(tables: tuple, u, v, tile_h: int = 8, tile_w: int = 128,
                    use_pallas: bool | None = None,
                    interpret: bool = False,
                    pair_rows: bool = False, valid=None) -> dict:
    """Sample all slots of a grouped material at planar (NT, NPX) uv.

    Returns a dict with every SLOTS entry (missing slots default to 0,
    matching the reference's neutral-texel fallback handled upstream in
    materials.py). Small tables use the MXU path on TPU. ``pair_rows``
    applies pair-rate sampling to the block-table groups (see
    :func:`block_prep`); small/quad groups always sample per pixel."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    out = {}
    for table in tables:
        if isinstance(table, BlockTable):
            if use_pallas:
                out.update(sample_table_block_pallas(
                    table, u, v, interpret=interpret,
                    pair_rows=pair_rows, valid=valid, tile_w=tile_w))
            else:
                out.update(sample_table_block(
                    table, u, v, pair_rows=pair_rows, valid=valid,
                    tile_w=tile_w))
            continue
        rows = table.height * table.width
        if use_pallas and rows <= SMALL_ROWS:
            out.update(
                sample_table_small_pallas(table, u, v, tile_h, tile_w,
                                          interpret=interpret)
            )
        else:
            out.update(sample_table_xla(table, u, v))
    for slot in SLOTS:
        out.setdefault(slot, jnp.zeros_like(u))
    return out


# ---------------------------------------------------------------------------
# Mip-chain (trilinear) quad tables — the fast path for the additive mip
# capability (BASELINE config 2). Same quad-row trick per mip level; a
# trilinear sample costs TWO row gathers per pixel per size group (levels
# l and l+1) plus dense blending. LOD uses GPU-style 2×2 pixel-quad
# derivatives computed directly on the tiled-planar layout.
# ---------------------------------------------------------------------------


class MipQuadTable(NamedTuple):
    """Quad-row tables for every mip level of one size group, concatenated
    flat. Level geometry is static (python ints) so per-pixel level
    selection is an unrolled vector select — no index tables, no gathers."""

    quads: jnp.ndarray  # (total_rows, 4*C) u8, or (total_rows, 13*C)
    # when ``paired`` (own 2x2 quad + parent-level 3x3 block)
    heights: tuple  # per-level, static
    widths: tuple
    offsets: tuple  # per-level flat row offset, static
    present: tuple
    paired: bool = False  # rows carry the parent block: a trilinear
    # sample costs ONE row gather instead of two


jax.tree_util.register_pytree_node(
    MipQuadTable,
    lambda t: ((t.quads,), (t.heights, t.widths, t.offsets, t.present,
                            t.paired)),
    lambda aux, ch: MipQuadTable(ch[0], *aux),
)


def build_mip_quad_tables(mip_maps: dict) -> tuple:
    """``mip_maps``: slot → list of (H_l, W_l, ≥1) uint8 mip levels (level 0
    first). Slots group by level-0 resolution (pyramids of equal base size
    have equal sizes at every level)."""
    groups: dict = {}
    for slot, mips in mip_maps.items():
        key = (int(mips[0].shape[0]), int(mips[0].shape[1]))
        groups.setdefault(key, {})[slot] = mips

    tables = []
    for (h0, w0), slot_mips in sorted(groups.items()):
        present = tuple(sorted(slot_mips, key=SLOTS.index))
        cpad = _ceil4(len(present))
        levels = len(next(iter(slot_mips.values())))
        paired = levels > 1
        heights, widths, offsets, parts = [], [], [], []
        texs = []
        for li in range(levels):
            any_level = next(iter(slot_mips.values()))[li]
            h, w = int(any_level.shape[0]), int(any_level.shape[1])
            tex = np.zeros((h, w, cpad), np.uint8)
            for k, slot in enumerate(present):
                img = slot_mips[slot][li]
                tex[:, :, k] = img[:, :, 0] if img.ndim == 3 else img
            texs.append(tex)
        off = 0
        for li, tex in enumerate(texs):
            h, w = tex.shape[:2]
            t01 = np.roll(tex, -1, axis=1)
            t10 = np.roll(tex, -1, axis=0)
            t11 = np.roll(t01, -1, axis=0)
            own = np.concatenate([tex, t01, t10, t11], axis=-1)
            if paired:
                # Parent-level 3x3 block anchored at ((y-1)>>1, (x-1)>>1)
                # per child texel: the parent bilinear footprint of any
                # sub-texel position within the child texel lies inside
                # it, so a trilinear sample needs only THIS row.
                if li + 1 < levels:
                    par = texs[li + 1]
                    h2, w2 = par.shape[:2]
                    ay = ((np.arange(h) - 1) >> 1)[:, None]
                    ax = ((np.arange(w) - 1) >> 1)[None, :]
                    blocks = [
                        par[(ay + j) % h2, (ax + i) % w2]
                        for j in range(3) for i in range(3)
                    ]
                    pblk = np.concatenate(blocks, axis=-1)
                else:  # last level: frac is forced to 0, block unused
                    pblk = np.zeros((h, w, 9 * cpad), np.uint8)
                own = np.concatenate([own, pblk], axis=-1)
            parts.append(own.reshape(h * w, -1))
            heights.append(h)
            widths.append(w)
            offsets.append(off)
            off += h * w
        tables.append(
            MipQuadTable(
                quads=jnp.asarray(np.concatenate(parts, axis=0)),
                heights=tuple(heights),
                widths=tuple(widths),
                offsets=tuple(offsets),
                present=present,
                paired=paired,
            )
        )
    return tuple(tables)


def _quad_diffs_planar(x, tile_h: int, tile_w: int):
    """2×2 pixel-quad screen-space differences of one tiled-planar
    (NT, NPX) plane — the GPU derivative model (quad-constant; tiles
    start on even pixel coordinates, so the 2×2 quads coincide with
    image-space quads). Returns (d/dx, d/dy) planes."""
    nt, npx = x.shape
    a = x.reshape(nt, tile_h // 2, 2, tile_w // 2, 2)
    dx = a[..., 1:2] - a[..., 0:1]  # (nt, th/2, 2, tw/2, 1)
    dx = jnp.broadcast_to(dx, a.shape).reshape(nt, npx)
    dy = a[:, :, 1:2] - a[:, :, 0:1]  # (nt, th/2, 1, tw/2, 2)
    dy = jnp.broadcast_to(dy, a.shape).reshape(nt, npx)
    return dx, dy


def quad_lod_planar(u, v, tile_h: int, tile_w: int, tex_h: int,
                    tex_w: int):
    """Per-pixel LOD from 2×2 pixel-quad uv differences on tiled-planar
    (NT, NPX) arrays, matching ops.texture.quad_uv_lod's image-space
    formulation."""
    du_dx, du_dy = _quad_diffs_planar(u, tile_h, tile_w)
    dv_dx, dv_dy = _quad_diffs_planar(v, tile_h, tile_w)
    w = jnp.float32(tex_w)
    h = jnp.float32(tex_h)
    rho_x = jnp.sqrt((du_dx * w) ** 2 + (dv_dx * h) ** 2)
    rho_y = jnp.sqrt((du_dy * w) ** 2 + (dv_dy * h) ** 2)
    rho = jnp.maximum(rho_x, rho_y)
    lod = jnp.log2(jnp.maximum(rho, 1e-12))
    return jnp.maximum(lod, 0.0)


def aniso_uv_steps(u, v, tile_h: int, tile_w: int):
    """Per-pixel MAJOR-axis uv footprint vector from the quad
    derivatives: the longer of the pixel's two screen-axis uv deltas.
    N-tap in-level-0 anisotropic sampling (the opt-in approximation of
    the reference's maxAnisotropy=16 sampler state, render.cpp:1355-1358)
    averages bilinear taps at uv + t·(du, dv), t = (i+½)/N − ½ — one
    footprint-spanning line of taps along the axis minification elongates.
    uv-space (not texel-space) lengths pick the axis, which agrees with
    texel-space whenever a material's maps share their aspect (the PBR
    sets do); exactness is not required — the filter itself is
    implementation-defined in Vulkan."""
    du_dx, du_dy = _quad_diffs_planar(u, tile_h, tile_w)
    dv_dx, dv_dy = _quad_diffs_planar(v, tile_h, tile_w)
    pick_x = (du_dx * du_dx + dv_dx * dv_dx
              >= du_dy * du_dy + dv_dy * dv_dy)
    return (jnp.where(pick_x, du_dx, du_dy),
            jnp.where(pick_x, dv_dx, dv_dy))



def _sample_paired(quads, cpad, h, w, off, uf, vf, frac):
    """ONE-gather trilinear: rows are [own 2x2 quad (4C) | parent 3x3
    block (9C)]. ``h``/``w``/``off`` are the selected level's dims/offset
    as flat planes; ``frac`` is the level blend (0 at the last level —
    its stored parent block is zeros)."""
    fx = uf * w - 0.5
    fy = vf * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    wi = w.astype(jnp.int32)
    hi = h.astype(jnp.int32)
    x0i = jnp.remainder(x0.astype(jnp.int32), wi)
    y0i = jnp.remainder(y0.astype(jnp.int32), hi)
    q = _rows_to_f32(quads[off + y0i * wi + x0i]) * (1.0 / 255.0)

    w00 = ((1.0 - tx) * (1.0 - ty))[:, None]
    w01 = (tx * (1.0 - ty))[:, None]
    w10 = ((1.0 - tx) * ty)[:, None]
    w11 = (tx * ty)[:, None]
    own = (q[:, 0:cpad] * w00 + q[:, cpad:2 * cpad] * w01
           + q[:, 2 * cpad:3 * cpad] * w10 + q[:, 3 * cpad:4 * cpad] * w11)

    # Parent footprint recomputed from uv; its 2x2 taps always lie inside
    # the stored 3x3 block anchored at ((x0-1)>>1, (y0-1)>>1).
    w2 = jnp.maximum(wi // 2, 1).astype(jnp.float32)
    h2 = jnp.maximum(hi // 2, 1).astype(jnp.float32)
    fx2 = uf * w2 - 0.5
    fy2 = vf * h2 - 0.5
    x02 = jnp.floor(fx2)
    y02 = jnp.floor(fy2)
    tx2 = fx2 - x02
    ty2 = fy2 - y02
    dx1 = (jnp.clip(x02.astype(jnp.int32)
                    - ((x0.astype(jnp.int32) - 1) >> 1), 0, 1) == 1)[:, None]
    dy1 = (jnp.clip(y02.astype(jnp.int32)
                    - ((y0.astype(jnp.int32) - 1) >> 1), 0, 1) == 1)[:, None]
    base = 4 * cpad

    def p(j, i):
        c0 = base + (j * 3 + i) * cpad
        return q[:, c0:c0 + cpad]

    def tap(jj, ii):
        return jnp.where(
            dy1,
            jnp.where(dx1, p(jj + 1, ii + 1), p(jj + 1, ii)),
            jnp.where(dx1, p(jj, ii + 1), p(jj, ii)),
        )

    par = (tap(0, 0) * ((1.0 - tx2) * (1.0 - ty2))[:, None]
           + tap(0, 1) * (tx2 * (1.0 - ty2))[:, None]
           + tap(1, 0) * ((1.0 - tx2) * ty2)[:, None]
           + tap(1, 1) * (tx2 * ty2)[:, None])
    fr = frac[:, None]
    return own * (1.0 - fr) + par * fr


def sample_mip_table(table: MipQuadTable, u, v, tile_h: int,
                     tile_w: int) -> dict:
    """Trilinear sample (planar): ONE gather/pixel for paired tables,
    two for the legacy layout."""
    shape = u.shape
    row = table.quads.shape[1] * (
        4 if table.quads.dtype == jnp.int32 else 1
    )
    levels = len(table.heights)
    lod = quad_lod_planar(u, v, tile_h, tile_w,
                          table.heights[0], table.widths[0])
    l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, levels - 1)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)

    uf = u.reshape(-1)
    vf = v.reshape(-1)

    if table.paired:
        cpad = row // 13
        frac = jnp.where(l0 == levels - 1, 0.0, frac)
        lsel = l0.reshape(-1)
        h = w = off = None
        for li in range(levels):
            is_l = lsel == li
            h = jnp.where(is_l, float(table.heights[li]),
                          1.0 if h is None else h)
            w = jnp.where(is_l, float(table.widths[li]),
                          1.0 if w is None else w)
            off = jnp.where(is_l, table.offsets[li],
                            0 if off is None else off)
        out = _sample_paired(table.quads, cpad, h, w, off, uf, vf,
                             frac.reshape(-1))
        return {
            slot: out[:, k].reshape(shape)
            for k, slot in enumerate(table.present)
        }

    cpad = row // 4

    def sample_level(lsel):
        lsel = jnp.clip(lsel, 0, levels - 1).reshape(-1)
        # Static unrolled per-level constants (≤ ~12 levels): vector
        # selects, no lookup tables.
        h = w = off = None
        for li in range(levels):
            is_l = lsel == li
            h = jnp.where(is_l, float(table.heights[li]),
                          0.0 if h is None else h)
            w = jnp.where(is_l, float(table.widths[li]),
                          0.0 if w is None else w)
            off = jnp.where(is_l, table.offsets[li],
                            0 if off is None else off)
        fx = uf * w - 0.5
        fy = vf * h - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0
        wi = w.astype(jnp.int32)
        hi = h.astype(jnp.int32)
        x0i = jnp.remainder(x0.astype(jnp.int32), wi)
        y0i = jnp.remainder(y0.astype(jnp.int32), hi)
        idx = off + y0i * wi + x0i
        q = _rows_to_f32(table.quads[idx]) * (1.0 / 255.0)
        w00 = ((1.0 - tx) * (1.0 - ty))[:, None]
        w01 = (tx * (1.0 - ty))[:, None]
        w10 = ((1.0 - tx) * ty)[:, None]
        w11 = (tx * ty)[:, None]
        return (
            q[:, 0:cpad] * w00
            + q[:, cpad : 2 * cpad] * w01
            + q[:, 2 * cpad : 3 * cpad] * w10
            + q[:, 3 * cpad :] * w11
        )

    s0 = sample_level(l0)
    s1 = sample_level(l0 + 1)
    out = s0 * (1.0 - frac.reshape(-1))[:, None] + s1 * frac.reshape(-1)[
        :, None
    ]
    return {
        slot: out[:, k].reshape(shape)
        for k, slot in enumerate(table.present)
    }


def sample_material_mips(tables: tuple, u, v, tile_h: int = 8,
                         tile_w: int = 128,
                         use_pallas: bool | None = None,
                         interpret: bool = False) -> dict:
    """Sample all slots of a mip-quad material (trilinear) at planar uv.

    Single-level small groups (e.g. neutral fallback maps) have no mip
    chain to interpolate — they route through the gather-free MXU one-hot
    path instead of paying 2 row gathers per pixel."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    out = {}
    for table in tables:
        if isinstance(table, MipBlockMulti):
            zid = jnp.zeros(u.shape, jnp.int32)
            if use_pallas:
                out.update(sample_mip_block_pallas(
                    table, zid, u, v, tile_h, tile_w, interpret=interpret))
            else:
                out.update(sample_mip_block(table, zid, u, v, tile_h,
                                            tile_w))
            continue
        rows = table.quads.shape[0]
        if (use_pallas and len(table.heights) == 1 and rows <= SMALL_ROWS
                and table.quads.dtype == jnp.uint8):
            idx, tx, ty = _footprint(u, v, table.heights[0],
                                     table.widths[0])
            out.update(sample_rows_small_pallas(
                table.quads, idx, tx, ty, tile_h, tile_w, table.present,
                interpret=interpret,
            ))
        else:
            out.update(sample_mip_table(table, u, v, tile_h, tile_w))
    for slot in SLOTS:
        out.setdefault(slot, jnp.zeros_like(u))
    return out


class MipQuadMulti(NamedTuple):
    """One slot-group of mip-quad tables for SEVERAL materials, merged into
    one flat buffer. Per-pixel material routing then costs zero extra
    gathers: the material id only selects (static, unrolled) level
    geometry + offsets. Built by :func:`merge_mip_quad_materials`."""

    quads: jnp.ndarray  # (total_rows, 4*C) u8 (13*C when paired)
    heights: tuple  # [mat][level], static
    widths: tuple
    offsets: tuple  # [mat][level] flat row offsets, static
    present: tuple
    paired: bool = False  # see MipQuadTable.paired


jax.tree_util.register_pytree_node(
    MipQuadMulti,
    lambda t: ((t.quads,), (t.heights, t.widths, t.offsets, t.present,
                            t.paired)),
    lambda aux, ch: MipQuadMulti(ch[0], *aux),
)


def merge_mip_quad_materials(materials: tuple) -> tuple:
    """Merge a tuple of per-material MipQuadTable tuples into MipQuadMulti
    groups. Requires every material to partition slots identically (true
    whenever they come from the same builder); raises otherwise."""
    by_present = [
        {t.present: t for t in mat_tables} for mat_tables in materials
    ]
    keys = set(by_present[0])
    for bp in by_present[1:]:
        if set(bp) != keys:
            raise ValueError(
                "materials partition slots differently — cannot merge "
                f"({sorted(keys)} vs {sorted(bp)})"
            )
    merged = []
    for present in sorted(keys):
        tabs = [bp[present] for bp in by_present]
        paired = {t.paired for t in tabs}
        if len(paired) != 1:
            raise ValueError(
                f"slot group {present}: cannot merge single-level and "
                "multi-level materials (paired row layouts differ) — give "
                "every material the same mip chain depth"
            )
        heights, widths, offsets, parts = [], [], [], []
        base = 0
        for t in tabs:
            heights.append(t.heights)
            widths.append(t.widths)
            offsets.append(tuple(o + base for o in t.offsets))
            parts.append(t.quads)
            base += t.quads.shape[0]
        merged.append(
            MipQuadMulti(
                quads=jnp.concatenate(parts, axis=0),
                heights=tuple(heights),
                widths=tuple(widths),
                offsets=tuple(offsets),
                present=present,
                paired=paired.pop(),
            )
        )
    return tuple(merged)


def sample_mip_multi(table: MipQuadMulti, mat_id, u, v, tile_h: int,
                     tile_w: int) -> dict:
    """Trilinear sample with per-pixel material routing: still 2 gathers
    per pixel — material selection is unrolled static geometry selects."""
    shape = u.shape
    cpad = table.quads.shape[1] * (
        4 if table.quads.dtype == jnp.int32 else 1
    ) // 4
    n_mats = len(table.heights)

    def sel_by_mat(values):
        out = None
        for mi in range(n_mats):
            val = values[mi]
            out = val if out is None else jnp.where(mat_id == mi, val, out)
        return out

    lod = None
    for mi in range(n_mats):
        l = quad_lod_planar(u, v, tile_h, tile_w,
                            table.heights[mi][0], table.widths[mi][0])
        lod = l if lod is None else jnp.where(mat_id == mi, l, lod)
    max_level = sel_by_mat(
        [jnp.int32(len(h) - 1) for h in table.heights]
    )
    l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, max_level)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)

    uf, vf = u.reshape(-1), v.reshape(-1)
    matf = mat_id.reshape(-1)

    if table.paired:
        cpad = table.quads.shape[1] * (
            4 if table.quads.dtype == jnp.int32 else 1
        ) // 13
        frac = jnp.where(l0 == max_level, 0.0, frac)
        lsel = l0.reshape(-1)
        h = w = off = None
        for mi in range(n_mats):
            is_m = matf == mi
            for li in range(len(table.heights[mi])):
                is_ml = is_m & (lsel == li)
                h = jnp.where(is_ml, float(table.heights[mi][li]),
                              1.0 if h is None else h)
                w = jnp.where(is_ml, float(table.widths[mi][li]),
                              1.0 if w is None else w)
                off = jnp.where(is_ml, table.offsets[mi][li],
                                0 if off is None else off)
        out = _sample_paired(table.quads, cpad, h, w, off, uf, vf,
                             frac.reshape(-1))
        return {
            slot: out[:, k].reshape(shape)
            for k, slot in enumerate(table.present)
        }

    def sample_level(lsel):
        lsel = jnp.minimum(lsel, max_level).reshape(-1)
        h = w = off = None
        for mi in range(n_mats):
            is_m = matf == mi
            for li in range(len(table.heights[mi])):
                is_ml = is_m & (lsel == li)
                h = jnp.where(is_ml, float(table.heights[mi][li]),
                              1.0 if h is None else h)
                w = jnp.where(is_ml, float(table.widths[mi][li]),
                              1.0 if w is None else w)
                off = jnp.where(is_ml, table.offsets[mi][li],
                                0 if off is None else off)
        fx = uf * w - 0.5
        fy = vf * h - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx, ty = fx - x0, fy - y0
        wi = w.astype(jnp.int32)
        hi = h.astype(jnp.int32)
        x0i = jnp.remainder(x0.astype(jnp.int32), wi)
        y0i = jnp.remainder(y0.astype(jnp.int32), hi)
        q = _rows_to_f32(table.quads[off + y0i * wi + x0i]) * (1.0 / 255.0)
        w00 = ((1.0 - tx) * (1.0 - ty))[:, None]
        w01 = (tx * (1.0 - ty))[:, None]
        w10 = ((1.0 - tx) * ty)[:, None]
        w11 = (tx * ty)[:, None]
        return (
            q[:, 0:cpad] * w00
            + q[:, cpad : 2 * cpad] * w01
            + q[:, 2 * cpad : 3 * cpad] * w10
            + q[:, 3 * cpad :] * w11
        )

    s0 = sample_level(l0)
    s1 = sample_level(l0 + 1)
    fr = frac.reshape(-1)[:, None]
    out = s0 * (1.0 - fr) + s1 * fr
    return {
        slot: out[:, k].reshape(shape)
        for k, slot in enumerate(table.present)
    }


# ---------------------------------------------------------------------------
# Mip BLOCK tables — one gather per TRILINEAR sample in the fast row
# regime. The paired MipQuad layout above already reached one gather per
# sample, but its table has one row per TEXEL (1.7M rows for a 1024²
# two-material albedo group — the slow >2^20 gather regime, ~11 ns/row
# random) and its 52-byte rows blend on (N, C) slices at 4/128-lane
# occupancy. Here one u8 row per 4×4 texel block of each level carries:
#   - the (B+1)² = 5×5 wrap-correct CHILD neighborhood (any bilinear
#     footprint whose top-left tap lies in the block), and
#   - the covering 4×4 PARENT-level neighborhood (the parent bilinear
#     footprint of any uv inside the block spans parent texels
#     [2bx−1, 2bx+3) × [2by−1, 2by+3) — see mip_block_prep),
# so a full trilinear sample = ONE row gather; row count drops 16× into
# the ≤2^19 fast regime and the 41-tap blend runs full-lane in Pallas
# (taps on sublanes, pixels on lanes — the level-0 BlockTable pattern).
# Channel stride is exact (len(present), not ceil4): 3 channels × 41
# taps = 123 B → one 128 B lane row.
# ---------------------------------------------------------------------------

MB_B = 4  # texels per block edge
MB_S = MB_B + 1  # child taps per axis
MB_P = 4  # parent taps per axis
MB_TAPS = MB_S * MB_S + MB_P * MB_P  # 41


class MipBlockMulti(NamedTuple):
    """Neighborhood-block mip tables for one slot group of one or more
    materials, merged flat. Static per-(material, level) geometry makes
    level + material routing unrolled vector selects; ``offsets`` are
    BLOCK-row offsets. ``last_parent[mat]`` says whether the deepest
    built level still has a real parent level stored (pyramids deeper
    than the last 4-divisible level), i.e. whether frac may stay > 0
    there."""

    blocks: jnp.ndarray  # (total_blocks, row_bytes) u8, row_bytes % 128 == 0
    heights: tuple  # [mat][level], static (built levels only)
    widths: tuple
    offsets: tuple  # [mat][level] flat block-row offsets, static
    present: tuple
    last_parent: tuple  # [mat] bool, static


jax.tree_util.register_pytree_node(
    MipBlockMulti,
    lambda t: ((t.blocks,), (t.heights, t.widths, t.offsets, t.present,
                             t.last_parent)),
    lambda aux, ch: MipBlockMulti(ch[0], *aux),
)


def _build_mip_block_group(texs: list, present: tuple) -> MipBlockMulti:
    """Pack one material's mip pyramid (list of (h, w, cs) u8 texel
    images, level 0 first) into block rows. Levels are built while the
    dims stay 4-divisible AND each next level exactly halves (the
    remaining tail of the pyramid is reachable only through the last
    built level's stored parent taps)."""
    cs = len(present)
    row_bytes = -(-(MB_TAPS * cs) // 128) * 128
    heights, widths, offsets, parts = [], [], [], []
    off = 0
    for li, tex in enumerate(texs):
        h, w = tex.shape[:2]
        if h % MB_B or w % MB_B or h < MB_B or w < MB_B:
            break
        has_next = li + 1 < len(texs)
        if has_next and texs[li + 1].shape[:2] != (h // 2, w // 2):
            raise ValueError("mip pyramid must halve exactly per level "
                             f"({texs[li + 1].shape[:2]} after ({h}, {w}))")
        nby, nbx = h // MB_B, w // MB_B
        ay = (np.arange(nby) * MB_B)[:, None]
        ax = (np.arange(nbx) * MB_B)[None, :]
        taps = [tex[(ay + j) % h, (ax + i) % w]
                for j in range(MB_S) for i in range(MB_S)]
        if has_next:
            par = texs[li + 1]
            h2, w2 = par.shape[:2]
            py = (np.arange(nby) * 2 - 1)[:, None]
            px = (np.arange(nbx) * 2 - 1)[None, :]
            taps += [par[(py + j) % h2, (px + i) % w2]
                     for j in range(MB_P) for i in range(MB_P)]
        else:  # true last level: frac is forced to 0, block unused
            taps += [np.zeros((nby, nbx, cs), np.uint8)] * (MB_P * MB_P)
        raw = np.concatenate(taps, axis=-1).reshape(nby * nbx, MB_TAPS * cs)
        if raw.shape[1] != row_bytes:
            raw = np.pad(raw, ((0, 0), (0, row_bytes - raw.shape[1])))
        parts.append(raw)
        heights.append(h)
        widths.append(w)
        offsets.append(off)
        off += nby * nbx
    if not parts:
        raise ValueError("mip block tables need a ≥4×4, 4-divisible base")
    last_parent = len(heights) < len(texs)
    return MipBlockMulti(
        blocks=jnp.asarray(np.concatenate(parts, axis=0)),
        heights=(tuple(heights),),
        widths=(tuple(widths),),
        offsets=(tuple(offsets),),
        present=present,
        last_parent=(last_parent,),
    )


def build_mip_block_tables(mip_maps: dict) -> tuple:
    """Like :func:`build_mip_quad_tables` but producing MipBlockMulti
    groups (single-material). Groups whose base is too small for blocks
    (< 4×4) fall back to the quad layout (the MXU small path serves them
    anyway)."""
    groups: dict = {}
    for slot, mips in mip_maps.items():
        key = (int(mips[0].shape[0]), int(mips[0].shape[1]))
        groups.setdefault(key, {})[slot] = mips

    tables = []
    for (h0, w0), slot_mips in sorted(groups.items()):
        present = tuple(sorted(slot_mips, key=SLOTS.index))
        levels = len(next(iter(slot_mips.values())))
        if h0 % MB_B or w0 % MB_B or h0 < MB_B or w0 < MB_B or levels == 1:
            tables.extend(build_mip_quad_tables(
                {s: slot_mips[s] for s in present}))
            continue
        cs = len(present)
        texs = []
        for li in range(levels):
            any_level = next(iter(slot_mips.values()))[li]
            h, w = int(any_level.shape[0]), int(any_level.shape[1])
            tex = np.zeros((h, w, cs), np.uint8)
            for k, slot in enumerate(present):
                img = slot_mips[slot][li]
                tex[:, :, k] = img[:, :, 0] if img.ndim == 3 else img
            texs.append(tex)
        tables.append(_build_mip_block_group(texs, present))
    return tuple(tables)


def merge_mip_block_materials(materials: tuple) -> tuple:
    """Merge per-material tuples of MipBlockMulti / MipQuadTable groups
    (from :func:`build_mip_block_tables`) into multi-material groups.
    Quad-layout groups merge via :func:`merge_mip_quad_materials`."""
    by_present = [
        {t.present: t for t in mat_tables} for mat_tables in materials
    ]
    keys = set(by_present[0])
    for bp in by_present[1:]:
        if set(bp) != keys:
            raise ValueError(
                "materials partition slots differently — cannot merge "
                f"({sorted(keys)} vs {sorted(bp)})"
            )
    merged = []
    quad_groups = []
    for present in sorted(keys):
        tabs = [bp[present] for bp in by_present]
        kinds = {type(t) for t in tabs}
        if kinds == {MipQuadTable}:
            quad_groups.append(tabs)
            continue
        if kinds != {MipBlockMulti}:
            raise ValueError(
                f"slot group {present}: mixed block/quad layouts across "
                "materials — give every material the same builder"
            )
        heights, widths, offsets, last_parent, parts = [], [], [], [], []
        base = 0
        for t in tabs:
            assert len(t.heights) == 1, "merge inputs are single-material"
            heights.append(t.heights[0])
            widths.append(t.widths[0])
            offsets.append(tuple(o + base for o in t.offsets[0]))
            last_parent.append(t.last_parent[0])
            parts.append(t.blocks)
            base += t.blocks.shape[0]
        rb = {p.shape[1] for p in parts}
        if len(rb) != 1:
            raise ValueError("row-byte widths differ across materials")
        merged.append(MipBlockMulti(
            blocks=jnp.concatenate(parts, axis=0),
            heights=tuple(heights),
            widths=tuple(widths),
            offsets=tuple(offsets),
            present=present,
            last_parent=tuple(last_parent),
        ))
    if quad_groups:
        merged.extend(merge_mip_quad_materials(tuple(
            tuple(g[m] for g in quad_groups)
            for m in range(len(materials))
        )))
    return tuple(merged)


def _mip_block_geometry(table: MipBlockMulti, mat_id, u, v, tile_h: int,
                        tile_w: int) -> dict:
    """Per-pixel footprint planes for block-row trilinear sampling: the
    gather index plus everything the 41-tap blend needs. All (NT, NPX).

    Parent-tap indices: child block bx covers texels [4bx, 4bx+4), so
    fx ∈ [4bx, 4bx+4) and the parent coordinate fx2 = fx/2 − 0.25 has
    x02 = floor(fx2) ∈ {2bx−1, 2bx, 2bx+1}; taps x02, x02+1 lie in the
    stored [2bx−1, 2bx+3) window. With w even, x02 mod w2 ≡ the same
    residue regardless of REPEAT wraps, so pxi = (x02 − (2bx−1)) mod w2
    ∈ {0, 1, 2} indexes the stored window exactly (stored taps are
    themselves wrapped, so tiny parent levels alias correctly)."""
    n_mats = len(table.heights)

    lod = None
    for mi in range(n_mats):
        l = quad_lod_planar(u, v, tile_h, tile_w,
                            table.heights[mi][0], table.widths[mi][0])
        lod = l if lod is None else jnp.where(mat_id == mi, l, lod)
    max_level = None
    for mi in range(n_mats):
        ml = jnp.int32(len(table.heights[mi]) - 1)
        max_level = ml if max_level is None else jnp.where(
            mat_id == mi, ml, max_level)
    l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, max_level)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)
    # At the deepest built level, frac blends into the stored parent taps
    # when the pyramid continues past the built chain; a true last level
    # stores zero parent taps and forces frac to 0 (MipQuadTable rule).
    at_last = l0 == max_level
    no_parent = None
    for mi in range(n_mats):
        flag = jnp.bool_(not table.last_parent[mi])
        no_parent = flag if no_parent is None else jnp.where(
            mat_id == mi, flag, no_parent)
    frac = jnp.where(at_last & no_parent, 0.0, frac)

    h = w = off = nbx = None
    for mi in range(n_mats):
        is_m = mat_id == mi
        for li in range(len(table.heights[mi])):
            is_ml = is_m & (l0 == li)
            h = jnp.where(is_ml, float(table.heights[mi][li]),
                          1.0 if h is None else h)
            w = jnp.where(is_ml, float(table.widths[mi][li]),
                          1.0 if w is None else w)
            off = jnp.where(is_ml, table.offsets[mi][li],
                            0 if off is None else off)
            nbx = jnp.where(is_ml, table.widths[mi][li] // MB_B,
                            1 if nbx is None else nbx)

    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    wi = w.astype(jnp.int32)
    hi = h.astype(jnp.int32)
    x0i = jnp.remainder(x0.astype(jnp.int32), wi)
    y0i = jnp.remainder(y0.astype(jnp.int32), hi)
    bx = x0i // MB_B
    by = y0i // MB_B
    idx = off + by * nbx + bx
    lx = x0i - bx * MB_B
    ly = y0i - by * MB_B

    w2i = jnp.maximum(wi // 2, 1)
    h2i = jnp.maximum(hi // 2, 1)
    fx2 = u * w2i.astype(jnp.float32) - 0.5
    fy2 = v * h2i.astype(jnp.float32) - 0.5
    x02 = jnp.floor(fx2)
    y02 = jnp.floor(fy2)
    tx2 = fx2 - x02
    ty2 = fy2 - y02
    pxi = jnp.remainder(x02.astype(jnp.int32) - (2 * bx - 1), w2i)
    pyi = jnp.remainder(y02.astype(jnp.int32) - (2 * by - 1), h2i)
    return {
        "idx": idx, "lx": lx, "ly": ly, "tx": tx, "ty": ty,
        "pxi": pxi, "pyi": pyi, "tx2": tx2, "ty2": ty2, "frac": frac,
    }


def mip_block_blend_acc(tap_of_row, g, cs: int, n_out: int):
    """41-tap trilinear blend at full VPU width (taps on sublanes, pixels
    on lanes). ``g`` is the geometry-plane dict from
    :func:`_mip_block_geometry`; ``tap_of_row(row)`` returns one u8 tap
    row castable via i32. Accumulation order matches the MipQuad oracle:
    child taps row-major (the 4 live ones add in w00/w01/w10/w11 order,
    dead taps contribute exact fp zeros), then parent taps row-major,
    then own·(1−frac) + par·frac — the _sample_paired op order."""
    lx, ly, tx, ty = g["lx"], g["ly"], g["tx"], g["ty"]
    pxi, pyi, tx2, ty2 = g["pxi"], g["pyi"], g["tx2"], g["ty2"]
    frac = g["frac"]

    def accum(base_tap, n_axis, xi, yi, txw, tyw):
        one_m_tx = 1.0 - txw
        one_m_ty = 1.0 - tyw
        acc = [None] * n_out
        for j in range(n_axis):
            wy = (jnp.where(yi == j, one_m_ty, 0.0)
                  + jnp.where(yi + 1 == j, tyw, 0.0))
            for i in range(n_axis):
                wx = (jnp.where(xi == i, one_m_tx, 0.0)
                      + jnp.where(xi + 1 == i, txw, 0.0))
                wgt = wx * wy
                for c in range(n_out):
                    row = (base_tap + j * n_axis + i) * cs + c
                    tap = tap_of_row(row).astype(jnp.int32).astype(
                        jnp.float32) * (1.0 / 255.0)
                    term = tap * wgt
                    acc[c] = term if acc[c] is None else acc[c] + term
        return acc

    own = accum(0, MB_S, lx, ly, tx, ty)
    par = accum(MB_S * MB_S, MB_P, pxi, pyi, tx2, ty2)
    one_m_fr = 1.0 - frac
    return [own[c] * one_m_fr + par[c] * frac for c in range(n_out)]


def sample_mip_block(table: MipBlockMulti, mat_id, u, v, tile_h: int,
                     tile_w: int) -> dict:
    """XLA reference path for block-row trilinear sampling (CPU fallback
    and the Pallas kernel's oracle). Same gather, same blend op order —
    the tap rows are (N,) slices of the transposed gathered rows."""
    g = _mip_block_geometry(table, mat_id, u, v, tile_h, tile_w)
    q = table.blocks[g["idx"].reshape(-1)]  # (N, row_bytes) u8
    qt = q.T  # (row_bytes, N)
    shape = u.shape
    gp = {k: v2.reshape(-1) for k, v2 in g.items()}
    acc = mip_block_blend_acc(
        lambda row: qt[row], gp, len(table.present), len(table.present)
    )
    return {
        slot: acc[k].reshape(shape)
        for k, slot in enumerate(table.present)
    }


def mip_block_prep(table: MipBlockMulti, mat_id, u, v, tile_h: int,
                   tile_w: int) -> dict:
    """XLA-side prep for in-kernel block trilinear blending: the gather +
    one batched transpose to (NT, row_bytes, NPX) + the geometry planes.
    Shared by :func:`sample_mip_block_pallas` and the fused sampled-shade
    kernel (ops/shading_pallas.shade_sampled_pallas)."""
    nt, npx = u.shape
    g = _mip_block_geometry(table, mat_id, u, v, tile_h, tile_w)
    q = table.blocks[g["idx"].reshape(-1)]
    lanes = table.blocks.shape[1]
    qt = jnp.transpose(q.reshape(nt, npx, lanes), (0, 2, 1))
    out = {"kind": "mipblock", "qt": qt, "present": table.present,
           "cs": len(table.present)}
    for k in _MIP_GEOM_KEYS:
        out[k] = g[k]
    return out


_MIP_GEOM_KEYS = ("lx", "ly", "tx", "ty", "pxi", "pyi", "tx2", "ty2",
                  "frac")


def _mip_block_kernel(qt_ref, *refs, cs, n_out):
    g = {k: refs[i][...] for i, k in enumerate(_MIP_GEOM_KEYS)}
    out_refs = refs[len(_MIP_GEOM_KEYS):]
    acc = mip_block_blend_acc(
        lambda row: qt_ref[:, row, :], g, cs, n_out,
    )
    for c, out in enumerate(out_refs):
        out[...] = acc[c]


def small_prep_multi(table: MipQuadMulti, mat_id, u, v) -> dict:
    """XLA-side prep for the in-kernel small-table MXU sample of a merged
    single-level multi-material group (e.g. neutral fallback maps):
    material routing becomes a static-unrolled per-pixel row-offset
    select — same contract as :func:`small_prep`."""
    assert table.quads.dtype == jnp.uint8, "MXU path needs u8 tables"
    assert all(len(h) == 1 for h in table.heights), "single-level only"
    idx = tx = ty = None
    for mi in range(len(table.heights)):
        i_m, tx_m, ty_m = _footprint(
            u, v, table.heights[mi][0], table.widths[mi][0]
        )
        i_m = i_m + table.offsets[mi][0]
        is_m = mat_id == mi
        idx = i_m if idx is None else jnp.where(is_m, i_m, idx)
        tx = tx_m if tx is None else jnp.where(is_m, tx_m, tx)
        ty = ty_m if ty is None else jnp.where(is_m, ty_m, ty)
    rows = table.quads.shape[0]
    rows_pad = max(8, -(-rows // 8) * 8)
    texf = table.quads.astype(jnp.float32)  # integer-valued: bf16-exact
    if rows_pad != rows:
        texf = jnp.pad(texf, ((0, rows_pad - rows), (0, 0)))
    return {
        "kind": "small",
        "tex": texf,
        "idx": idx,
        "tx": tx,
        "ty": ty,
        "present": table.present,
        "cpad": table.quads.shape[1] // 4,
        "rows": rows_pad,
    }


def sample_mip_block_pallas(table: MipBlockMulti, mat_id, u, v,
                            tile_h: int, tile_w: int,
                            interpret: bool = False) -> dict:
    """Block-row trilinear sampling with the 41-tap blend fused into one
    Pallas pass (taps on sublanes, pixels on lanes — the
    sample_table_block_pallas pattern)."""
    nt, npx = u.shape
    prep = mip_block_prep(table, mat_id, u, v, tile_h, tile_w)
    qt = prep["qt"]
    lanes = qt.shape[1]

    g = min(BLOCK_TILE_BATCH, nt)
    nt_pad = -(-nt // g) * g

    def plane(x):
        p = x.reshape(nt, npx)
        if nt_pad != nt:
            p = jnp.pad(p, ((0, nt_pad - nt), (0, 0)))
        return p

    if nt_pad != nt:
        qt = jnp.pad(qt, ((0, nt_pad - nt), (0, 0), (0, 0)))

    n_out = len(table.present)
    kernel = functools.partial(_mip_block_kernel, cs=prep["cs"],
                               n_out=n_out)
    pspec = pl.BlockSpec((g, npx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nt_pad // g,),
        in_specs=[
            pl.BlockSpec((g, lanes, npx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pspec] * len(_MIP_GEOM_KEYS),
        out_specs=[pspec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((nt_pad, npx), jnp.float32)]
        * n_out,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # 41-tap unroll temporaries, same class as the 25-tap kernel.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qt, *[plane(prep[k]) for k in _MIP_GEOM_KEYS])
    if n_out == 1 and not isinstance(out, (list, tuple)):
        out = [out]
    return {
        slot: o[:nt] for slot, o in zip(table.present, out)
    }


def sample_material_mips_multi(tables: tuple, mat_id, u, v,
                               tile_h: int = 8, tile_w: int = 128,
                               use_pallas: bool | None = None,
                               interpret: bool = False) -> dict:
    """Sample merged multi-material mip-quad groups at planar uv.

    Groups where every material is single-level and the merged table is
    small route through the MXU one-hot path (material routing becomes a
    static-unrolled per-pixel row-offset select — still zero gathers)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    out = {}
    for table in tables:
        if isinstance(table, MipBlockMulti):
            if use_pallas:
                out.update(sample_mip_block_pallas(
                    table, mat_id, u, v, tile_h, tile_w,
                    interpret=interpret))
            else:
                out.update(sample_mip_block(table, mat_id, u, v, tile_h,
                                            tile_w))
            continue
        rows = table.quads.shape[0]
        single = all(len(h) == 1 for h in table.heights)
        if (use_pallas and single and rows <= SMALL_ROWS
                and table.quads.dtype == jnp.uint8):
            idx = tx = ty = None
            for mi in range(len(table.heights)):
                i_m, tx_m, ty_m = _footprint(
                    u, v, table.heights[mi][0], table.widths[mi][0]
                )
                i_m = i_m + table.offsets[mi][0]
                is_m = mat_id == mi
                idx = i_m if idx is None else jnp.where(is_m, i_m, idx)
                tx = tx_m if tx is None else jnp.where(is_m, tx_m, tx)
                ty = ty_m if ty is None else jnp.where(is_m, ty_m, ty)
            out.update(sample_rows_small_pallas(
                table.quads, idx, tx, ty, tile_h, tile_w, table.present,
                interpret=interpret,
            ))
        else:
            out.update(sample_mip_multi(table, mat_id, u, v, tile_h,
                                        tile_w))
    for slot in SLOTS:
        out.setdefault(slot, jnp.zeros_like(u))
    return out
