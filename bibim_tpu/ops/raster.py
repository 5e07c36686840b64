"""Tile-binned visibility-buffer rasterizer.

Replaces the Vulkan fixed-function rasterizer + depth test with TPU-shaped
dense math. Conventions pinned to the reference pipeline state
(createPipeline, render.cpp:1044-1178):

- clockwise front faces in the y-down framebuffer, back-face culling
  (render.cpp:1098, CullMode BACK everywhere in main.cpp)
- **reversed-Z**: depth cleared to 0 (main.cpp recordCommand clear values),
  test GREATER_OR_EQUAL (render.cpp:1121) — so the *maximum* z/w wins and
  later draws win equal-depth ties (GPU submission order)
- Vulkan viewport mapping: pixel centers at +0.5, NDC y already flipped by
  the projection matrix

Output is a *visibility buffer* — per pixel: triangle id, perspective-correct
barycentrics, depth — instead of Vulkan's immediate MRT writes. G-buffer
materialization then becomes pure gathers at pixel rate (deferred texturing),
which is the TPU-friendly formulation: the irregular scatter of rasterization
is confined to this one op, and everything downstream is dense.

Algorithm (plain-XLA path): triangle setup → bbox binning into screen tiles
(fixed per-tile candidate capacity) → per-tile candidate loop with masked
edge-function coverage and a running (depth, id, bary) merge. The same
setup/binning feeds the fused Pallas kernel (ops/fused.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class TriangleSetup(NamedTuple):
    """Per-triangle rasterization constants (all (T, ...) arrays).

    Homogeneous (clipless) formulation — Olano & Greer style 2D-homogeneous
    edge functions. Per pixel p = (px, py, 1):

      E_e(p) = A_e·px + B_e·py + C_e        (e = 0,1,2)
      inside/front ⇔ all E_e ≥ 0
      perspective-correct bary  β_e = E_e / ΣE
      depth  z_ndc = (Σ E_e z_e) / (Σ E_e w_e)   [z_e, w_e = clip coords]

    No vertex w-divide, so triangles crossing w=0 (near-plane "external"
    triangles) rasterize their visible part correctly with no polygon
    clipping — which keeps the visibility buffer's corner-id indirection
    intact for attribute interpolation.
    """

    edge_a: jnp.ndarray  # (T,3)
    edge_b: jnp.ndarray  # (T,3)
    edge_c: jnp.ndarray  # (T,3)
    z_coef: jnp.ndarray  # (T,3) (az,bz,cz): zn(p) = az·px+bz·py+cz
    w_coef: jnp.ndarray  # (T,3) (aw,bw,cw): wn(p) = aw·px+bw·py+cw
    bbox: jnp.ndarray  # (T,4) int32 [x0,y0,x1,y1] inclusive pixel bounds
    valid: jnp.ndarray  # (T,) bool
    # Conservative per-triangle NDC-depth upper bound (see PlanarSetup).
    zub: jnp.ndarray | None = None


class VisibilityBuffer(NamedTuple):
    tri_id: jnp.ndarray  # (H,W) int32, -1 = no coverage
    bary: jnp.ndarray  # (H,W,2) perspective-correct (b0, b1)
    depth: jnp.ndarray  # (H,W) reversed-Z depth (0 = far/clear)


class PlanarSetup(NamedTuple):
    """Corner-planar :class:`TriangleSetup`: every coefficient is its own
    dense (T,) plane (see ops.geometry.PlanarSoup for why — (T, 3) arrays
    run at 3/128 lane utilization; at 625k triangles the stacked setup
    alone cost ~15 ms/frame)."""

    edge_a: tuple  # (a0, a1, a2) planes
    edge_b: tuple
    edge_c: tuple
    z_coef: tuple  # (az, bz, cz) planes
    w_coef: tuple
    bbox: tuple  # (bx0, by0, bx1, by1) int32 planes
    valid: jnp.ndarray  # (T,) bool
    # Conservative per-triangle NDC-depth upper bound (reversed-Z: 1 =
    # nearest): z_ndc is screen-affine, so when every corner has w > 0
    # it is bounded by the corner max; external triangles get 1.0 (never
    # skipped). Feeds the raster kernel's early-z candidate ordering.
    zub: jnp.ndarray | None = None


def triangle_setup_planar(
    clip: tuple, width: int, height: int,
    band_y0=None, band_height: int | None = None,
) -> PlanarSetup:
    """:func:`triangle_setup` restated on corner planes — identical
    formulas (adjugate edge functions, det>0 CW-front cull, scale
    normalization, conservative external bbox), all ops dense (T,)."""
    x, y, z, w = clip  # each: (c0, c1, c2) planes

    def vh(p, c, extent):
        return (p[c] * 0.5 + w[c] * 0.5) * extent

    xh = tuple(vh(x, c, width) for c in range(3))
    yh = tuple(vh(y, c, height) for c in range(3))
    w0, w1, w2 = w

    ea = (yh[1] * w2 - yh[2] * w1, yh[2] * w0 - yh[0] * w2,
          yh[0] * w1 - yh[1] * w0)
    eb = (xh[2] * w1 - xh[1] * w2, xh[0] * w2 - xh[2] * w0,
          xh[1] * w0 - xh[0] * w1)
    ec = (xh[1] * yh[2] - xh[2] * yh[1], xh[2] * yh[0] - xh[0] * yh[2],
          xh[0] * yh[1] - xh[1] * yh[0])

    det = ec[0] * w0 + ec[1] * w1 + ec[2] * w2
    wmax = jnp.maximum(jnp.maximum(w0, w1), w2)
    valid = (det > 0.0) & (wmax > 1e-6)
    # Exact depth-range cull: inside accepted coverage (e0,e1,e2 ≥ 0) the
    # interpolated zn / zn−wn are NONNEGATIVE combinations of the corner
    # values, so all corners z < 0 (beyond far) or all corners z > w
    # (nearer than near) can never yield 0 ≤ zn ≤ wn. Without this,
    # near-plane-straddling junk (e.g. a light sphere centered on the
    # camera) floods the overflow list as conservative full-screen
    # externals — ~0.9 ms of dead coverage loops at 1080p.
    zmax = jnp.maximum(jnp.maximum(z[0], z[1]), z[2])
    zw_min = jnp.minimum(jnp.minimum(z[0] - w0, z[1] - w1), z[2] - w2)
    valid = valid & (zmax >= 0.0) & (zw_min <= 0.0)

    def max3(t):
        return jnp.maximum(jnp.maximum(jnp.abs(t[0]), jnp.abs(t[1])),
                           jnp.abs(t[2]))

    max_abs = jnp.maximum(max3(ea), jnp.maximum(max3(eb), max3(ec)))
    scale = 1.0 / jnp.maximum(max_abs, 1e-30)
    ea = tuple(e * scale for e in ea)
    eb = tuple(e * scale for e in eb)
    ec = tuple(e * scale for e in ec)

    def dot3c(e, t):
        return e[0] * t[0] + e[1] * t[1] + e[2] * t[2]

    z_coef = (dot3c(ea, z), dot3c(eb, z), dot3c(ec, z))
    w_coef = (dot3c(ea, w), dot3c(eb, w), dot3c(ec, w))

    w_ok = (w0 > 1e-6) & (w1 > 1e-6) & (w2 > 1e-6)
    inv_w = tuple(1.0 / jnp.where(w[c] == 0, 1.0, w[c]) for c in range(3))
    xs = tuple(xh[c] * inv_w[c] for c in range(3))
    ys = tuple(yh[c] * inv_w[c] for c in range(3))

    def min3(t):
        return jnp.minimum(jnp.minimum(t[0], t[1]), t[2])

    def maxv3(t):
        return jnp.maximum(jnp.maximum(t[0], t[1]), t[2])

    bx0 = jnp.where(w_ok, jnp.floor(min3(xs)), 0.0)
    bx1 = jnp.where(w_ok, jnp.ceil(maxv3(xs)), float(width - 1))
    by0 = jnp.where(w_ok, jnp.floor(min3(ys)), 0.0)
    by1 = jnp.where(w_ok, jnp.ceil(maxv3(ys)), float(height - 1))
    if band_y0 is not None:
        by0 = by0 - band_y0
        by1 = by1 - band_y0
        height = band_height if band_height is not None else height
    on_screen = (bx1 >= 0.0) & (bx0 < width) & (by1 >= 0.0) & (by0 < height)
    valid = valid & on_screen
    bbox = (
        jnp.clip(bx0, 0, width - 1).astype(jnp.int32),
        jnp.clip(by0, 0, height - 1).astype(jnp.int32),
        jnp.clip(bx1, 0, width - 1).astype(jnp.int32),
        jnp.clip(by1, 0, height - 1).astype(jnp.int32),
    )
    zub = jnp.where(
        w_ok,
        jnp.clip(maxv3(tuple(z[c] * inv_w[c] for c in range(3))), 0.0, 1.0),
        1.0,
    )
    return PlanarSetup(edge_a=ea, edge_b=eb, edge_c=ec, z_coef=z_coef,
                       w_coef=w_coef, bbox=bbox, valid=valid, zub=zub)


def triangle_setup(
    clip: jnp.ndarray, tris: jnp.ndarray, width: int, height: int,
    band_y0=None, band_height: int | None = None,
    sequential: bool = False,
) -> TriangleSetup:
    """Homogeneous triangle setup: culling, edge/depth coefficients, bbox.

    Facing/validity: with viewport-scaled homogeneous coords M = [v0 v1 v2],
    det(M) = 2·area_screen · w0·w1·w2, so det > 0 ⇔ front-facing (clockwise
    in the y-down framebuffer, render.cpp:1098) for every w-sign pattern an
    external triangle can have. Back faces and degenerates are culled by
    det ≤ 0 (CullMode BACK everywhere in main.cpp).
    """
    # De-indexed scenes (tris == arange, see batch_from_mesh): the corner
    # fetch is a free reshape instead of a T×3 row gather.
    v = clip.reshape(-1, 3, 4) if sequential else clip[tris]  # (T,3,4)
    w = v[..., 3]
    # Viewport-scaled homogeneous coords: X/W = screen x in pixels.
    xh = (v[..., 0] * 0.5 + w * 0.5) * width  # (T,3)
    yh = (v[..., 1] * 0.5 + w * 0.5) * height
    x0, x1, x2 = xh[:, 0], xh[:, 1], xh[:, 2]
    y0, y1, y2 = yh[:, 0], yh[:, 1], yh[:, 2]
    w0, w1, w2 = w[:, 0], w[:, 1], w[:, 2]

    # Edge e opposite corner e: E_e vanishes on the other two corners and is
    # positive on corner e for front-facing triangles (adjugate rows of M).
    edge_a = jnp.stack(
        [y1 * w2 - y2 * w1, y2 * w0 - y0 * w2, y0 * w1 - y1 * w0], axis=-1
    )
    edge_b = jnp.stack(
        [x2 * w1 - x1 * w2, x0 * w2 - x2 * w0, x1 * w0 - x0 * w1], axis=-1
    )
    edge_c = jnp.stack(
        [x1 * y2 - x2 * y1, x2 * y0 - x0 * y2, x0 * y1 - x1 * y0], axis=-1
    )

    det = edge_c[:, 0] * w0 + edge_c[:, 1] * w1 + edge_c[:, 2] * w2
    # Front-facing, and at least one corner in front of the camera: a
    # triangle with all w ≤ 0 is entirely behind the projection center (it
    # would otherwise survive as a conservative full-screen "external"
    # triangle and flood the overflow list).
    valid = (det > 0.0) & (jnp.max(w, axis=-1) > 1e-6)
    # Exact depth-range cull (see triangle_setup_planar): all corners
    # z < 0 or all corners z > w can never pass 0 ≤ zn ≤ wn inside
    # accepted coverage.
    zc_pre = v[..., 2]
    valid = valid & (jnp.max(zc_pre, axis=-1) >= 0.0) \
        & (jnp.min(zc_pre - w, axis=-1) <= 0.0)

    # Scale-normalize all coefficients per triangle (common factor cancels in
    # coverage, bary, and depth) to keep f32 headroom.
    max_abs = jnp.maximum(
        jnp.max(jnp.abs(edge_a), axis=-1),
        jnp.maximum(jnp.max(jnp.abs(edge_b), axis=-1), jnp.max(jnp.abs(edge_c), axis=-1)),
    )
    scale = 1.0 / jnp.maximum(max_abs, 1e-30)
    edge_a = edge_a * scale[:, None]
    edge_b = edge_b * scale[:, None]
    edge_c = edge_c * scale[:, None]

    zc = v[..., 2]  # clip z per corner
    z_coef = jnp.stack(
        [
            jnp.sum(edge_a * zc, axis=-1),
            jnp.sum(edge_b * zc, axis=-1),
            jnp.sum(edge_c * zc, axis=-1),
        ],
        axis=-1,
    )
    w_coef = jnp.stack(
        [
            jnp.sum(edge_a * w, axis=-1),
            jnp.sum(edge_b * w, axis=-1),
            jnp.sum(edge_c * w, axis=-1),
        ],
        axis=-1,
    )

    # Bounding box: projected bbox when fully in front of the camera;
    # conservative full screen for external triangles (visible region of a
    # near-plane-crossing triangle is unbounded in screen space).
    w_ok = jnp.all(w > 1e-6, axis=-1)
    inv_w = 1.0 / jnp.where(w == 0, 1.0, w)
    xs = xh * inv_w
    ys = yh * inv_w
    bx0 = jnp.where(w_ok, jnp.floor(jnp.min(xs, axis=-1)), 0.0)
    bx1 = jnp.where(w_ok, jnp.ceil(jnp.max(xs, axis=-1)), float(width - 1))
    by0 = jnp.where(w_ok, jnp.floor(jnp.min(ys, axis=-1)), 0.0)
    by1 = jnp.where(w_ok, jnp.ceil(jnp.max(ys, axis=-1)), float(height - 1))
    # Band rendering (multi-chip tile sharding): bbox in band-local rows.
    if band_y0 is not None:
        by0 = by0 - band_y0
        by1 = by1 - band_y0
        height = band_height if band_height is not None else height
    on_screen = (bx1 >= 0.0) & (bx0 < width) & (by1 >= 0.0) & (by0 < height)
    valid = valid & on_screen
    bbox = jnp.stack(
        [
            jnp.clip(bx0, 0, width - 1).astype(jnp.int32),
            jnp.clip(by0, 0, height - 1).astype(jnp.int32),
            jnp.clip(bx1, 0, width - 1).astype(jnp.int32),
            jnp.clip(by1, 0, height - 1).astype(jnp.int32),
        ],
        axis=-1,
    )

    zub = jnp.where(
        w_ok,
        jnp.clip(jnp.max(zc * inv_w, axis=-1), 0.0, 1.0),
        1.0,
    )
    return TriangleSetup(
        edge_a=edge_a,
        edge_b=edge_b,
        edge_c=edge_c,
        z_coef=z_coef,
        w_coef=w_coef,
        bbox=bbox,
        valid=valid,
        zub=zub,
    )


def bin_triangles(
    setup: TriangleSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    cap: int,
    span_cap: int = 16,
    overflow_cap: int = 64,
):
    """Bin triangle ids into screen tiles by bbox overlap (sort-based).

    Scatter-free formulation (TPU scatters are slow and the O(T·NT) overlap
    mask doesn't scale): each triangle expands to at most ``span_cap``
    (tile, tri) pairs from its bbox tile span; a stable argsort by tile id
    yields contiguous per-tile candidate ranges; a padded gather materializes
    (NT, cap) lists. Triangles spanning more than span_cap tiles (huge or
    near-plane-external ones — e.g. the 100× ground plane) go to a small
    ``overflow`` list prepended to every tile, preserving a contiguous valid
    prefix per tile.

    Returns (ids (NT, cap) int32 with -1 padding, counts (NT,) int32,
    tiles_y, tiles_x). Capacity overflow drops the latest triangles in a
    tile; ``counts`` is clamped to cap.
    """
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    nt = tiles_x * tiles_y

    tx0 = setup.bbox[:, 0] // tile_w
    ty0 = setup.bbox[:, 1] // tile_h
    tx1 = setup.bbox[:, 2] // tile_w
    ty1 = setup.bbox[:, 3] // tile_h
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    area = span_w * span_h

    small = setup.valid & (area <= span_cap)
    big = setup.valid & (area > span_cap)

    # Expand: pair k of triangle t covers tile (ty0 + k//span_w, tx0 + k%span_w).
    k = jnp.arange(span_cap, dtype=jnp.int32)
    dx = k[None, :] % span_w[:, None]
    dy = k[None, :] // span_w[:, None]
    tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
    live = small[:, None] & (k[None, :] < area[:, None])
    tile = jnp.where(live, tile, nt)  # sentinel sorts last

    flat_tile = tile.reshape(-1)
    order = jnp.argsort(flat_tile, stable=True)  # keeps tri order within tile
    sorted_tile = flat_tile[order]
    sorted_tri = (order // span_cap).astype(jnp.int32)

    boundaries = jnp.searchsorted(sorted_tile, jnp.arange(nt + 1, dtype=jnp.int32))
    starts = boundaries[:-1]  # (NT,)
    counts_small = (boundaries[1:] - starts).astype(jnp.int32)

    # Overflow triangles: cheap single nonzero over T (not NT×T).
    big_ids, = jnp.nonzero(big, size=overflow_cap, fill_value=-1)
    big_ids = big_ids.astype(jnp.int32)
    n_big = jnp.sum(big, dtype=jnp.int32)

    # Padded per-tile lists: [big 0..n_big) | small 0..counts_small) | -1 ...].
    pos = jnp.arange(cap, dtype=jnp.int32)
    small_pos = pos[None, :] - n_big  # (NT,cap) position within small range
    in_small = (small_pos >= 0) & (small_pos < counts_small[:, None])
    total = sorted_tri.shape[0]
    gather_idx = jnp.clip(starts[:, None] + small_pos, 0, total - 1)
    ids = jnp.where(
        pos[None, :] < n_big,
        big_ids[jnp.minimum(pos, overflow_cap - 1)][None, :],
        jnp.where(in_small, sorted_tri[gather_idx], -1),
    )
    counts = jnp.minimum(n_big + counts_small, cap)
    return ids, counts, tiles_y, tiles_x


def rasterize(
    clip: jnp.ndarray,
    tris: jnp.ndarray,
    width: int,
    height: int,
    tile_h: int = 64,
    tile_w: int = 128,
    cap: int = 512,
    init: VisibilityBuffer | None = None,
    viewport_height: int | None = None,
    y_origin=0,
    span_cap: int = 16,
    overflow_cap: int = 64,
) -> VisibilityBuffer:
    """Rasterize triangles to a visibility buffer (plain-XLA path).

    ``init`` continues rasterization over an existing buffer — the analog of
    a later subpass drawing with depth test against the same depth attachment
    (light spheres / gizmo overlays, main.cpp:128-171).

    Band rendering (multi-chip pixel sharding): pass the full-frame
    ``viewport_height`` plus a (possibly traced) ``y_origin``; ``height`` is
    then the band height this call rasterizes.
    """
    vp_height = viewport_height if viewport_height is not None else height
    setup = triangle_setup(
        clip, tris, width, vp_height,
        band_y0=(y_origin if viewport_height is not None else None),
        band_height=height,
    )
    ids, _counts, tiles_y, tiles_x = bin_triangles(
        setup, width, height, tile_h, tile_w, cap,
        span_cap=span_cap, overflow_cap=overflow_cap,
    )
    nt = tiles_y * tiles_x

    # Per-tile pixel-center coordinates (global frame coordinates).
    tile_row = jnp.arange(nt, dtype=jnp.int32) // tiles_x
    tile_col = jnp.arange(nt, dtype=jnp.int32) % tiles_x
    px = (
        tile_col[:, None].astype(jnp.float32) * tile_w
        + jnp.arange(tile_w, dtype=jnp.float32)[None, :]
        + 0.5
    )  # (NT, tw)
    py = (
        tile_row[:, None].astype(jnp.float32) * tile_h
        + jnp.arange(tile_h, dtype=jnp.float32)[None, :]
        + 0.5
        + jnp.asarray(y_origin, jnp.float32)
    )  # (NT, th)

    # Zeros derived from the pixel-coordinate arrays so the carry picks up
    # any mesh-axis "varying" type from a traced y_origin (shard_map bands).
    zero_v = px[:, None, :] * 0.0 + py[:, :, None] * 0.0  # (NT, th, tw)

    if init is None:
        best_z = zero_v
        best_id = zero_v.astype(jnp.int32) - 1
        best_b0 = zero_v
        best_b1 = zero_v
    else:
        pad_h, pad_w = tiles_y * tile_h, tiles_x * tile_w

        def to_tiles(img, fill):
            img = jnp.pad(
                img,
                ((0, pad_h - height), (0, pad_w - width)),
                constant_values=fill,
            )
            return (
                img.reshape(tiles_y, tile_h, tiles_x, tile_w)
                .transpose(0, 2, 1, 3)
                .reshape(nt, tile_h, tile_w)
            )

        best_z = to_tiles(init.depth, 1.0) + zero_v  # pad depth 1 → never overdrawn
        best_id = to_tiles(init.tri_id, -1) + zero_v.astype(jnp.int32)
        best_b0 = to_tiles(init.bary[..., 0], 0.0) + zero_v
        best_b1 = to_tiles(init.bary[..., 1], 0.0) + zero_v

    def body(k, carry):
        best_z, best_id, best_b0, best_b1 = carry
        tid = lax.dynamic_index_in_dim(ids, k, axis=1, keepdims=False)  # (NT,)
        live = tid >= 0
        t = jnp.where(live, tid, 0)

        ea = setup.edge_a[t]  # (NT,3)
        eb = setup.edge_b[t]
        ec = setup.edge_c[t]
        zc = setup.z_coef[t]  # (NT,3)
        wc = setup.w_coef[t]  # (NT,3)

        def plane(a, b, c):
            """a·px + b·py + c at every tile pixel → (NT, th, tw)."""
            return (
                a[:, None, None] * px[:, None, :]
                + b[:, None, None] * py[:, :, None]
                + c[:, None, None]
            )

        e0 = plane(ea[:, 0], eb[:, 0], ec[:, 0])
        e1 = plane(ea[:, 1], eb[:, 1], ec[:, 1])
        e2 = plane(ea[:, 2], eb[:, 2], ec[:, 2])
        covered = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)

        zn = plane(zc[:, 0], zc[:, 1], zc[:, 2])
        wn = plane(wc[:, 0], wc[:, 1], wc[:, 2])

        # Division-free reversed-Z GREATER_OR_EQUAL test + [0,1] depth clip
        # (near/far clipping per pixel) + wn>0 (in front of the camera).
        accept = (
            covered
            & live[:, None, None]
            & (wn > 0.0)
            & (zn >= 0.0)
            & (zn <= wn)
            & (zn >= best_z * wn)
        )

        z = zn / jnp.where(wn == 0.0, 1.0, wn)

        # Perspective-correct barycentrics: β_e = E_e / ΣE.
        esum = e0 + e1 + e2
        esum = jnp.where(esum == 0.0, 1.0, esum)
        b0 = e0 / esum
        b1 = e1 / esum

        return (
            jnp.where(accept, z, best_z),
            jnp.where(accept, t[:, None, None], best_id),
            jnp.where(accept, b0, best_b0),
            jnp.where(accept, b1, best_b1),
        )

    best_z, best_id, best_b0, best_b1 = lax.fori_loop(
        0, ids.shape[1], body, (best_z, best_id, best_b0, best_b1)
    )

    def from_tiles(tiled):
        img = (
            tiled.reshape(tiles_y, tiles_x, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(tiles_y * tile_h, tiles_x * tile_w)
        )
        return img[:height, :width]

    return VisibilityBuffer(
        tri_id=from_tiles(best_id),
        bary=jnp.stack([from_tiles(best_b0), from_tiles(best_b1)], axis=-1),
        depth=from_tiles(best_z),
    )
