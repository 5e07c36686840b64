"""Shadow mapping — BASELINE config-5 stretch capability (additive: the
reference has no shadow pass).

A directional light renders the scene depth-only through the SAME fused
raster kernel (reversed-Z orthographic light frustum fit to the scene's
world bounds), the per-frame shadow map packs into quad rows (the 2×2
neighborhood trick from ops/texture_quad), and screen pixels resolve a
bilinear-weighted PCF visibility factor with ONE row gather per pixel.

Everything stays planar; the only pixel-rate gather is the single shadow
tap (the same ~8 ns/row cost as one material group).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bibim_tpu import math3d as m3


class ShadowMap(NamedTuple):
    """Per-frame shadow resources (all traced)."""

    quads: jnp.ndarray  # (S*S, 4) f32 — [d00, d01, d10, d11] reversed-Z
    light_vp: jnp.ndarray  # (4,4) world → light clip
    size: int  # static


def _aabb_corners_view(vmin, vmax, view):
    corners = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.where(i & 1, vmax[0], vmin[0]),
                    jnp.where(i & 2, vmax[1], vmin[1]),
                    jnp.where(i & 4, vmax[2], vmin[2]),
                    jnp.asarray(1.0),
                ]
            )
            for i in range(8)
        ]
    )  # (8,4)
    cv = corners @ view.T  # (8,4) view-space
    return cv.min(axis=0), cv.max(axis=0)


def light_view_proj(light_dir, world_min, world_max, pad: float = 1.05,
                    fit_min=None, fit_max=None):
    """Orthographic light frustum fit to the scene AABB (traced bounds).

    ``light_dir`` is the direction the light travels (Light.Dir). The light
    camera looks along it from outside the scene; extents come from the 8
    AABB corners in light view space.

    ``fit_min``/``fit_max``: optional caster AABB. When given, the map's
    X/Y extents fit the CASTERS only (an ortho projection along the light
    maps a caster's shadow footprint onto its own XY footprint, so this
    loses nothing) while the Z range still spans the whole scene so every
    receiver's depth stays comparable. A huge receiver like the 100×
    ground plane otherwise dilutes the map to a few texels per caster;
    receivers outside the fitted XY resolve to fully lit in
    :func:`shadow_factor` (no caster can project there)."""
    d = light_dir / jnp.maximum(jnp.linalg.norm(light_dir), 1e-20)
    center = (world_min + world_max) * 0.5
    radius = jnp.linalg.norm(world_max - world_min) * 0.5 + 1e-3
    eye = center - d * radius * 2.0
    up = jnp.where(jnp.abs(d[1]) > 0.99,
                   jnp.asarray([1.0, 0.0, 0.0]),
                   jnp.asarray([0.0, 1.0, 0.0]))
    view = m3.look_at(eye, center, up)

    lo, hi = _aabb_corners_view(world_min, world_max, view)
    if fit_min is not None:
        lo_f, hi_f = _aabb_corners_view(fit_min, fit_max, view)
        # XY from the casters, Z from the whole scene.
        lo = jnp.concatenate([lo_f[:2], lo[2:]])
        hi = jnp.concatenate([hi_f[:2], hi[2:]])
    # Expand the fit symmetrically (shrinking positive mins would clip
    # near-light geometry out of the map).
    mid = (lo + hi) * 0.5
    half = (hi - lo) * 0.5 * pad + 1e-3
    lo = mid - half
    hi = mid + half
    proj = m3.orthographic(lo[0], hi[0], lo[1], hi[1],
                           jnp.maximum(lo[2], 1e-4), hi[2])
    return m3.matmul(proj, view)


def build_shadow_map(depth_img: jnp.ndarray, light_vp, size: int) -> ShadowMap:
    """Pack a light-view reversed-Z depth image into PCF quad rows.

    Clamp-to-edge neighborhoods (no wrap — shadow maps don't repeat)."""
    d = depth_img
    d01 = jnp.concatenate([d[:, 1:], d[:, -1:]], axis=1)
    d10 = jnp.concatenate([d[1:], d[-1:]], axis=0)
    d11 = jnp.concatenate([d10[:, 1:], d10[:, -1:]], axis=1)
    quads = jnp.stack([d, d01, d10, d11], axis=-1).reshape(size * size, 4)
    return ShadowMap(quads=quads, light_vp=light_vp, size=size)


def _light_clip(shadow: ShadowMap, world):
    """World-position planes → light clip planes (orthographic: w == 1)."""
    wx, wy, wz = world
    vp = shadow.light_vp
    cx = vp[0, 0] * wx + vp[0, 1] * wy + vp[0, 2] * wz + vp[0, 3]
    cy = vp[1, 0] * wx + vp[1, 1] * wy + vp[1, 2] * wz + vp[1, 3]
    cz = vp[2, 0] * wx + vp[2, 1] * wy + vp[2, 2] * wz + vp[2, 3]
    return cx, cy, cz


def _inside_frustum(cx, cy, cz):
    """Pixels whose light clip position falls inside the map (only these
    can be occluded; everything else resolves fully lit)."""
    return (
        (cx >= -1.0) & (cx <= 1.0) & (cy >= -1.0) & (cy <= 1.0)
        & (cz >= 0.0) & (cz <= 1.0)
    )


def shadow_factor(shadow: ShadowMap, world, bias: float = 2e-3):
    """Planar PCF visibility in [0,1] (1 = fully lit) for world-position
    planes ``world`` = (wx, wy, wz), each (NT, NPX).

    Bilinear-weighted 2×2 PCF: each tap compares the stored occluder depth
    against the pixel's light-space depth (reversed-Z: occluded when the
    map holds something strictly nearer to the light)."""
    cx, cy, cz = _light_clip(shadow, world)
    return _pcf(shadow, cx, cy, cz, bias)


def shadow_factor_compact(shadow: ShadowMap, world, valid,
                          query_tile_cap: int, bias: float = 2e-3,
                          pair: bool = False, tile_w: int = 128):
    """:func:`shadow_factor` with the pixel-rate quad gather compacted to
    the tiles whose (covered) pixels actually land inside the light
    frustum.

    With a caster-fitted map (light_view_proj fit_min/fit_max) most
    screen pixels are OUTSIDE the fitted XY and resolve fully lit with no
    map lookup — the light-clip transform + inside test run at full rate
    (cheap elementwise), the quad-row gather + bilinear PCF only on the
    ``query_tile_cap`` compacted footprint tiles (the overlay/live-tile
    top_k pattern, fused._compact_tile_list). Dead slots duplicate the
    first listed tile — idempotent under the scatter-back.

    ``pair``: PCF at PAIR rate — one quad gather per vertically-adjacent
    pixel pair at its covered-inside rep member; the partner shares the
    rep's visibility (a ≤1-px vertical shift of the smooth penumbra
    field; its own inside-frustum test still resolves it lit outside the
    map). Halves the dominant (gather-issue) term of the PCF stage.

    Returns ``(vis (NT, NPX), dropped_tiles)``; a footprint bigger than
    the cap surfaces as a non-zero drop count (dropped tiles would render
    unshadowed), validated like every other capacity."""
    from bibim_tpu.ops import fused

    cx, cy, cz = _light_clip(shadow, world)
    nt = cx.shape[0]

    def pcf(cxc, cyc, czc, vc):
        if not pair:
            return _pcf(shadow, cxc, cyc, czc, bias)
        ntc, npx = cxc.shape
        rows = npx // tile_w

        def g(p):
            return p.reshape(ntc, rows // 2, 2, tile_w)

        pref = g(_inside_frustum(cxc, cyc, czc) & vc)
        use_even = pref[:, :, 0, :] | ~pref[:, :, 1, :]

        def rep(p):
            pg = g(p)
            return jnp.where(use_even, pg[:, :, 0, :],
                             pg[:, :, 1, :]).reshape(ntc, npx // 2)

        vr = _pcf(shadow, rep(cxc), rep(cyc), rep(czc), bias)
        vis = jnp.repeat(
            vr.reshape(ntc, rows // 2, 1, tile_w), 2, axis=2
        ).reshape(ntc, npx)
        return jnp.where(_inside_frustum(cxc, cyc, czc), vis, 1.0)

    if query_tile_cap >= nt:
        return pcf(cx, cy, cz, valid), jnp.int32(0)
    live = jnp.any(_inside_frustum(cx, cy, cz) & valid, axis=1)
    ids, dropped = fused._compact_tile_list(live, query_tile_cap)
    vis_c = pcf(cx[ids], cy[ids], cz[ids], valid[ids])
    vis = jnp.ones(cx.shape, jnp.float32).at[ids].set(vis_c)
    return vis, dropped


def _pcf(shadow: ShadowMap, cx, cy, cz, bias: float):
    """Bilinear 2×2 PCF from light clip planes (one quad-row gather per
    pixel; outside-frustum pixels resolve fully lit)."""
    # NDC → texel coords.
    s = shadow.size
    fx = (cx * 0.5 + 0.5) * s - 0.5
    fy = (cy * 0.5 + 0.5) * s - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, s - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, s - 1)
    idx = y0i * s + x0i

    q = shadow.quads[idx.reshape(-1)].reshape(idx.shape + (4,))
    ref = cz + bias

    def lit(tap):
        return (q[..., tap] <= ref).astype(jnp.float32)

    top = lit(0) * (1.0 - tx) + lit(1) * tx
    bot = lit(2) * (1.0 - tx) + lit(3) * tx
    vis = top * (1.0 - ty) + bot * ty
    # Outside the light frustum (or behind it): fully lit.
    return jnp.where(_inside_frustum(cx, cy, cz), vis, 1.0)
