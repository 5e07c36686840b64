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


def light_view_proj(light_dir, world_min, world_max, pad: float = 1.05):
    """Orthographic light frustum fit to the scene AABB (traced bounds).

    ``light_dir`` is the direction the light travels (Light.Dir). The light
    camera looks along it from outside the scene; extents come from the 8
    AABB corners in light view space."""
    d = light_dir / jnp.maximum(jnp.linalg.norm(light_dir), 1e-20)
    center = (world_min + world_max) * 0.5
    radius = jnp.linalg.norm(world_max - world_min) * 0.5 + 1e-3
    eye = center - d * radius * 2.0
    up = jnp.where(jnp.abs(d[1]) > 0.99,
                   jnp.asarray([1.0, 0.0, 0.0]),
                   jnp.asarray([0.0, 1.0, 0.0]))
    view = m3.look_at(eye, center, up)

    corners = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.where(i & 1, world_max[0], world_min[0]),
                    jnp.where(i & 2, world_max[1], world_min[1]),
                    jnp.where(i & 4, world_max[2], world_min[2]),
                    jnp.asarray(1.0),
                ]
            )
            for i in range(8)
        ]
    )  # (8,4)
    cv = corners @ view.T  # (8,4) view-space
    lo = cv.min(axis=0)
    hi = cv.max(axis=0)
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


def shadow_factor(shadow: ShadowMap, world, bias: float = 2e-3):
    """Planar PCF visibility in [0,1] (1 = fully lit) for world-position
    planes ``world`` = (wx, wy, wz), each (NT, NPX).

    Bilinear-weighted 2×2 PCF: each tap compares the stored occluder depth
    against the pixel's light-space depth (reversed-Z: occluded when the
    map holds something strictly nearer to the light)."""
    wx, wy, wz = world
    vp = shadow.light_vp
    cx = vp[0, 0] * wx + vp[0, 1] * wy + vp[0, 2] * wz + vp[0, 3]
    cy = vp[1, 0] * wx + vp[1, 1] * wy + vp[1, 2] * wz + vp[1, 3]
    cz = vp[2, 0] * wx + vp[2, 1] * wy + vp[2, 2] * wz + vp[2, 3]
    # Orthographic: w == 1, no divide. NDC → texel coords.
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
    inside = (
        (cx >= -1.0) & (cx <= 1.0) & (cy >= -1.0) & (cy <= 1.0)
        & (cz >= 0.0) & (cz <= 1.0)
    )
    return jnp.where(inside, vis, 1.0)
