"""Planar (channel-separated) shading — Cook-Torrance GGX + flat Lambert.

Same formulas as ops/shading.py (the exact brdf.glsl / brdf.frag port, see
its docstring for the pinned reference quirks), restated over *planar*
pixel channels: every quantity is its own (NT, NPX) (or (H, W)) array
instead of a (..., 3) vector array. On TPU, trailing-3 vector layouts put
the channel axis in the 128-lane minor dimension and waste 125/128 lanes;
planar channels keep the whole lighting loop dense VPU math (measured ~4×
on the 1080p lighting pass).

Reference: /root/reference/src/shaders/brdf.frag:11-73, brdf.glsl:5-36,
gizmo.frag:10-16 (flat Lambert), gbuffer.frag:17-23 (TBN normal mapping).
"""

from __future__ import annotations

import jax.numpy as jnp

from bibim_tpu.scene.lights import Lights

PI = 3.1415926535897932384626433832795


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def normalize3(v, eps=1e-20):
    inv = 1.0 / jnp.maximum(jnp.sqrt(dot3(v, v)), eps)
    return (v[0] * inv, v[1] * inv, v[2] * inv)


def cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def apply_normal_map(normal, tangent, nmap, enable):
    """gbuffer.frag:17-23: N = TBN · (2·tap − 1), B = cross(N, T)
    (gbuffer.vert:28). ``nmap`` is the raw [0,1] tap triple; ``enable`` is a
    traced toggle (uEnableNormalMap)."""
    b = cross3(normal, tangent)
    mx, my, mz = (nmap[0] * 2.0 - 1.0, nmap[1] * 2.0 - 1.0,
                  nmap[2] * 2.0 - 1.0)
    mapped = tuple(
        tangent[c] * mx + b[c] * my + normal[c] * mz for c in range(3)
    )
    on = jnp.asarray(enable) != 0
    return tuple(jnp.where(on, mapped[c], normal[c]) for c in range(3))


def shade_pbr_planar(
    world,  # (wx, wy, wz) planes
    normal,  # (nx, ny, nz) planes — normalized here (brdf.frag:49)
    albedo,  # (r, g, b) planes
    metallic,  # plane
    roughness,  # plane
    ao,  # plane
    lights: Lights,
    view_pos,  # (3,)
    light_vis: dict | None = None,  # light index → visibility plane (shadows)
    ambient=None,  # (r, g, b) ambient planes override (IBL)
):
    """Full light loop of brdf.frag:22-71 → (r, g, b) linear HDR planes.

    ``light_vis`` multiplies per-light radiance by a [0,1] visibility plane
    (shadow mapping); ``ambient`` replaces the reference's constant
    0.03·albedo·ao term (IBL). Both are additive capabilities — defaults
    reproduce the reference exactly."""
    n = normalize3(normal)
    v = normalize3(tuple(view_pos[c] - world[c] for c in range(3)))
    f0 = tuple(0.04 * (1.0 - metallic) + albedo[c] * metallic
               for c in range(3))

    lo = (jnp.zeros_like(metallic),) * 3
    for i in range(lights.num_lights):
        lpos = lights.pos[i]
        ltype = lights.type[i]
        ldir = lights.dir[i]

        # Light vector + attenuation (brdf.frag:28-46).
        to_l = tuple(lpos[c] - world[c] for c in range(3))
        d2 = jnp.maximum(dot3(to_l, to_l), 1e-20)
        inv_d = 1.0 / jnp.sqrt(d2)
        l_point = tuple(to_l[c] * inv_d for c in range(3))
        att_point = 1.0 / d2

        dlen = jnp.maximum(jnp.linalg.norm(ldir), 1e-20)
        dn = ldir / dlen
        theta = -(l_point[0] * dn[0] + l_point[1] * dn[1] + l_point[2] * dn[2])
        eps = lights.inner_cutoff[i] - lights.outer_cutoff[i]
        spot = jnp.clip(
            (theta - lights.outer_cutoff[i]) / jnp.where(eps == 0, 1.0, eps),
            0.0, 1.0,
        )
        is_spot = ltype == 1
        is_dir = ltype == 2
        l_vec = tuple(jnp.where(is_dir, -dn[c], l_point[c]) for c in range(3))
        att = jnp.where(
            is_dir, 1.0, att_point * jnp.where(is_spot, spot, 1.0)
        )

        h = normalize3(tuple(l_vec[c] + v[c] for c in range(3)))

        # D: Trowbridge-Reitz GGX (brdf.glsl:5-16).
        a = roughness * roughness
        a2 = a * a
        ndh = jnp.maximum(dot3(n, h), 0.0)
        denom = ndh * ndh * (a2 - 1.0) + 1.0
        d = a2 / (PI * denom * denom)

        # F: Schlick (brdf.glsl:34-36), F0 = mix(0.04, albedo, metallic).
        hdv = jnp.maximum(dot3(h, v), 0.0)
        fres = (1.0 - hdv) ** 5
        f = tuple(f0[c] + (1.0 - f0[c]) * fres for c in range(3))

        # G: Smith with Schlick-GGX, k=(r+1)²/8 (brdf.glsl:18-32).
        r1 = roughness + 1.0
        k = (r1 * r1) / 8.0
        ndv = jnp.maximum(dot3(n, v), 0.0)
        ndl = jnp.maximum(dot3(n, l_vec), 0.0)
        g = (ndv / (ndv * (1.0 - k) + k)) * (ndl / (ndl * (1.0 - k) + k))

        spec_den = 1.0 / jnp.maximum(4.0 * ndv * ndl, 0.001)  # brdf.frag:61
        radiance = att * lights.intensity[i]
        if light_vis and i in light_vis:
            radiance = radiance * light_vis[i]
        contrib = []
        for c in range(3):
            specular = (d * f[c] * g) * spec_den
            kd = (1.0 - f[c]) * (1.0 - metallic)
            contrib.append(
                (kd * albedo[c] / PI + specular)
                * (radiance * lights.color[i][c]) * ndl
            )
        lo = tuple(lo[c] + contrib[c] for c in range(3))

    # ambient = 0.03 · albedo · ao (brdf.frag:70) unless IBL overrides
    if ambient is None:
        ambient = tuple(0.03 * albedo[c] * ao for c in range(3))
    return tuple(ambient[c] + lo[c] for c in range(3))


def shade_flat_planar(color, normal, view_rot):
    """gizmo.frag flat Lambert in view space: diff = max(-N_view.z, 0).

    ``view_rot`` is the (3,3) view rotation; ``normal`` world-space planes."""
    n_view = tuple(
        view_rot[r, 0] * normal[0]
        + view_rot[r, 1] * normal[1]
        + view_rot[r, 2] * normal[2]
        for r in range(3)
    )
    n_unit = normalize3(n_view)
    diff = jnp.maximum(-n_unit[2], 0.0)
    return tuple(color[c] * diff for c in range(3))
