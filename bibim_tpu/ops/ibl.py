"""Image-based lighting — BASELINE config-5 stretch capability (additive:
the reference's ambient term is the constant 0.03·albedo·ao).

Split-sum IBL sized for the TPU's strengths: the environment products are
precomputed tiny equirect maps (≤ 32×64 texels) so every runtime lookup
rides the gather-free MXU one-hot path (ops.texture_quad small tables);
the environment BRDF uses Karis' analytic approximation instead of a LUT.

- diffuse: cosine-convolved irradiance map, sampled at the shading normal
- specular: two GGX-prefiltered maps (gloss/rough) lerped by roughness —
  a 2-level roughness ladder that keeps both lookups on the MXU
- All maps quantize to u8 with one static HDR scale (ambient-term
  precision; direct lighting stays full f32).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bibim_tpu.ops import texture_quad as tq
from bibim_tpu.ops.shading_planar import dot3, normalize3


class IblMaps(NamedTuple):
    """Precomputed environment products (pytree: tables traced)."""

    irradiance: tuple  # QuadTable tuple (slots alb_r/g/b)
    spec_gloss: tuple  # QuadTable tuple — low-roughness prefilter
    spec_rough: tuple  # QuadTable tuple — high-roughness prefilter
    hdr_scale: float  # static dequant scale


def make_procedural_sky(h: int = 64, w: int = 128,
                        sun_dir=(-0.4, -1.0, 0.5),
                        sun_color=(8.0, 7.0, 6.0),
                        zenith=(0.25, 0.45, 0.9),
                        horizon=(0.8, 0.75, 0.7),
                        ground=(0.25, 0.2, 0.17)) -> np.ndarray:
    """Analytic gradient sky + sun blob as an equirect HDR image (numpy,
    bind time). The renderer has no environment assets (the reference ships
    none), so this is the default light probe."""
    v = (np.arange(h) + 0.5) / h * np.pi  # polar angle
    u = (np.arange(w) + 0.5) / w * 2 * np.pi - np.pi
    theta, phi = np.meshgrid(v, u, indexing="ij")
    dirs = np.stack(
        [np.sin(theta) * np.cos(phi), np.cos(theta),
         np.sin(theta) * np.sin(phi)], axis=-1,
    )
    y = dirs[..., 1]
    up = np.clip(y, 0.0, 1.0)[..., None]
    down = np.clip(-y, 0.0, 1.0)[..., None]
    sky = np.where(
        (y > 0)[..., None],
        np.asarray(horizon) + (np.asarray(zenith) - np.asarray(horizon))
        * up ** 0.7,
        np.asarray(horizon) + (np.asarray(ground) - np.asarray(horizon))
        * down ** 0.4,
    )
    sd = -np.asarray(sun_dir, np.float64)
    sd /= np.linalg.norm(sd)
    cos_sun = np.clip(dirs @ sd, 0.0, 1.0)
    sun = np.asarray(sun_color) * (cos_sun[..., None] ** 600)
    return (sky + sun).astype(np.float32)


def _convolve(env: np.ndarray, out_h: int, out_w: int,
              power: float) -> np.ndarray:
    """Brute-force cosine-power convolution of an equirect map (numpy,
    bind time — the maps are tiny)."""
    eh, ew = env.shape[:2]
    tv = (np.arange(eh) + 0.5) / eh * np.pi
    tu = (np.arange(ew) + 0.5) / ew * 2 * np.pi - np.pi
    et, ep = np.meshgrid(tv, tu, indexing="ij")
    env_dirs = np.stack(
        [np.sin(et) * np.cos(ep), np.cos(et), np.sin(et) * np.sin(ep)],
        axis=-1,
    ).reshape(-1, 3)
    solid = np.sin(et).reshape(-1)  # dΩ ∝ sinθ
    texels = env.reshape(-1, 3)

    ov = (np.arange(out_h) + 0.5) / out_h * np.pi
    ou = (np.arange(out_w) + 0.5) / out_w * 2 * np.pi - np.pi
    ot, op = np.meshgrid(ov, ou, indexing="ij")
    out_dirs = np.stack(
        [np.sin(ot) * np.cos(op), np.cos(ot), np.sin(ot) * np.sin(op)],
        axis=-1,
    ).reshape(-1, 3)

    cosw = np.clip(out_dirs @ env_dirs.T, 0.0, 1.0) ** power  # (O, E)
    wsum = cosw * solid[None, :]
    out = (wsum @ texels) / np.maximum(wsum.sum(axis=1, keepdims=True), 1e-9)
    return out.reshape(out_h, out_w, 3).astype(np.float32)


def _to_quads(img: np.ndarray, scale: float) -> tuple:
    q = np.clip(img / scale * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return tq.build_quad_tables(
        {"alb_r": q[:, :, 0:1], "alb_g": q[:, :, 1:2], "alb_b": q[:, :, 2:3]}
    )


def make_ibl(env: np.ndarray | None = None, out_h: int = 16,
             out_w: int = 32) -> IblMaps:
    """Precompute the IBL products from an equirect HDR env (defaults to
    the procedural sky)."""
    if env is None:
        env = make_procedural_sky()
    irr = _convolve(env, out_h, out_w, power=1.0)
    gloss = _convolve(env, out_h * 2, out_w * 2, power=160.0)
    rough = _convolve(env, out_h, out_w, power=6.0)
    scale = float(max(irr.max(), gloss.max(), rough.max(), 1e-6))
    return IblMaps(
        irradiance=_to_quads(irr, scale),
        spec_gloss=_to_quads(gloss, scale),
        spec_rough=_to_quads(rough, scale),
        hdr_scale=scale,
    )


jax.tree_util.register_pytree_node(
    IblMaps,
    lambda t: ((t.irradiance, t.spec_gloss, t.spec_rough), (t.hdr_scale,)),
    lambda aux, ch: IblMaps(ch[0], ch[1], ch[2], aux[0]),
)


def _dir_to_uv(d):
    """Equirect uv from unit direction planes (matches make_procedural_sky:
    v = θ/π from +Y, u = (atan2(z, x) + π) / 2π)."""
    dx, dy, dz = d
    u = (jnp.arctan2(dz, dx) + jnp.pi) / (2.0 * jnp.pi)
    v = jnp.arccos(jnp.clip(dy, -1.0, 1.0)) / jnp.pi
    return u, v


def _sample_env(tables, u, v, scale, tile_h, tile_w, use_pallas):
    s = tq.sample_material(tables, u, v, tile_h, tile_w,
                           use_pallas=use_pallas)
    return tuple(s[k] * scale for k in ("alb_r", "alb_g", "alb_b"))


def ibl_ambient(ibl: IblMaps, normal, view_dir, albedo, metallic, roughness,
                ao, tile_h: int = 8, tile_w: int = 128,
                use_pallas: bool | None = None):
    """Split-sum ambient (replaces the reference's 0.03·albedo·ao when IBL
    is enabled). All args are planar channel tuples/planes."""
    n = normalize3(normal)
    v = normalize3(view_dir)
    ndv = jnp.maximum(dot3(n, v), 0.0)
    # reflect(-v, n)
    r = tuple(2.0 * ndv * n[c] - v[c] for c in range(3))

    ui, vi = _dir_to_uv(n)
    irr = _sample_env(ibl.irradiance, ui, vi, ibl.hdr_scale, tile_h, tile_w,
                      use_pallas)
    ur, vr = _dir_to_uv(normalize3(r))
    sg = _sample_env(ibl.spec_gloss, ur, vr, ibl.hdr_scale, tile_h, tile_w,
                     use_pallas)
    sr = _sample_env(ibl.spec_rough, ur, vr, ibl.hdr_scale, tile_h, tile_w,
                     use_pallas)
    spec_env = tuple(
        sg[c] * (1.0 - roughness) + sr[c] * roughness for c in range(3)
    )

    # Karis analytic environment BRDF (mobile split-sum approximation):
    #   r = roughness·c0 + c1;  a004 = min(r.x², 2^(−9.28·NoV))·r.x + r.y
    #   AB = (−1.04, 1.04)·a004 + r.zw
    f0 = tuple(0.04 * (1.0 - metallic) + albedo[c] * metallic
               for c in range(3))
    rx = roughness * -1.0 + 1.0
    ry = roughness * -0.0275 + 0.0425
    rz = roughness * -0.572 + 1.04
    rw = roughness * 0.022 - 0.04
    a004 = jnp.minimum(rx * rx, jnp.exp2(-9.28 * ndv)) * rx + ry
    brdf_scale = -1.04 * a004 + rz
    brdf_bias = jnp.maximum(1.04 * a004 + rw, 0.0)

    ks = tuple(f0[c] * brdf_scale + brdf_bias for c in range(3))
    kd = tuple((1.0 - f0[c]) * (1.0 - metallic) for c in range(3))
    return tuple(
        (kd[c] * albedo[c] * irr[c] + spec_env[c] * ks[c]) * ao
        for c in range(3)
    )
