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


def _equirect_dirs(h: int, w: int):
    """Unit directions + sinθ solid-angle weights for an equirect grid
    (matches make_procedural_sky's parameterization)."""
    tv = (np.arange(h) + 0.5) / h * np.pi
    tu = (np.arange(w) + 0.5) / w * 2 * np.pi - np.pi
    et, ep = np.meshgrid(tv, tu, indexing="ij")
    dirs = np.stack(
        [np.sin(et) * np.cos(ep), np.cos(et), np.sin(et) * np.sin(ep)],
        axis=-1,
    ).reshape(-1, 3)
    return dirs, np.sin(et).reshape(-1)


def _convolve(env: np.ndarray, out_h: int, out_w: int,
              power: float) -> np.ndarray:
    """Brute-force cosine-power convolution of an equirect map (numpy,
    bind time — the maps are tiny). Chunked over output pixels so the
    (O, E) weight matrix never materializes whole."""
    eh, ew = env.shape[:2]
    env_dirs, solid = _equirect_dirs(eh, ew)
    texels = env.reshape(-1, 3)
    out_dirs, _ = _equirect_dirs(out_h, out_w)

    out = np.empty((out_h * out_w, 3), np.float32)
    for lo in range(0, out_dirs.shape[0], 1024):
        chunk = out_dirs[lo:lo + 1024]
        cosw = np.clip(chunk @ env_dirs.T, 0.0, 1.0) ** power  # (o, E)
        wsum = cosw * solid[None, :]
        out[lo:lo + 1024] = (wsum @ texels) / np.maximum(
            wsum.sum(axis=1, keepdims=True), 1e-9)
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


# ---------------------------------------------------------------------------
# Analytic IBL (production path): every product is a cos^p convolution of
# the environment, i.e. smooth by construction — so instead of baking u8
# equirect tables and paying one-hot MXU selects per pixel (the whole
# sampling cost of the table path), represent each product as a low-degree
# polynomial on the sphere plus ONE spherical Gaussian for the sharp sun
# lobe, both fit at bind time. Runtime evaluation is pure elementwise VPU
# math straight from direction planes — no equirect atan2/arccos, no
# tables, no gathers. (Degree-≤L polynomials restricted to the sphere span
# exactly the spherical harmonics up to band L; least-squares on monomials
# avoids hand-rolled SH basis formulas.)
# ---------------------------------------------------------------------------


class SphPoly(NamedTuple):
    """color(d) ≈ Σ_b coef[b]·x^i y^j z^k  +  sg_amp·exp(sg_sharp·(d·a−1))
    for unit d. ``degree`` is static (pytree aux); arrays are leaves."""

    coef: jnp.ndarray  # (nbasis, 3) f32
    sg_axis: jnp.ndarray  # (3,) f32 unit
    sg_amp: jnp.ndarray  # (3,) f32 (zeros = no SG)
    sg_sharp: jnp.ndarray  # () f32
    degree: int


jax.tree_util.register_pytree_node(
    SphPoly,
    lambda t: ((t.coef, t.sg_axis, t.sg_amp, t.sg_sharp), (t.degree,)),
    lambda aux, ch: SphPoly(*ch, aux[0]),
)


class IblSH(NamedTuple):
    """Analytic IBL products (plain NamedTuple pytree of SphPoly)."""

    irradiance: SphPoly
    spec_gloss: SphPoly
    spec_rough: SphPoly


def _monomial_powers(degree: int):
    return [(i, j, k)
            for total in range(degree + 1)
            for i in range(total + 1)
            for j in range(total - i + 1)
            for k in (total - i - j,)]


def _monomials_np(dirs: np.ndarray, degree: int) -> np.ndarray:
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    cols = [x ** i * y ** j * z ** k
            for i, j, k in _monomial_powers(degree)]
    return np.stack(cols, axis=1)


def _fit_sph_poly(img: np.ndarray, degree: int, with_sg: bool,
                  iters: int = 4) -> SphPoly:
    """Weighted least-squares fit of an equirect product map. With
    ``with_sg``, alternate SG-on-residual / poly-on-remainder so the poly
    never has to ring around the sun lobe."""
    h, w = img.shape[:2]
    dirs, solid = _equirect_dirs(h, w)
    y = img.reshape(-1, 3).astype(np.float64)
    sw = np.sqrt(solid)[:, None]
    basis = _monomials_np(dirs, degree)

    def poly_fit(target):
        c, *_ = np.linalg.lstsq(basis * sw, target * sw, rcond=None)
        return c

    sg_axis = np.array([0.0, 1.0, 0.0])
    sg_amp = np.zeros(3)
    sg_sharp = 1.0
    coef = poly_fit(y)
    if with_sg:
        lams = np.exp(np.linspace(np.log(4.0), np.log(2048.0), 28))
        for _ in range(iters):
            resid = y - basis @ coef
            lum = resid @ np.array([0.2126, 0.7152, 0.0722])
            peak = int(np.argmax(lum))
            # refine the axis as the energy centroid near the peak
            near = np.clip(dirs @ dirs[peak], 0.0, None) ** 64
            wgt = np.clip(lum, 0.0, None) * near * solid
            axis = dirs.T @ wgt
            nrm = np.linalg.norm(axis)
            sg_axis = axis / nrm if nrm > 1e-12 else dirs[peak]
            mu = dirs @ sg_axis
            best = (np.inf, None, None)
            for lam in lams:
                g = np.exp(lam * (mu - 1.0))
                denom = float(np.sum(solid * g * g))
                if denom < 1e-12:
                    continue
                amp = (g * solid) @ resid / denom
                err = float(np.sum(
                    solid[:, None] * (resid - g[:, None] * amp[None]) ** 2))
                if err < best[0]:
                    best = (err, lam, amp)
            _, sg_sharp, sg_amp = best
            sg_amp = np.maximum(sg_amp, 0.0)
            g = np.exp(sg_sharp * (dirs @ sg_axis - 1.0))
            coef = poly_fit(y - g[:, None] * sg_amp[None])
    return SphPoly(
        coef=jnp.asarray(coef, jnp.float32),
        sg_axis=jnp.asarray(sg_axis, jnp.float32),
        sg_amp=jnp.asarray(sg_amp, jnp.float32),
        sg_sharp=jnp.asarray(sg_sharp, jnp.float32),
        degree=degree,
    )


def sph_poly_error(poly: SphPoly, img: np.ndarray) -> float:
    """Max abs fit error over the map grid, relative to the map max."""
    h, w = img.shape[:2]
    dirs, _ = _equirect_dirs(h, w)
    got = np.asarray(_monomials_np(dirs, poly.degree) @
                     np.asarray(poly.coef, np.float64))
    amp = np.asarray(poly.sg_amp, np.float64)
    if amp.any():
        g = np.exp(float(poly.sg_sharp)
                   * (dirs @ np.asarray(poly.sg_axis, np.float64) - 1.0))
        got = got + g[:, None] * amp[None]
    err = np.abs(got - img.reshape(-1, 3).astype(np.float64))
    return float(err.max() / max(float(img.max()), 1e-9))


def make_ibl_sh(env: np.ndarray | None = None) -> IblSH:
    """Precompute the analytic IBL products (production path — see the
    module docstring for why this replaces the table path on TPU). The
    convolved maps exist only transiently as fit targets."""
    if env is None:
        env = make_procedural_sky()
    irr = _convolve(env, 16, 32, power=1.0)
    rough = _convolve(env, 24, 48, power=6.0)
    gloss = _convolve(env, 48, 96, power=160.0)
    return IblSH(
        irradiance=_fit_sph_poly(irr, degree=2, with_sg=False),
        spec_gloss=_fit_sph_poly(gloss, degree=4, with_sg=True),
        spec_rough=_fit_sph_poly(rough, degree=4, with_sg=True),
    )


def _eval_sph_poly(p: SphPoly, d):
    """Evaluate a SphPoly at unit-direction planes (static unroll — a few
    hundred elementwise FMAs that XLA fuses into the surrounding chain)."""
    pows = []
    for plane in d:
        col = [None, plane]
        for _ in range(p.degree - 1):
            col.append(col[-1] * plane)
        pows.append(col)
    out = [None, None, None]
    for b, (i, j, k) in enumerate(_monomial_powers(p.degree)):
        mono = None
        for axis, power in ((0, i), (1, j), (2, k)):
            if power:
                term = pows[axis][power]
                mono = term if mono is None else mono * term
        for c in range(3):
            w = p.coef[b, c]
            term = w if mono is None else mono * w
            out[c] = term if out[c] is None else out[c] + term
    g = jnp.exp(p.sg_sharp * (
        d[0] * p.sg_axis[0] + d[1] * p.sg_axis[1] + d[2] * p.sg_axis[2]
        - 1.0))
    return tuple(jnp.maximum(out[c] + p.sg_amp[c] * g, 0.0)
                 for c in range(3))


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


def ibl_ambient(ibl, normal, view_dir, albedo, metallic, roughness,
                ao, tile_h: int = 8, tile_w: int = 128,
                use_pallas: bool | None = None):
    """Split-sum ambient (replaces the reference's 0.03·albedo·ao when IBL
    is enabled). All args are planar channel tuples/planes. ``ibl`` is
    either the analytic IblSH (production: pure elementwise math) or the
    table-path IblMaps (oracle: one-hot MXU equirect samples)."""
    n = normalize3(normal)
    v = normalize3(view_dir)
    ndv = jnp.maximum(dot3(n, v), 0.0)
    # reflect(-v, n); unit because n and v are
    r = tuple(2.0 * ndv * n[c] - v[c] for c in range(3))

    if isinstance(ibl, IblSH):
        irr = _eval_sph_poly(ibl.irradiance, n)
        sg = _eval_sph_poly(ibl.spec_gloss, r)
        sr = _eval_sph_poly(ibl.spec_rough, r)
    else:
        ui, vi = _dir_to_uv(n)
        irr = _sample_env(ibl.irradiance, ui, vi, ibl.hdr_scale, tile_h,
                          tile_w, use_pallas)
        ur, vr = _dir_to_uv(normalize3(r))
        sg = _sample_env(ibl.spec_gloss, ur, vr, ibl.hdr_scale, tile_h,
                         tile_w, use_pallas)
        sr = _sample_env(ibl.spec_rough, ur, vr, ibl.hdr_scale, tile_h,
                         tile_w, use_pallas)
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
