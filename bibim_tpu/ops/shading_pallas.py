"""Fused deferred-lighting + tonemap Pallas kernel.

`shade_pbr_planar` (ops/shading_planar.py) is ~0.2 ms of VPU math at
1080p, but XLA materializes its intermediate planes through HBM across
fusion boundaries — the measured stage is ~1.7 ms of bandwidth, not
compute. This kernel runs the ENTIRE light loop + RGBA16F attachment
quantization + exposure tonemap in one pass per block of tiles: the only
HBM traffic is the input G-buffer planes and the 3 LDR outputs.

Formula-identical to the planar oracle (brdf.frag:22-71 / brdf.glsl /
hdr_tone_mapping.frag:9-17 — same ops in the same order; compiled-kernel
FMA fusion may differ from XLA's by ≤1 ulp, same tolerance class as the
fused raster kernel). The XLA path remains the oracle and the non-TPU
fallback.

Grid shape: elementwise math has no per-tile logic, so each grid step
processes TILE_BATCH tiles (a mostly-empty grid step costs ~2.4 µs; one
step per screen tile would burn ~2 ms in fixed overhead at 1080p).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bibim_tpu.scene.lights import Lights

PI = 3.1415926535897932384626433832795
# Tiles per grid step: amortizes the ~2.4 µs/step overhead while keeping
# the scoped-VMEM footprint (double-buffered in/out blocks + the unrolled
# light loop's stack temporaries, which dominate ~3:1) under the 16 MB
# limit. Measured: 17 blocks (14 in + 3 out) fit at batch 32; 20 blocks
# (shadows + IBL: 17 in + 3 out) hit 16.43 MB — those take batch 16.
TILE_BATCH = 32


def _tile_batch(n_in_planes: int) -> int:
    return TILE_BATCH if n_in_planes <= 14 else TILE_BATCH // 2

# lparams row layout (per light): px py pz | type | dx dy dz | intensity |
# cr cg cb | inner | outer | vis_flag | pad pad
_LROW = 16


def _pack_lights(lights: Lights, n: int, vis_light: int) -> jnp.ndarray:
    rows = []
    for i in range(n):
        rows.append(jnp.concatenate([
            lights.pos[i],
            lights.type[i].astype(jnp.float32)[None],
            lights.dir[i],
            lights.intensity[i][None],
            lights.color[i],
            lights.inner_cutoff[i][None],
            lights.outer_cutoff[i][None],
            jnp.asarray([1.0 if i == vis_light else 0.0], jnp.float32),
            jnp.zeros((2,), jnp.float32),
        ]))
    return jnp.stack(rows, axis=0)  # (n, 16)


def _shade_kernel(lparams_ref, gparams_ref, *refs, num_lights, has_vis,
                  has_ambient, quantize, tonemap):
    n_in = 13 + (1 if has_vis else 0) + (3 if has_ambient else 0)
    ins = refs[:n_in]
    out_r, out_g, out_b = refs[n_in:]

    (wx, wy, wz, nx, ny, nz, ar, ag, ab, met, rough, ao, validf) = (
        ins[i][...] for i in range(13)
    )
    k = 13
    vis = ins[k][...] if has_vis else None
    if has_vis:
        k += 1
    amb = tuple(ins[k + c][...] for c in range(3)) if has_ambient else None

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def normalize3(v):
        inv = 1.0 / jnp.maximum(jnp.sqrt(dot3(v, v)), 1e-20)
        return (v[0] * inv, v[1] * inv, v[2] * inv)

    view_pos = (gparams_ref[0, 0], gparams_ref[0, 1], gparams_ref[0, 2])
    exposure = gparams_ref[0, 3]
    tm_on = gparams_ref[0, 4]

    n = normalize3((nx, ny, nz))
    v = normalize3((view_pos[0] - wx, view_pos[1] - wy, view_pos[2] - wz))
    albedo = (ar, ag, ab)
    f0 = tuple(0.04 * (1.0 - met) + albedo[c] * met for c in range(3))

    lo = (jnp.zeros_like(met),) * 3
    for i in range(num_lights):
        lpx = lparams_ref[i, 0]
        lpy = lparams_ref[i, 1]
        lpz = lparams_ref[i, 2]
        ltype = lparams_ref[i, 3]
        ldx = lparams_ref[i, 4]
        ldy = lparams_ref[i, 5]
        ldz = lparams_ref[i, 6]
        inten = lparams_ref[i, 7]
        lcr = lparams_ref[i, 8]
        lcg = lparams_ref[i, 9]
        lcb = lparams_ref[i, 10]
        inner = lparams_ref[i, 11]
        outer = lparams_ref[i, 12]
        vflag = lparams_ref[i, 13]

        to_l = (lpx - wx, lpy - wy, lpz - wz)
        d2 = jnp.maximum(dot3(to_l, to_l), 1e-20)
        inv_d = 1.0 / jnp.sqrt(d2)
        l_point = tuple(to_l[c] * inv_d for c in range(3))
        att_point = 1.0 / d2

        dlen = jnp.maximum(
            jnp.sqrt(ldx * ldx + ldy * ldy + ldz * ldz), 1e-20
        )
        dn = (ldx / dlen, ldy / dlen, ldz / dlen)
        theta = -(l_point[0] * dn[0] + l_point[1] * dn[1]
                  + l_point[2] * dn[2])
        eps = inner - outer
        spot = jnp.clip(
            (theta - outer) / jnp.where(eps == 0, 1.0, eps), 0.0, 1.0
        )
        is_spot = ltype == 1.0
        is_dir = ltype == 2.0
        l_vec = tuple(
            jnp.where(is_dir, -dn[c], l_point[c]) for c in range(3)
        )
        att = jnp.where(
            is_dir, 1.0, att_point * jnp.where(is_spot, spot, 1.0)
        )

        h = normalize3(tuple(l_vec[c] + v[c] for c in range(3)))

        a = rough * rough
        a2 = a * a
        ndh = jnp.maximum(dot3(n, h), 0.0)
        denom = ndh * ndh * (a2 - 1.0) + 1.0
        d = a2 / (PI * denom * denom)

        hdv = jnp.maximum(dot3(h, v), 0.0)
        fres = (1.0 - hdv) ** 5
        f = tuple(f0[c] + (1.0 - f0[c]) * fres for c in range(3))

        r1 = rough + 1.0
        kk = (r1 * r1) / 8.0
        ndv = jnp.maximum(dot3(n, v), 0.0)
        ndl = jnp.maximum(dot3(n, l_vec), 0.0)
        g = (ndv / (ndv * (1.0 - kk) + kk)) * (ndl / (ndl * (1.0 - kk) + kk))

        spec_den = 1.0 / jnp.maximum(4.0 * ndv * ndl, 0.001)
        radiance = att * inten
        if has_vis:
            radiance = radiance * jnp.where(vflag > 0.5, vis, 1.0)
        lcol = (lcr, lcg, lcb)
        new = []
        for c in range(3):
            specular = (d * f[c] * g) * spec_den
            kd = (1.0 - f[c]) * (1.0 - met)
            new.append(
                lo[c] + (kd * albedo[c] / PI + specular)
                * (radiance * lcol[c]) * ndl
            )
        lo = tuple(new)

    if amb is None:
        amb = tuple(0.03 * albedo[c] * ao for c in range(3))
    hdr = tuple(amb[c] + lo[c] for c in range(3))
    hdr = tuple(jnp.where(validf > 0.5, hdr[c], 0.0) for c in range(3))
    if quantize:
        hdr = tuple(
            hdr[c].astype(jnp.float16).astype(jnp.float32) for c in range(3)
        )
    if tonemap:
        mapped = tuple(1.0 - jnp.exp(-hdr[c] * exposure) for c in range(3))
        ldr = tuple(
            jnp.where(tm_on > 0.5, mapped[c], hdr[c]) for c in range(3)
        )
    else:
        ldr = hdr
    out_r[...] = ldr[0]
    out_g[...] = ldr[1]
    out_b[...] = ldr[2]


def shade_tonemap_pallas(
    world, normal, albedo, metallic, roughness, ao, valid,
    lights: Lights, view_pos, enable_tone_mapping, exposure,
    vis_plane=None, vis_light: int = -1, ambient=None,
    quantize: bool = True, tonemap: bool = True,
    interpret: bool = False,
):
    """Deferred lighting + fp16 attachment round-trip + tonemap, fused.

    All pixel args are (NT, NPX) planes (``valid`` boolean). Returns
    (r, g, b) LDR planes. Use on TPU only; the planar XLA path
    (shade_pbr_planar → _q16 → tone_map) is the oracle."""
    num_lights = lights.num_lights
    nt, npx = metallic.shape

    planes = [*world, *normal, *albedo, metallic, roughness, ao,
              valid.astype(jnp.float32)]
    has_vis = vis_plane is not None
    if has_vis:
        planes.append(vis_plane)
    has_ambient = ambient is not None
    if has_ambient:
        planes.extend(ambient)
    tile_batch = _tile_batch(len(planes))
    nt_pad = -(-nt // tile_batch) * tile_batch
    if nt_pad != nt:
        planes = [jnp.pad(p, ((0, nt_pad - nt), (0, 0))) for p in planes]

    lparams = _pack_lights(lights, num_lights, vis_light)
    if num_lights == 0:
        lparams = jnp.zeros((1, _LROW), jnp.float32)
    gparams = jnp.concatenate([
        jnp.asarray(view_pos, jnp.float32).reshape(3),
        jnp.asarray(exposure, jnp.float32).reshape(1),
        jnp.asarray(enable_tone_mapping, jnp.float32).reshape(1),
        jnp.zeros((3,), jnp.float32),
    ]).reshape(1, 8)

    kernel = functools.partial(
        _shade_kernel, num_lights=num_lights, has_vis=has_vis,
        has_ambient=has_ambient, quantize=quantize, tonemap=tonemap,
    )
    block = pl.BlockSpec((tile_batch, npx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    small = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nt_pad // tile_batch,),
        in_specs=[small, small] + [block] * len(planes),
        out_specs=[block] * 3,
        out_shape=[jax.ShapeDtypeStruct((nt_pad, npx), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lparams, gparams, *planes)
    return tuple(o[:nt] for o in out)
