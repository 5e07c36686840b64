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


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _normalize3(v):
    inv = 1.0 / jnp.maximum(jnp.sqrt(_dot3(v, v)), 1e-20)
    return (v[0] * inv, v[1] * inv, v[2] * inv)


def _ggx_light_sum(lparams_ref, num_lights, has_vis, vis,
                   world, n, v, albedo, f0, met, rough):
    """The full brdf.frag light loop (verbatim op order) → Lo triple.
    Shared by the G-buffer shade kernel and the sampled-shade kernel."""
    wx, wy, wz = world
    dot3 = _dot3
    normalize3 = _normalize3

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
    return lo


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

    view_pos = (gparams_ref[0, 0], gparams_ref[0, 1], gparams_ref[0, 2])
    exposure = gparams_ref[0, 3]
    tm_on = gparams_ref[0, 4]

    n = _normalize3((nx, ny, nz))
    v = _normalize3((view_pos[0] - wx, view_pos[1] - wy, view_pos[2] - wz))
    albedo = (ar, ag, ab)
    f0 = tuple(0.04 * (1.0 - met) + albedo[c] * met for c in range(3))

    lo = _ggx_light_sum(lparams_ref, num_lights, has_vis, vis,
                        (wx, wy, wz), n, v, albedo, f0, met, rough)

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


# ---------------------------------------------------------------------------
# Fused sampled-shade: material sampling (block-table blend + small-table
# MXU select) + normal mapping + G-buffer masking/fp16 quantization + the
# GGX light loop in ONE Pallas pass. Replaces the production chain
# [block-blend kernel → small-table kernel → XLA normal-map/mask/quantize
# → shade kernel], eliminating every intermediate pixel-rate plane
# between the texture gather and the HDR output (each inter-pass plane
# costs an HBM write+read at pixel rate, and each pass ~2.4 µs/grid-step
# fixed overhead). The fp16 attachment round-trip (render.h:93-94) runs
# in-kernel via the exact integer emulation in ops/f16.py (Mosaic has no
# f16 casts).
#
# The XLA oracle chain is framegraph._materialize_gbuffer_planes →
# _pbr_hdr (deferred) or _forward_hdr (forward) — pinned by
# tests/test_shading_pallas.py::TestShadeSampledPallas.
# ---------------------------------------------------------------------------

# Tiles per grid step: the 25-tap blend unroll's stack temporaries
# dominate scoped VMEM ~2 MB/tile (tools/exp_block3.py), plus the
# small-group one-hot (rows × g·NPX f32) — g=8 with a 512-row small-table
# ceiling keeps the footprint ~35 MB.
SAMPLED_TILE_BATCH = 8
# Small-table groups above this many (padded) rows stay out of the fused
# kernel (their one-hot temporary is rows × g·NPX f32); the caller
# samples them standalone and passes the slots as direct planes.
SAMPLED_SMALL_ROWS = 512


def _sampled_kernel(lparams_ref, gparams_ref, *refs, plan, num_lights,
                    has_vis, gbuffer_mode, quantize):
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.f16 import f16_round_trip

    pos = 0
    slots = {}
    for grp in plan:
        if grp[0] == "block":
            present, cpad, expand = grp[1], grp[2], grp[3]
            qt_ref = refs[pos]
            lx = refs[pos + 1][...]
            ly = refs[pos + 2][...]
            tx = refs[pos + 3][...]
            ty = refs[pos + 4][...]
            pos += 5

            def tap_row(row, qt_ref=qt_ref, expand=expand):
                t = qt_ref[:, row, :]
                if expand == 1:
                    return t
                # Member-major pair/quad layout (texture_quad.member_perm):
                # the rep-rate row expands to pixel rate by lane-segment
                # concatenation — pure vector copies in VMEM, replacing a
                # pixel-rate qt materialization through HBM.
                return jnp.concatenate([t] * expand, axis=1)

            acc = tq.block_blend_acc(
                tap_row, lx, ly, tx, ty, cpad, len(present),
            )
            for k, s in enumerate(present):
                slots[s] = acc[k]
        elif grp[0] == "small":
            present, cpad, rows = grp[1], grp[2], grp[3]
            tex_ref = refs[pos]
            idx = refs[pos + 1][...]
            tx = refs[pos + 2][...]
            ty = refs[pos + 3][...]
            pos += 4
            acc = tq.onehot_sample_planes(
                tex_ref[:, :], idx, tx, ty, rows, cpad, len(present)
            )
            for k, s in enumerate(present):
                slots[s] = acc[k]
        elif grp[0] == "mipblock":
            present, cs = grp[1], grp[2]
            qt_ref = refs[pos]
            g = {
                k: refs[pos + 1 + i][...]
                for i, k in enumerate(tq._MIP_GEOM_KEYS)
            }
            pos += 1 + len(tq._MIP_GEOM_KEYS)
            acc = tq.mip_block_blend_acc(
                lambda row, qt_ref=qt_ref: qt_ref[:, row, :],
                g, cs, len(present),
            )
            for k, s in enumerate(present):
                slots[s] = acc[k]
        else:  # direct precomputed slot planes
            for s in grp[1]:
                slots[s] = refs[pos][...]
                pos += 1

    (wx, wy, wz, nx, ny, nz, tgx, tgy, tgz, validf) = (
        refs[pos + i][...] for i in range(10)
    )
    pos += 10
    vis = None
    if has_vis:
        vis = refs[pos][...]
        pos += 1
    out_r, out_g, out_b = refs[pos : pos + 3]

    zero = jnp.zeros_like(validf)
    for s in tq.SLOTS:
        slots.setdefault(s, zero)

    albedo = (slots["alb_r"], slots["alb_g"], slots["alb_b"])
    met, rough, ao = slots["metallic"], slots["roughness"], slots["ao"]

    # apply_normal_map (gbuffer.frag:17-23), verbatim op order.
    normal = (nx, ny, nz)
    tangent = (tgx, tgy, tgz)
    b3 = (
        normal[1] * tangent[2] - normal[2] * tangent[1],
        normal[2] * tangent[0] - normal[0] * tangent[2],
        normal[0] * tangent[1] - normal[1] * tangent[0],
    )
    mx = slots["nrm_x"] * 2.0 - 1.0
    my = slots["nrm_y"] * 2.0 - 1.0
    mz = slots["nrm_z"] * 2.0 - 1.0
    mapped = tuple(
        tangent[c] * mx + b3[c] * my + normal[c] * mz for c in range(3)
    )
    nm_on = gparams_ref[0, 5] != 0.0
    nrm = tuple(
        jnp.where(nm_on, mapped[c], normal[c]) for c in range(3)
    )

    valid = validf > 0.5

    def mq(x):
        # Deferred G-buffer semantics: miss pixels cleared, then the
        # RGBA16F attachment round trip. Forward shades raw samples.
        if gbuffer_mode:
            x = jnp.where(valid, x, 0.0)
        if quantize:
            x = f16_round_trip(x)
        return x

    world_q = (mq(wx), mq(wy), mq(wz))
    nrm_q = tuple(mq(c) for c in nrm)
    alb_q = tuple(mq(c) for c in albedo)
    met_q = mq(met)
    rough_q = mq(rough)
    ao_q = mq(ao)

    view_pos = (gparams_ref[0, 0], gparams_ref[0, 1], gparams_ref[0, 2])
    n3 = _normalize3(nrm_q)
    v3 = _normalize3((view_pos[0] - world_q[0], view_pos[1] - world_q[1],
                      view_pos[2] - world_q[2]))
    f0 = tuple(0.04 * (1.0 - met_q) + alb_q[c] * met_q for c in range(3))

    lo = _ggx_light_sum(lparams_ref, num_lights, has_vis, vis,
                        world_q, n3, v3, alb_q, f0, met_q, rough_q)

    amb = tuple(0.03 * alb_q[c] * ao_q for c in range(3))
    hdr = tuple(amb[c] + lo[c] for c in range(3))
    hdr = tuple(jnp.where(valid, hdr[c], 0.0) for c in range(3))
    out_r[...] = hdr[0]
    out_g[...] = hdr[1]
    out_b[...] = hdr[2]


def shade_sampled_pallas(
    groups, world, normal, tangent, valid,
    lights: Lights, view_pos, enable_normal_map,
    vis_plane=None, vis_light: int = -1,
    gbuffer_mode: bool = True, quantize: bool = True,
    tile_batch: int = SAMPLED_TILE_BATCH,
    interpret: bool = False,
):
    """Material sampling + normal map + (deferred) fp16 G-buffer quantize
    + GGX lighting in one Pallas pass → masked HDR planes.

    ``groups`` is a list of sampling-group dicts from
    texture_quad.block_prep / small_prep, or
    ``{"kind": "direct", "present": (...), "planes": [...]}`` for slots
    sampled upstream. All pixel args are (NT, NPX) planes. The fp16
    quantize + tonemap of the HDR output stay outside (one fused XLA
    elementwise pass), exactly like shade_tonemap_pallas."""
    num_lights = lights.num_lights
    nt, npx = valid.shape

    plan = []
    arrays = []
    plane_kinds = []  # parallel to arrays: "qt" | "tex" | "plane"
    for grp in groups:
        if grp["kind"] == "block":
            plan.append(("block", grp["present"], grp["cpad"],
                         grp.get("expand", 1)))
            arrays.append(grp["qt"])
            plane_kinds.append("qt")
            for k in ("lx", "ly", "tx", "ty"):
                arrays.append(grp[k])
                plane_kinds.append("plane")
        elif grp["kind"] == "small":
            plan.append(("small", grp["present"], grp["cpad"],
                         grp["rows"]))
            arrays.append(grp["tex"])
            plane_kinds.append("tex")
            for k in ("idx", "tx", "ty"):
                arrays.append(grp[k])
                plane_kinds.append("plane")
        elif grp["kind"] == "mipblock":
            from bibim_tpu.ops import texture_quad as tq

            plan.append(("mipblock", grp["present"], grp["cs"]))
            arrays.append(grp["qt"])
            plane_kinds.append("qt")
            for k in tq._MIP_GEOM_KEYS:
                arrays.append(grp[k])
                plane_kinds.append("plane")
        else:
            plan.append(("direct", grp["present"]))
            for p in grp["planes"]:
                arrays.append(p)
                plane_kinds.append("plane")

    px_planes = [*world, *normal, *tangent, valid.astype(jnp.float32)]
    has_vis = vis_plane is not None
    if has_vis:
        px_planes.append(vis_plane)
    arrays.extend(px_planes)
    plane_kinds.extend(["plane"] * len(px_planes))

    g = min(tile_batch, nt)
    nt_pad = -(-nt // g) * g
    if nt_pad != nt:
        def pad_nt(a):
            return jnp.pad(a, ((0, nt_pad - nt),) + ((0, 0),) * (a.ndim - 1))
        arrays = [
            pad_nt(a) if kind in ("qt", "plane") else a
            for a, kind in zip(arrays, plane_kinds)
        ]

    lparams = _pack_lights(lights, num_lights, vis_light)
    if num_lights == 0:
        lparams = jnp.zeros((1, _LROW), jnp.float32)
    gparams = jnp.concatenate([
        jnp.asarray(view_pos, jnp.float32).reshape(3),
        jnp.zeros((2,), jnp.float32),  # exposure/tonemap slots (unused)
        jnp.asarray(enable_normal_map, jnp.float32).reshape(1),
        jnp.zeros((2,), jnp.float32),
    ]).reshape(1, 8)

    block = pl.BlockSpec((g, npx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    for a, kind in zip(arrays, plane_kinds):
        if kind == "qt":
            in_specs.append(
                pl.BlockSpec((g, a.shape[1], a.shape[2]),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        elif kind == "tex":
            in_specs.append(
                pl.BlockSpec(a.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )
        else:
            in_specs.append(block)

    kernel = functools.partial(
        _sampled_kernel, plan=tuple(plan), num_lights=num_lights,
        has_vis=has_vis, gbuffer_mode=gbuffer_mode, quantize=quantize,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nt_pad // g,),
        in_specs=in_specs,
        out_specs=[block] * 3,
        out_shape=[jax.ShapeDtypeStruct((nt_pad, npx), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The 25-tap blend unroll + one-hot temporaries exceed the
            # default 16 MB scope at g=8 (same class as
            # sample_table_block_pallas's measured 30.2 MB at g=16).
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lparams, gparams, *arrays)
    return tuple(o[:nt] for o in out)
