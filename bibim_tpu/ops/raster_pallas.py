"""Pallas TPU rasterizer — the performance path.

Same math and semantics as ops/raster.py's XLA loop (homogeneous edge
functions, reversed-Z GREATER_OR_EQUAL, later-candidate tie wins), but work
scales with *actual* per-tile triangle counts instead of a static capacity:

- XLA side: triangle setup + bbox binning (shared with the XLA path), then a
  dense pre-gather of each tile's candidate coefficients into (NT, cap, 16)
  so the kernel reads only contiguous VMEM.
- Pallas kernel: grid over screen tiles; per-tile candidate count arrives via
  scalar prefetch and bounds a dynamic `fori_loop`; candidates are processed
  8 at a time with pure vector ops; the depth resolve packs (z-bits | local
  index) into one int32 so the 8-way argmax is a single vector max-reduce
  (3 low mantissa bits of depth are sacrificed — ~2^-20 relative).
- The kernel emits (candidate index, packed depth) per pixel; triangle ids
  and perspective-correct barycentrics are recovered at pixel rate in XLA
  (cheap gathers), producing the same VisibilityBuffer as the XLA path.

VPU shape notes: tiles are (tile_h, 128) with tile_h a multiple of 8; chunk
ops are (8, tile_h, 128) f32 — lane-aligned throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bibim_tpu.ops.raster import (
    TriangleSetup,
    VisibilityBuffer,
    bin_triangles,
    triangle_setup,
)

CHUNK = 8
_LOW3 = ~7  # mask clearing the 3 index bits from a packed key (python int)


def _pack_coefs(setup: TriangleSetup, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather per-tile candidate coefficients to (NT, cap, 16) f32.

    Layout: [A0 A1 A2 B0 B1 B2 C0 C1 C2 az bz cz aw bw cw pad].
    Invalid slots (id < 0) get all-zero coefficients → never covered.
    """
    t = jnp.maximum(ids, 0)
    live = (ids >= 0).astype(jnp.float32)[..., None]
    coefs = jnp.concatenate(
        [
            setup.edge_a[t],
            setup.edge_b[t],
            setup.edge_c[t],
            setup.z_coef[t],
            setup.w_coef[t],
            jnp.zeros(t.shape + (1,), jnp.float32),
        ],
        axis=-1,
    )
    return coefs * live


def _raster_kernel(
    counts_ref,  # scalar prefetch: (NT,) int32
    coef_ref,  # (1, cap, 16) f32 VMEM block for this tile
    init_zkey_ref,  # (1, th, tw) int32 initial depth bits (or None)
    cand_out,  # (1, th, tw) int32
    zkey_out,  # (1, th, tw) int32 packed depth bits (low 3 bits zero)
    *,
    tile_h: int,
    tile_w: int,
    tiles_x: int,
    cap: int,
    y_origin_static: int,
):
    i = pl.program_id(0)
    count = counts_ref[i]

    row = i // tiles_x
    col = lax.rem(i, tiles_x)
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
        + (row * tile_h + y_origin_static).astype(jnp.float32)
        + 0.5
    )
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
        + (col * tile_w).astype(jnp.float32)
        + 0.5
    )
    px8 = px[None]  # (1, th, tw) broadcasting against (CHUNK,1,1) coefs
    py8 = py[None]

    chunk_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, tile_h, tile_w), 0)

    def body(c, carry):
        best_key, best_cand = carry
        k = c * CHUNK
        blk = coef_ref[0, pl.ds(k, CHUNK), :]  # (CHUNK, 16)

        def col3(j):
            return blk[:, j][:, None, None]  # (CHUNK,1,1)

        e0 = col3(0) * px8 + col3(3) * py8 + col3(6)
        e1 = col3(1) * px8 + col3(4) * py8 + col3(7)
        e2 = col3(2) * px8 + col3(5) * py8 + col3(8)
        zn = col3(9) * px8 + col3(10) * py8 + col3(11)
        wn = col3(12) * px8 + col3(13) * py8 + col3(14)

        live = (k + chunk_idx) < count
        covered = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & live
        ok = covered & (wn > 0.0) & (zn >= 0.0) & (zn <= wn)

        z = zn * pl.reciprocal(jnp.where(wn == 0.0, 1.0, wn), approx=False)
        z = jnp.where(ok, z, -1.0)  # sentinel: negative float → negative bits
        zbits = pltpu.bitcast(z, jnp.int32)
        key = (zbits & _LOW3) | chunk_idx  # later candidate wins ties
        kmax = jnp.max(key, axis=0)  # (th, tw)

        kz = kmax & _LOW3
        accept = kz >= best_key  # int compare == float compare for z >= 0
        cand = jnp.where(accept, k + (kmax & 7), best_cand)
        return jnp.where(accept, kz, best_key), cand

    n_chunks = lax.div(count + (CHUNK - 1), CHUNK)
    if init_zkey_ref is None:
        init_key = jnp.zeros((tile_h, tile_w), jnp.int32)  # depth 0.0 bits
    else:
        init_key = init_zkey_ref[0] & _LOW3
    init_cand = jnp.full((tile_h, tile_w), -1, jnp.int32)
    best_key, best_cand = lax.fori_loop(
        0, n_chunks, body, (init_key, init_cand), unroll=False
    )
    cand_out[0] = best_cand
    zkey_out[0] = best_key


def rasterize_pallas(
    clip: jnp.ndarray,
    tris: jnp.ndarray,
    width: int,
    height: int,
    tile_h: int = 16,
    tile_w: int = 128,
    cap: int = 1024,
    y_origin: int = 0,
    init: VisibilityBuffer | None = None,
    interpret: bool = False,
) -> VisibilityBuffer:
    """Rasterize to a VisibilityBuffer using the Pallas tile kernel.

    ``init`` continues over an existing buffer (depth-tested overlay passes);
    only ``init.depth`` and ``init.tri_id`` participate — new coverage
    replaces (tri_id, bary); surviving pixels keep the init values.
    """
    assert tile_h % 8 == 0 and tile_w % 128 == 0, "VPU-aligned tiles required"
    cap = ((cap + CHUNK - 1) // CHUNK) * CHUNK

    setup = triangle_setup(clip, tris, width, height)
    ids, counts, tiles_y, tiles_x = bin_triangles(
        setup, width, height, tile_h, tile_w, cap
    )
    counts = jnp.minimum(counts, cap)
    nt = tiles_y * tiles_x
    coefs = _pack_coefs(setup, ids)

    pad_h, pad_w = tiles_y * tile_h, tiles_x * tile_w

    def to_tiles(img, fill):
        img = jnp.pad(
            img, ((0, pad_h - height), (0, pad_w - width)), constant_values=fill
        )
        return (
            img.reshape(tiles_y, tile_h, tiles_x, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(nt, tile_h, tile_w)
        )

    base = functools.partial(
        _raster_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        tiles_x=tiles_x,
        cap=cap,
        y_origin_static=int(y_origin),
    )
    tile_spec = pl.BlockSpec(
        (1, tile_h, tile_w), lambda i, counts: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((1, cap, 16), lambda i, counts: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [counts, coefs]
    if init is not None:
        in_specs.append(tile_spec)
        inputs.append(
            to_tiles(lax.bitcast_convert_type(init.depth, jnp.int32), 0x7F7FFFFF)
        )

        def kernel(counts_ref, coef_ref, init_ref, cand_out, zkey_out):
            return base(counts_ref, coef_ref, init_ref, cand_out, zkey_out)
    else:

        def kernel(counts_ref, coef_ref, cand_out, zkey_out):
            return base(counts_ref, coef_ref, None, cand_out, zkey_out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=[tile_spec, tile_spec],
    )
    cand, zkey = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, tile_h, tile_w), jnp.int32),
            jax.ShapeDtypeStruct((nt, tile_h, tile_w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)

    # Recover global tri ids: cand indexes this tile's candidate list.
    tile_of = (
        jnp.arange(nt, dtype=jnp.int32)[:, None, None]
        .repeat(tile_h, 1)
        .repeat(tile_w, 2)
    )
    tri_id = jnp.where(
        cand >= 0, ids[tile_of, jnp.maximum(cand, 0)], -1
    )
    depth = lax.bitcast_convert_type(jnp.maximum(zkey, 0), jnp.float32)

    def untile(x):
        img = (
            x.reshape(tiles_y, tiles_x, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(tiles_y * tile_h, tiles_x * tile_w)
        )
        return img[:height, :width]

    tri_img = untile(tri_id)
    depth_img = untile(depth)

    # Perspective-correct barycentrics at pixel rate from the winning
    # triangle's edge coefficients (cheap gathers; see ops/raster.py docs).
    t = jnp.maximum(tri_img, 0)
    ea, eb, ec = setup.edge_a[t], setup.edge_b[t], setup.edge_c[t]
    ys = jnp.arange(height, dtype=jnp.float32)[:, None, None] + 0.5 + y_origin
    xs = jnp.arange(width, dtype=jnp.float32)[None, :, None] + 0.5
    e = ea * xs + eb * ys + ec  # (H,W,3)
    esum = jnp.sum(e, axis=-1, keepdims=True)
    esum = jnp.where(esum == 0.0, 1.0, esum)
    bary = (e / esum)[..., :2]
    hit = (tri_img >= 0)[..., None]
    bary = jnp.where(hit, bary, 0.0)

    return VisibilityBuffer(tri_id=tri_img, bary=bary, depth=depth_img)
