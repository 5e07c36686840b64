"""Texture sampling.

Replaces the reference's immutable samplers (createImmutableSamplers,
render.cpp:1338-1371): NEAREST and LINEAR filters with REPEAT addressing and
no mip chain (maxLod = 0; images are created with mipLevels=1,
resource.cpp:191). Level-0 bilinear here is therefore *exact* parity for
material sampling (SMP_LINEAR) and same-size G-buffer reads (SMP_NEAREST)
collapse to identity gathers in the fused pipeline.

Mip-chain (trilinear) sampling is an additive capability for minification
quality (BASELINE config 2): mips are packed into one flat texel buffer
(`MipAtlas`) so a per-pixel LOD turns into a single flat gather — the
XLA-friendly formulation of a mip pyramid. LOD derives from 2×2 quad UV
differences, matching GPU derivative semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def _wrap(i, size):
    """REPEAT addressing (VK_SAMPLER_ADDRESS_MODE_REPEAT)."""
    return jnp.remainder(i, size)


def sample_nearest(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-filter sample. tex (Ht,Wt,C) uint8 or float; uv (...,2) in [0,1)."""
    h, w = tex.shape[0], tex.shape[1]
    x = _wrap(jnp.floor(uv[..., 0] * w).astype(jnp.int32), w)
    y = _wrap(jnp.floor(uv[..., 1] * h).astype(jnp.int32), h)
    out = tex[y, x]
    if tex.dtype == jnp.uint8:
        out = out.astype(jnp.float32) * (1.0 / 255.0)
    return out


def sample_bilinear(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with REPEAT wrap; texel centers at +0.5 (Vulkan)."""
    h, w = tex.shape[0], tex.shape[1]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0i = _wrap(x0.astype(jnp.int32), w)
    y0i = _wrap(y0.astype(jnp.int32), h)
    x1i = _wrap(x0i + 1, w)
    y1i = _wrap(y0i + 1, h)

    def fetch(yi, xi):
        t = tex[yi, xi]
        return t.astype(jnp.float32) * (1.0 / 255.0) if tex.dtype == jnp.uint8 else t

    t00 = fetch(y0i, x0i)
    t01 = fetch(y0i, x1i)
    t10 = fetch(y1i, x0i)
    t11 = fetch(y1i, x1i)
    top = t00 * (1 - tx) + t01 * tx
    bot = t10 * (1 - tx) + t11 * tx
    return top * (1 - ty) + bot * ty


class MipAtlas(NamedTuple):
    """All mip levels of one texture packed into a flat texel buffer."""

    texels: jnp.ndarray  # (total, C)
    offsets: jnp.ndarray  # (L,) int32 flat offset of each level
    heights: jnp.ndarray  # (L,) int32
    widths: jnp.ndarray  # (L,) int32
    num_levels: int  # static


def build_mip_atlas(mips: list[np.ndarray]) -> MipAtlas:
    offsets = np.zeros(len(mips), np.int32)
    total = 0
    for i, m in enumerate(mips):
        offsets[i] = total
        total += m.shape[0] * m.shape[1]
    return MipAtlas(
        texels=jnp.asarray(np.concatenate([m.reshape(-1, m.shape[-1]) for m in mips])),
        offsets=jnp.asarray(offsets),
        heights=jnp.asarray(np.asarray([m.shape[0] for m in mips], np.int32)),
        widths=jnp.asarray(np.asarray([m.shape[1] for m in mips], np.int32)),
        num_levels=len(mips),
    )


def _sample_level_flat(atlas: MipAtlas, uv: jnp.ndarray, level: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at an integer per-pixel level via flat gathers."""
    level = jnp.clip(level, 0, atlas.num_levels - 1)
    h = atlas.heights[level].astype(jnp.float32)
    w = atlas.widths[level].astype(jnp.float32)
    off = atlas.offsets[level]

    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    wi = w.astype(jnp.int32)
    hi = h.astype(jnp.int32)
    x0i = _wrap(x0.astype(jnp.int32), wi)
    y0i = _wrap(y0.astype(jnp.int32), hi)
    x1i = _wrap(x0i + 1, wi)
    y1i = _wrap(y0i + 1, hi)

    def fetch(yi, xi):
        t = atlas.texels[off + yi * wi + xi]
        return (
            t.astype(jnp.float32) * (1.0 / 255.0)
            if atlas.texels.dtype == jnp.uint8
            else t
        )

    t00, t01 = fetch(y0i, x0i), fetch(y0i, x1i)
    t10, t11 = fetch(y1i, x0i), fetch(y1i, x1i)
    top = t00 * (1 - tx) + t01 * tx
    bot = t10 * (1 - tx) + t11 * tx
    return top * (1 - ty) + bot * ty


def quad_uv_lod(uv: jnp.ndarray, tex_h: int, tex_w: int) -> jnp.ndarray:
    """Per-pixel LOD from 2×2 quad finite differences of an (H,W,2) UV image
    (the GPU derivative model). Returns (H,W) float LOD ≥ 0."""
    h, w = uv.shape[0], uv.shape[1]
    # quad-constant derivatives: difference within each 2x2 block
    uvq = uv[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2, 2)
    dx = (uvq[:, :, :, 1] - uvq[:, :, :, 0])[:, :, :, None, :]  # (h/2,2,w/2,1,2)
    dy = (uvq[:, 1] - uvq[:, 0])[:, None, :, :, :]  # (h/2,1,w/2,2,2)
    dx = jnp.broadcast_to(dx, (h // 2, 2, w // 2, 2, 2)).reshape(h - h % 2, w - w % 2, 2)
    dy = jnp.broadcast_to(dy, (h // 2, 2, w // 2, 2, 2)).reshape(h - h % 2, w - w % 2, 2)
    scale = jnp.stack(
        [jnp.asarray(tex_w, jnp.float32), jnp.asarray(tex_h, jnp.float32)]
    )
    rho = jnp.maximum(
        jnp.linalg.norm(dx * scale, axis=-1), jnp.linalg.norm(dy * scale, axis=-1)
    )
    lod = jnp.log2(jnp.maximum(rho, 1e-12))
    lod = jnp.pad(lod, ((0, h % 2), (0, w % 2)), mode="edge")
    return jnp.maximum(lod, 0.0)


def sample_trilinear(atlas: MipAtlas, uv: jnp.ndarray, lod: jnp.ndarray) -> jnp.ndarray:
    """Trilinear (bilinear × 2 levels + lerp) sample at per-pixel LOD."""
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    s0 = _sample_level_flat(atlas, uv, l0)
    s1 = _sample_level_flat(atlas, uv, l0 + 1)
    return s0 * (1 - frac) + s1 * frac
