"""Perspective-correct attribute interpolation from a visibility buffer.

The fixed-function interpolation Vulkan does between vertex and fragment
stages (gbuffer.vert outputs → gbuffer.frag inputs), reformulated as dense
pixel-rate gathers: per pixel, fetch the winning triangle's three corner
attributes and blend with the perspective-correct barycentrics the
rasterizer stored.
"""

from __future__ import annotations

import jax.numpy as jnp

from bibim_tpu.ops.raster import VisibilityBuffer


def corner_indices(vis: VisibilityBuffer, tris: jnp.ndarray) -> jnp.ndarray:
    """(H,W,3) corner vertex ids of each pixel's triangle (0 for misses)."""
    safe_tri = jnp.maximum(vis.tri_id, 0)
    return tris[safe_tri]


def interpolate(vis: VisibilityBuffer, corners: jnp.ndarray, attr: jnp.ndarray) -> jnp.ndarray:
    """Blend an (N,K) vertex attribute to (H,W,K) pixels."""
    a = attr[corners]  # (H,W,3,K)
    b0 = vis.bary[..., 0:1]
    b1 = vis.bary[..., 1:2]
    b2 = 1.0 - b0 - b1
    return a[..., 0, :] * b0 + a[..., 1, :] * b1 + a[..., 2, :] * b2
