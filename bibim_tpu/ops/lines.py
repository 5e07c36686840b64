"""Line-segment overlay rasterization — the tbn.geom analog.

The reference's geometry shader emits 3 line segments per triangle
(centroid → tangent/bitangent/normal, length 0.05, colored R/G/B,
tbn.geom:16-74) drawn depth-tested but not depth-written
(tbnPipelineParams, main.cpp:817-818). Geometry amplification has no TPU
analog, so segments are a *fixed-size* array built from per-face data, and
rasterization is parametric sampling + masked scatter: lines interpolate
linearly in screen space after the w-divide, exactly like hardware line
primitives.
"""

from __future__ import annotations

import jax.numpy as jnp


def rasterize_lines(
    p0_clip: jnp.ndarray,  # (S,4)
    p1_clip: jnp.ndarray,  # (S,4)
    colors: jnp.ndarray,  # (S,3)
    depth: jnp.ndarray,  # (H,W) scene depth (reversed-Z), read-only
    image: jnp.ndarray,  # (H,W,3) target
    samples: int = 48,
) -> jnp.ndarray:
    """Draw S segments over ``image`` with GREATER_OR_EQUAL depth test."""
    height, width = depth.shape
    eps = 1e-6
    ok = (p0_clip[:, 3] > eps) & (p1_clip[:, 3] > eps)  # (S,)

    def to_screen(p):
        inv_w = 1.0 / jnp.where(p[:, 3] == 0, 1.0, p[:, 3])
        x = (p[:, 0] * inv_w * 0.5 + 0.5) * width
        y = (p[:, 1] * inv_w * 0.5 + 0.5) * height
        z = p[:, 2] * inv_w
        return x, y, z

    x0, y0, z0 = to_screen(p0_clip)
    x1, y1, z1 = to_screen(p1_clip)

    t = jnp.linspace(0.0, 1.0, samples, dtype=jnp.float32)[None, :]  # (1,M)
    xs = x0[:, None] * (1 - t) + x1[:, None] * t  # (S,M)
    ys = y0[:, None] * (1 - t) + y1[:, None] * t
    zs = z0[:, None] * (1 - t) + z1[:, None] * t

    xi = jnp.floor(xs).astype(jnp.int32)
    yi = jnp.floor(ys).astype(jnp.int32)
    in_bounds = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height) & ok[:, None]
    xi_c = jnp.clip(xi, 0, width - 1)
    yi_c = jnp.clip(yi, 0, height - 1)

    # Depth test (reversed-Z GEQ, depth-write off) + [0,1] depth clip.
    scene_z = depth[yi_c, xi_c]
    visible = in_bounds & (zs >= scene_z) & (zs <= 1.0) & (zs >= 0.0)

    # Scatter: out-of-test samples write out of range and are dropped.
    yi_w = jnp.where(visible, yi_c, height)
    col = jnp.broadcast_to(colors[:, None, :], xs.shape + (3,)).reshape(-1, 3)
    return image.at[yi_w.reshape(-1), xi_c.reshape(-1)].set(
        col, mode="drop", unique_indices=False
    )
