"""Framebuffer-band sharding over a device mesh (sort-middle rendering).

Each device: replicated geometry → vertex transform → bins/rasterizes only
its horizontal band of the frame (rasterize(..., viewport_height, y_origin))
→ shades its band. ``shard_map`` with the image rows sharded over the mesh
axis; XLA inserts the (single) gather when the host reads the image. Bands
are independent so there are no halo exchanges (SURVEY.md §5 "distributed
communication backend").

Overlay passes (light spheres / gizmo / TBN) are currently composited on the
full gathered frame by the caller when needed; the heavy work (raster +
G-buffer + GGX) is what shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from bibim_tpu.ops.geometry import assemble_scene
from bibim_tpu.ops.raster import rasterize
from bibim_tpu.ops.tonemap import srgb_encode, to_u8
from bibim_tpu.pipeline.framegraph import (
    FrameParams,
    MaterialTextures,
    RenderSettings,
    ViewBlock,
    shade_visibility,
)
from bibim_tpu.scene.scene import SceneData


def render_frame_sharded(
    mesh: Mesh,
    scene: SceneData,
    view_block: ViewBlock,
    frame_params: FrameParams,
    materials: MaterialTextures,
    settings: RenderSettings,
):
    """Render one frame with the framebuffer sharded over ``mesh``.

    Returns an (H, W, 3) uint8 image whose rows are sharded over the mesh
    axis (device_get assembles it on the host).
    """
    (axis_name,) = mesh.axis_names
    n = mesh.devices.size
    if settings.height % n != 0:
        raise ValueError(f"height {settings.height} not divisible by {n} devices")
    band_h = settings.height // n

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),  # everything replicated
        out_specs=P(axis_name, None, None),  # image rows sharded
    )
    def band_fn(scene, view_block, frame_params, materials):
        k = lax.axis_index(axis_name)
        y0 = (k * band_h).astype(jnp.float32)

        soup = assemble_scene(scene.batches, view_block.view, view_block.proj)
        vis = rasterize(
            soup.clip,
            soup.tris,
            settings.width,
            band_h,
            settings.tile_h,
            settings.tile_w,
            settings.bin_cap,
            viewport_height=settings.height,
            y_origin=y0,
        )
        _hdr, ldr, _gb = shade_visibility(
            vis, soup, materials, scene.lights, view_block, frame_params, settings
        )
        out = srgb_encode(ldr) if settings.srgb_output else jnp.clip(ldr, 0.0, 1.0)
        return to_u8(out)

    fn = jax.jit(band_fn)
    return fn(scene, view_block, frame_params, materials)
