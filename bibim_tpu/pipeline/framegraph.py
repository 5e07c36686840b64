"""The frame graph: one jit-compiled function from scene pytree to image.

Vulkan's five-subpass deferred render pass (main.cpp:415-675) — GBufferWrite →
Lighting → ForwardLighting → HDR → Overlay — collapses into one traced
function; XLA's dependency scheduling replaces subpass dependencies and
barriers. Stage mapping:

1. vertex transforms (gbuffer.vert)          → ops.geometry.assemble_scene
2. rasterizer + depth test                   → ops.raster.rasterize
3. G-buffer materialization (gbuffer.frag)   → gathers + texture sampling,
   with optional RGBA16F quantization emulating the reference's attachments
   (render.h:93-94)
4. GGX lighting (brdf.frag) / buffer-viz     → ops.shading.shade_pbr
5. tone mapping (hdr_tone_mapping.frag)      → ops.tonemap
6. overlays (subpass 4, main.cpp:128-172):   TBN lines, light spheres,
   corner gizmo — extra raster/composite passes on the LDR image
7. sRGB encode (SRGB swapchain store)        → u8 framebuffer

Everything per-frame-dynamic (camera, lights, toggles, instance matrices) is
traced; everything structural (image size, light count, scene shapes,
visualization mode) is static and recompiles on change, exactly like
rebuilding Vulkan pipelines on resize (onWindowResize, main.cpp:1042-1070).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from enum import IntEnum
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bibim_tpu import math3d as m3
from bibim_tpu.ops.geometry import assemble_scene
from bibim_tpu.ops.interpolate import corner_indices, interpolate
from bibim_tpu.ops.lines import rasterize_lines
from bibim_tpu.ops.raster import VisibilityBuffer, rasterize
from bibim_tpu.ops.raster_pallas import rasterize_pallas
from bibim_tpu.ops.shading import shade_pbr
from bibim_tpu.ops.texture import sample_bilinear
from bibim_tpu.ops.tonemap import srgb_encode, to_u8, tone_map
from bibim_tpu.scene.lights import Lights
from bibim_tpu.scene.scene import DrawBatch, SceneData


class GBufferViz(IntEnum):
    """GBufferVisualizingOption (scene.h:27-34)."""

    POSITION = 0
    NORMAL = 1
    ALBEDO = 2
    MRHA = 3
    MATERIAL_INDEX = 4
    RENDERED_SCENE = 5


class ViewBlock(NamedTuple):
    """ViewUniformBlock (render.h:329-334)."""

    view: jnp.ndarray  # (4,4)
    proj: jnp.ndarray  # (4,4)
    view_pos: jnp.ndarray  # (3,)
    enable_normal_map: jnp.ndarray  # scalar int32 (traced toggle)


class FrameParams(NamedTuple):
    """FrameUniformBlock minus the static viz index (render.h:321-327)."""

    enable_tone_mapping: jnp.ndarray  # scalar int32
    exposure: jnp.ndarray  # scalar float32


class MaterialTextures(NamedTuple):
    """One material's six maps (PerMaterial descriptor set,
    standard_sets.glsl SET_MATERIAL). (H,W,4) uint8 each; sizes static."""

    albedo: jnp.ndarray
    metallic: jnp.ndarray
    roughness: jnp.ndarray
    ao: jnp.ndarray
    normal: jnp.ndarray
    height: jnp.ndarray


class MaterialMips(NamedTuple):
    """Mip-pyramid variant of MaterialTextures: six MipAtlas entries.

    An additive capability over the reference (its samplers have maxLod=0);
    enables trilinear minification (BASELINE config 2)."""

    albedo: object
    metallic: object
    roughness: object
    ao: object
    normal: object
    height: object


class OverlayResources(NamedTuple):
    """Static overlay geometry: light-sphere mesh + gizmo mesh."""

    sphere_positions: jnp.ndarray  # (Vs,3) r=0.1 UV sphere (main.cpp:950-967)
    sphere_tris: jnp.ndarray  # (Fs,3)
    gizmo_positions: jnp.ndarray  # (Vg,3)
    gizmo_normals: jnp.ndarray  # (Vg,3)
    gizmo_colors: jnp.ndarray  # (Vg,3)
    gizmo_tris: jnp.ndarray  # (Fg,3)


@dataclass(frozen=True)
class RenderSettings:
    """Static pipeline configuration (jit specialization key)."""

    width: int = 1280
    height: int = 720
    deferred: bool = True  # RenderPassType (scene.h:64)
    shading: str = "pbr"  # "pbr" (brdf.frag) or "flat" (gizmo.frag-style Lambert)
    gbuffer_viz: GBufferViz = GBufferViz.RENDERED_SCENE
    quantize_fp16: bool = True  # emulate RGBA16F G-buffer/HDR attachments
    show_lights: bool = True
    show_gizmo: bool = True
    show_tbn: bool = False
    srgb_output: bool = True
    raster: str = "auto"  # "auto" | "pallas" (TPU kernel) | "xla"
    tile_h: int = 64
    tile_w: int = 128
    bin_cap: int = 4096  # per-tile triangle capacity (XLA path; worst tile)
    pallas_tile_h: int = 16
    pallas_cap: int = 768
    # Shading executes in this many row bands under lax.scan so pixel-rate
    # temporaries stay ~frame_size/bands. One giant fused frame allocates
    # multi-GB of temps and XLA spills buffers to slow memory (S(1)),
    # making every gather ~500x slower on tunnel-attached TPUs.
    shade_bands: int = 8
    # Per-batch material indices into a materials tuple (per-draw material
    # descriptor binding analog, scene.cpp:198-200); None = all material 0.
    batch_material_ids: tuple | None = None
    gizmo_extent: int = 100  # gGizmo.ViewportExtent (scene.h:14)
    tbn_length: float = 0.05  # tbn.geom LENGTH


def _q16(x: jnp.ndarray, enable: bool) -> jnp.ndarray:
    """RGBA16F attachment round-trip (render.h:93-94)."""
    return x.astype(jnp.float16).astype(jnp.float32) if enable else x


def dispatch_rasterize(clip, tris, width, height, settings: RenderSettings,
                       init=None, cap=None):
    """Choose the raster backend: Pallas kernel on TPU, XLA loop elsewhere."""
    backend = settings.raster
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        return rasterize_pallas(
            clip, tris, width, height,
            settings.pallas_tile_h, settings.tile_w,
            cap or settings.pallas_cap, init=init,
        )
    return rasterize(
        clip, tris, width, height,
        settings.tile_h, settings.tile_w, cap or settings.bin_cap, init=init,
    )


def _sample_material(mats, uv):
    """Sample one material's six maps at pixel-rate UVs.

    MaterialTextures → level-0 bilinear (exact reference parity: samplers
    have no mip chain). MaterialMips → trilinear with quad-derivative LOD.
    Returns (albedo(…,3), normal_tap(…,3), mrah(…,4)).
    """
    if isinstance(mats, MaterialMips):
        from bibim_tpu.ops.texture import quad_uv_lod, sample_trilinear

        def tap(atlas):
            lod = quad_uv_lod(uv, atlas.heights[0], atlas.widths[0])
            return sample_trilinear(atlas, uv, lod)

        albedo = tap(mats.albedo)[..., :3]
        nmap = tap(mats.normal)[..., :3]
        mrah = jnp.concatenate(
            [
                tap(mats.metallic)[..., 0:1],
                tap(mats.roughness)[..., 0:1],
                tap(mats.ao)[..., 0:1],
                tap(mats.height)[..., 0:1],
            ],
            axis=-1,
        )
        return albedo, nmap, mrah

    albedo = sample_bilinear(mats.albedo, uv)[..., :3]
    nmap = sample_bilinear(mats.normal, uv)[..., :3]
    mrah = jnp.concatenate(
        [
            sample_bilinear(mats.metallic, uv)[..., 0:1],
            sample_bilinear(mats.roughness, uv)[..., 0:1],
            sample_bilinear(mats.ao, uv)[..., 0:1],
            sample_bilinear(mats.height, uv)[..., 0:1],
        ],
        axis=-1,
    )
    return albedo, nmap, mrah


def materialize_gbuffer(vis, soup, mats, enable_normal_map, quantize: bool):
    """gbuffer.frag port: world pos, (optionally normal-mapped) normal,
    albedo, MRAH, material-index placeholder.

    ``mats`` is one material (MaterialTextures/MaterialMips) or a tuple of
    them; with a tuple, each pixel selects by the winning triangle's batch
    material id — the per-draw material descriptor binding analog."""
    corners = corner_indices(vis, soup.tris)
    valid = (vis.tri_id >= 0)[..., None]

    pos_world = interpolate(vis, corners, soup.world)
    uv = interpolate(vis, corners, soup.uv)

    n = interpolate(vis, corners, soup.normal)
    t = interpolate(vis, corners, soup.tangent)
    b = jnp.cross(n, t)  # B = cross(N, T) (gbuffer.vert:28)

    if isinstance(mats, (MaterialTextures, MaterialMips)):
        albedo, nmap, mrah = _sample_material(mats, uv)
    else:
        mat_px = soup.mat_id[corners[..., 0]][..., None]  # (H,W,1)
        albedo = nmap = mrah = None
        for mi, m in enumerate(mats):
            a_i, n_i, r_i = _sample_material(m, uv)
            if albedo is None:
                albedo, nmap, mrah = a_i, n_i, r_i
            else:
                sel = mat_px == mi
                albedo = jnp.where(sel, a_i, albedo)
                nmap = jnp.where(sel, n_i, nmap)
                mrah = jnp.where(sel, r_i, mrah)

    nmap = nmap * 2.0 - 1.0
    n_mapped = t * nmap[..., 0:1] + b * nmap[..., 1:2] + n * nmap[..., 2:3]
    normal = jnp.where(jnp.asarray(enable_normal_map) != 0, n_mapped, n)
    matindex = jnp.where(
        valid, jnp.asarray([1.0, 0.0, 0.0]), jnp.zeros(3)
    )  # gbuffer.frag:32 placeholder

    # Clear color is 0 (recordCommand clear values, main.cpp:82-86).
    gb = {
        "position": _q16(jnp.where(valid, pos_world, 0.0), quantize),
        "normal": _q16(jnp.where(valid, normal, 0.0), quantize),
        "albedo": _q16(jnp.where(valid, albedo, 0.0), quantize),
        "mrah": _q16(jnp.where(valid, mrah, 0.0), quantize),
        "matindex": _q16(matindex, quantize),
    }
    return gb, valid


def _composite_light_spheres(ldr, vis, lights: Lights, overlay: OverlayResources,
                             view_proj, settings: RenderSettings):
    """Light-source spheres (light.vert/frag + main.cpp:138-148): instanced
    sphere at each light position, flat light color, depth-tested against the
    scene, drawn after tone mapping."""
    num_l = lights.num_lights
    vs = overlay.sphere_positions  # (V,3)
    # modelMat = translate(light.pos) (light.vert:11-12)
    world = vs[None, :, :] + lights.pos[:, None, :]  # (L,V,3)
    p4 = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    clip = jnp.einsum("lvk,mk->lvm", p4, view_proj,
                      precision=jax.lax.Precision.HIGHEST).reshape(-1, 4)
    nv = vs.shape[0]
    offs = (jnp.arange(num_l, dtype=jnp.int32) * nv)[:, None, None]
    tris = (overlay.sphere_tris[None] + offs).reshape(-1, 3)

    init = VisibilityBuffer(
        tri_id=jnp.full_like(vis.tri_id, -1), bary=jnp.zeros_like(vis.bary),
        depth=vis.depth,
    )
    # Same cap as the main pass so both passes share one compiled kernel
    # configuration (compilation through the remote tunnel is expensive).
    svis = dispatch_rasterize(
        clip, tris, settings.width, settings.height, settings, init=init
    )
    tris_per = overlay.sphere_tris.shape[0]
    light_idx = jnp.clip(svis.tri_id // tris_per, 0, num_l - 1)
    color = lights.color[light_idx]  # (H,W,3)
    hit = (svis.tri_id >= 0)[..., None]
    return jnp.where(hit, color, ldr), svis.depth


def _composite_gizmo(ldr, view, proj, overlay: OverlayResources,
                     settings: RenderSettings):
    """Orientation gizmo (gizmo.vert/frag): 100×100 top-right viewport with
    its own cleared depth (main.cpp:150-171), Lambert-lit in view space."""
    ext = settings.gizmo_extent
    # gizmo.vert:12-27 — keep main view rotation; camera 27 units back; 30° fov.
    rot = view[:3, :3]
    look = view[2, :3]
    view_pos = look * -27.0
    trans = -rot @ view_pos
    gz_view = view.at[:3, 3].set(trans)
    d = 1.0 / jnp.tan(0.261799)
    gz_proj = proj.at[0, 0].set(d).at[1, 1].set(-d)
    vp = m3.matmul(gz_proj, gz_view)

    p4 = jnp.concatenate(
        [overlay.gizmo_positions, jnp.ones_like(overlay.gizmo_positions[..., :1])],
        axis=-1,
    )
    clip = jnp.einsum("vk,mk->vm", p4, vp, precision=jax.lax.Precision.HIGHEST)
    gvis = dispatch_rasterize(
        clip, overlay.gizmo_tris, ext, ext, settings,
        cap=min(settings.bin_cap, 1024),
    )
    corners = corner_indices(gvis, overlay.gizmo_tris)
    n_view = interpolate(
        gvis, corners,
        jnp.einsum("vk,mk->vm", overlay.gizmo_normals, rot,
                   precision=jax.lax.Precision.HIGHEST),
    )
    col = interpolate(gvis, corners, overlay.gizmo_colors)
    # gizmo.frag: L = -normalize(vec3(0,0,1)); diff = max(dot(L,N),0)
    n_unit = n_view / jnp.maximum(jnp.linalg.norm(n_view, axis=-1, keepdims=True), 1e-20)
    diff = jnp.maximum(-n_unit[..., 2:3], 0.0)
    gz_rgb = col * diff
    hit = (gvis.tri_id >= 0)[..., None]

    x0 = settings.width - ext
    region = ldr[0:ext, x0 : settings.width]
    region = jnp.where(hit, gz_rgb, region)
    return ldr.at[0:ext, x0 : settings.width].set(region)


def _composite_tbn(ldr, soup, vis, view_proj, settings: RenderSettings):
    """TBN visualization (tbn.vert/geom/frag): per-face centroid→T/B/N
    segments in world space, R/G/B, depth-tested, no depth write."""
    tri_world = soup.world[soup.tris]  # (T,3,3)
    centroid = tri_world.mean(axis=1)  # (T,3)

    def face_avg(attr):
        a = attr[soup.tris]  # (T,3,3)
        v = a.mean(axis=1)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)

    ends = {
        (1.0, 0.0, 0.0): centroid + face_avg(soup.tangent) * settings.tbn_length,
        (0.0, 1.0, 0.0): centroid
        + face_avg(jnp.cross(soup.normal, soup.tangent)) * settings.tbn_length,
        (0.0, 0.0, 1.0): centroid + face_avg(soup.normal) * settings.tbn_length,
    }

    def project(p):
        p4 = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        return jnp.einsum("vk,mk->vm", p4, view_proj,
                          precision=jax.lax.Precision.HIGHEST)

    c_clip = project(centroid)
    for color, end in ends.items():
        ldr = rasterize_lines(
            c_clip,
            project(end),
            jnp.broadcast_to(jnp.asarray(color), centroid.shape),
            vis.depth,
            ldr,
        )
    return ldr


def _shade_band(vis, soup, materials, lights, view_block, frame_params,
                settings: RenderSettings):
    """Subpasses 0-3 for one visibility-buffer band:
    G-buffer materialize → lighting / buffer-viz → HDR quantize → tonemap."""
    gb, valid = materialize_gbuffer(
        vis, soup, materials, view_block.enable_normal_map,
        settings.quantize_fp16 and settings.deferred,
    )

    if settings.deferred and settings.gbuffer_viz != GBufferViz.RENDERED_SCENE:
        # buffer_visualize.frag: raw G-buffer rgb into the HDR target.
        plane = [gb["position"], gb["normal"], gb["albedo"], gb["mrah"][..., :3],
                 gb["matindex"]][int(settings.gbuffer_viz)]
        hdr = plane[..., :3]
    else:
        shaded = shade_pbr(
            gb["position"], gb["normal"], gb["albedo"],
            gb["mrah"][..., 0:1], gb["mrah"][..., 1:2], gb["mrah"][..., 2:3],
            lights, view_block.view_pos,
        )
        # Background: lighting runs on cleared G-buffer in the reference;
        # masked here → clear color black (see SURVEY §7 conventions).
        hdr = jnp.where(valid, shaded, 0.0)

    hdr = _q16(hdr, settings.quantize_fp16)
    ldr = tone_map(hdr, frame_params.enable_tone_mapping, frame_params.exposure)
    return hdr, ldr, gb


def shade_visibility(vis, soup, materials, lights, view_block, frame_params,
                     settings: RenderSettings):
    """Banded shading over the visibility buffer (see shade_bands docs)."""
    height = vis.tri_id.shape[0]
    bands = max(1, min(settings.shade_bands, height))
    if height % bands != 0:
        bands = 1  # odd sizes: single band (tests/tiny frames)

    if bands == 1:
        return _shade_band(vis, soup, materials, lights, view_block,
                           frame_params, settings)

    bh = height // bands

    def to_bands(x):
        return x.reshape((bands, bh) + x.shape[1:])

    xs = VisibilityBuffer(
        tri_id=to_bands(vis.tri_id),
        bary=to_bands(vis.bary),
        depth=to_bands(vis.depth),
    )

    def band_fn(_, vis_b):
        hdr_b, ldr_b, gb_b = _shade_band(
            vis_b, soup, materials, lights, view_block, frame_params, settings
        )
        return None, (hdr_b, ldr_b, gb_b)

    _, (hdr, ldr, gb) = jax.lax.scan(band_fn, None, xs)

    def merge(x):
        return x.reshape((height,) + x.shape[2:])

    return merge(hdr), merge(ldr), {k: merge(v) for k, v in gb.items()}


@functools.partial(jax.jit, static_argnames=("settings",))
def render_frame(
    scene: SceneData,
    view_block: ViewBlock,
    frame_params: FrameParams,
    materials: MaterialTextures,
    overlay: OverlayResources | None,
    settings: RenderSettings,
):
    """Render one frame. Returns dict with 'image' (H,W,3) uint8 plus
    intermediates ('hdr', 'depth', G-buffer planes) for debugging/tests."""
    width, height = settings.width, settings.height

    soup = assemble_scene(
        scene.batches, view_block.view, view_block.proj,
        settings.batch_material_ids,
    )
    vis = dispatch_rasterize(soup.clip, soup.tris, width, height, settings)

    if settings.shading == "flat":
        # Unlit/flat-color Lambert in view space (gizmo.frag model) — used by
        # benchmark config 1 and debug renders of color-only meshes.
        corners = corner_indices(vis, soup.tris)
        valid = (vis.tri_id >= 0)[..., None]
        n_world = interpolate(vis, corners, soup.normal)
        rot = view_block.view[:3, :3]
        n_view = jnp.einsum("hwk,mk->hwm", n_world, rot,
                            precision=jax.lax.Precision.HIGHEST)
        n_unit = n_view / jnp.maximum(
            jnp.linalg.norm(n_view, axis=-1, keepdims=True), 1e-20
        )
        col = interpolate(vis, corners, soup.color)
        hdr = jnp.where(valid, col * jnp.maximum(-n_unit[..., 2:3], 0.0), 0.0)
        gb = None
        ldr = tone_map(
            _q16(hdr, settings.quantize_fp16),
            frame_params.enable_tone_mapping, frame_params.exposure,
        )
        view_proj = m3.matmul(view_block.proj, view_block.view)
        if settings.show_lights and overlay is not None and scene.lights.num_lights > 0:
            ldr, _ = _composite_light_spheres(
                ldr, vis, scene.lights, overlay, view_proj, settings
            )
        if settings.show_gizmo and overlay is not None:
            ldr = _composite_gizmo(
                ldr, view_block.view, view_block.proj, overlay, settings
            )
        out = srgb_encode(ldr) if settings.srgb_output else jnp.clip(ldr, 0.0, 1.0)
        return {
            "image": to_u8(out),
            "ldr": ldr,
            "hdr": hdr,
            "depth": vis.depth,
            "tri_id": vis.tri_id,
            "gbuffer": {},
        }

    hdr, ldr, gb = shade_visibility(
        vis, soup, materials, scene.lights, view_block, frame_params, settings
    )

    view_proj = m3.matmul(view_block.proj, view_block.view)
    if settings.show_tbn and overlay is not None:
        ldr = _composite_tbn(ldr, soup, vis, view_proj, settings)
    if settings.show_lights and overlay is not None and scene.lights.num_lights > 0:
        ldr, _ = _composite_light_spheres(
            ldr, vis, scene.lights, overlay, view_proj, settings
        )
    if settings.show_gizmo and overlay is not None:
        ldr = _composite_gizmo(ldr, view_block.view, view_block.proj, overlay, settings)

    out = srgb_encode(ldr) if settings.srgb_output else jnp.clip(ldr, 0.0, 1.0)
    return {
        "image": to_u8(out),
        "ldr": ldr,
        "hdr": hdr,
        "depth": vis.depth,
        "tri_id": vis.tri_id,
        "gbuffer": gb,
    }


def material_mips_from_set(material_set, index: int) -> MaterialMips:
    """Like material_textures_from_set but with full mip pyramids packed
    into flat atlases (trilinear sampling path)."""
    from bibim_tpu.assets.materials import PBRMapType
    from bibim_tpu.ops.texture import build_mip_atlas

    def atlas(t):
        return build_mip_atlas(material_set.get_pbr_map_or_default(index, t))

    return MaterialMips(
        albedo=atlas(PBRMapType.ALBEDO),
        metallic=atlas(PBRMapType.METALLIC),
        roughness=atlas(PBRMapType.ROUGHNESS),
        ao=atlas(PBRMapType.AO),
        normal=atlas(PBRMapType.NORMAL),
        height=atlas(PBRMapType.HEIGHT),
    )


def material_textures_from_set(material_set, index: int) -> MaterialTextures:
    """Bind one material's maps with per-map default fallback
    (createFrame material descriptor wiring, render.cpp:1598-1636)."""
    from bibim_tpu.assets.materials import PBRMapType

    def level0(t):
        return jnp.asarray(material_set.get_pbr_map_or_default(index, t)[0])

    return MaterialTextures(
        albedo=level0(PBRMapType.ALBEDO),
        metallic=level0(PBRMapType.METALLIC),
        roughness=level0(PBRMapType.ROUGHNESS),
        ao=level0(PBRMapType.AO),
        normal=level0(PBRMapType.NORMAL),
        height=level0(PBRMapType.HEIGHT),
    )


def make_overlay_resources() -> OverlayResources:
    """Light-sphere mesh (r=0.1, 16×16 — main.cpp:950-954) + gizmo.obj."""
    from bibim_tpu.assets.meshgen import generate_uv_sphere_mesh
    from bibim_tpu.assets.obj import load_obj
    from bibim_tpu.utils.config import get_resource_root

    sphere = generate_uv_sphere_mesh(0.1, 16, 16)
    gizmo = load_obj(get_resource_root().common("gizmo.obj"))
    return OverlayResources(
        sphere_positions=jnp.asarray(sphere.positions),
        sphere_tris=jnp.asarray(sphere.indices),
        gizmo_positions=jnp.asarray(gizmo.positions),
        gizmo_normals=jnp.asarray(gizmo.normals),
        gizmo_colors=jnp.asarray(
            gizmo.colors if gizmo.colors is not None else np.ones_like(gizmo.positions)
        ),
        gizmo_tris=jnp.asarray(gizmo.indices),
    )
