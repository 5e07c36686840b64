"""The frame graph: one jit-compiled function from scene pytree to image.

Vulkan's five-subpass deferred render pass (main.cpp:415-675) — GBufferWrite
→ Lighting → ForwardLighting → HDR → Overlay — collapses into one traced
function; XLA's dependency scheduling replaces subpass dependencies and
barriers. Stage mapping (round-2 fused architecture):

1. vertex transforms (gbuffer.vert)       → ops.geometry.assemble_scene
2. raster + depth + attribute interp      → ops.fused (one Pallas kernel:
   (fixed-function raster + vertex→frag     per-tile DMA'd candidate
   interpolation)                           records, one-hot MXU resolve)
3. material sampling (gbuffer.frag taps)  → ops.texture_quad (one gather
                                            per pixel per size-group;
                                            MXU one-hot for small maps)
4. G-buffer materialization + GGX         → planar fp16 quantization (the
   lighting (brdf.frag) / buffer-viz        RGBA16F attachment emulation)
                                            + ops.shading_planar
5. tone mapping (hdr_tone_mapping.frag)   → ops.tonemap (planar)
6. overlays (subpass 4, main.cpp:128-172) → TBN lines, light spheres
   (fused raster continuing the depth       buffer), corner gizmo
7. sRGB encode (SRGB swapchain store)     → u8 framebuffer

Every pixel-rate quantity lives as a *planar* (NT, NPX) array (one array
per channel, NPX = tile_h·tile_w): on TPU, (H, W, C) layouts put C in the
128-lane minor dim and waste 125/128 lanes (measured 4-20× slowdowns in
round 1). Images are untiled to (H, W) only for overlay composition and
final output.

Everything per-frame-dynamic (camera, lights, toggles, instance matrices)
is traced; everything structural (image size, scene shapes, visualization
mode) is static and recompiles on change, exactly like rebuilding Vulkan
pipelines on resize (onWindowResize, main.cpp:1042-1070).
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
from bibim_tpu.ops import fused
from bibim_tpu.ops import texture_quad as tq
from bibim_tpu.ops.geometry import (
    assemble_scene,
    assemble_scene_planar,
    planar_compat_clip,
)
from bibim_tpu.ops.lines import rasterize_lines
from bibim_tpu.ops.raster import triangle_setup, triangle_setup_planar
from bibim_tpu.ops.shading_planar import (
    apply_normal_map,
    normalize3,
    shade_flat_planar,
    shade_pbr_planar,
)
from bibim_tpu.ops.tonemap import srgb_encode, to_u8, tone_map
from bibim_tpu.scene.lights import Lights
from bibim_tpu.scene.scene import SceneData


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
    """One material's six level-0 maps (PerMaterial descriptor set,
    standard_sets.glsl SET_MATERIAL). (H,W,4) uint8 each; legacy image-space
    sampling path — prefer MaterialQuads (material_quads_from_set) on TPU."""

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
    shading: str = "pbr"  # "pbr" (brdf.frag) or "flat" (gizmo.frag Lambert)
    gbuffer_viz: GBufferViz = GBufferViz.RENDERED_SCENE
    quantize_fp16: bool = True  # emulate RGBA16F G-buffer/HDR attachments
    show_lights: bool = True
    show_gizmo: bool = True
    show_tbn: bool = False
    show_hud: bool = False  # in-frame stats text (pass hud= to
    # render_frame; the ImGui-overlay analog, main.cpp:172)
    srgb_output: bool = True
    raster: str = "auto"  # "auto" | "pallas" (TPU kernel) | "xla"
    # Triangle-pipeline layout: "auto" uses the corner-planar path for
    # de-indexed scenes (dense (T,) planes; the (T,3) legacy layout runs at
    # 3/128 lane utilization); "legacy" forces the (T,3) path (tests).
    geometry: str = "auto"  # "auto" | "planar" | "legacy"
    tile_h: int = 8  # Pallas screen-tile rows (multiple of 8)
    tile_w: int = 128  # must be 128 (VPU lane width)
    max_candidates: int = 320  # per-tile candidate capacity (main pass)
    raster_passes: int = 1  # multi-pass windows for tiles denser than that
    shadow_passes: int | None = None  # shadow-pass windows (None = same)
    shadow_candidates: int | None = None  # shadow per-tile capacity
    # (None = max_candidates); light-view projections concentrate the
    # scene into few tiles, so fewer+fatter windows beat many thin ones
    overlay_candidates: int = 384  # per-tile capacity for overlay passes
    overlay_overflow_cap: int = 512  # overlay big-triangle list capacity
    # (near-plane-straddling spheres go conservative); probe-derived by
    # autotune.derive_overlay_caps — a validated capacity like the rest
    # (overflow past it reports dropped_pairs)
    overlay_max_tiles: int = 512  # compact overlay grid capacity (tiles
    # the overlay geometry may touch; raise for 4K / many lights)
    overflow_cap: int = 64  # shared big-triangle list capacity
    span_cap: int = 16  # max tiles a binned triangle may span
    # Span-class binning (fused.bin_pairs): every triangle expands only
    # SPAN_DENSE sort slots; the few spanning more tiles go through a
    # compacted list of this capacity (None = single-class expansion).
    # Cuts the pair sort ~span_cap/2-fold; autotune derives it.
    span_mid_cap: int | None = None
    xla_cap: int = 512  # per-tile capacity of the XLA fallback raster
    pair_budget: int = 262144  # static cap on live (triangle, tile) pairs
    # Coverage-compacted shading: sample materials + light only the screen
    # tiles the raster actually covered (sampling is gather-rate-bound, so
    # cost scales with coverage, not resolution). None = every tile
    # (always exact). A finite cap is a validated capacity like the rest:
    # frames whose covered-tile count exceeds it report the overflow in
    # BinDiag.dropped_tiles (bench configs pin caps with zero drops).
    live_tile_cap: int | None = None
    # Compact pass-0 raster grid: only tiles with candidates or
    # conservative big-triangle cover get a kernel step (None = full
    # grid). Another validated capacity (BinDiag.dropped_tiles).
    raster_tile_cap: int | None = None
    # Dense extra raster passes (raster_passes > 1) run on a compact
    # list of this many tiles (None = nt//4). Autotune derives it from
    # the measured count of tiles denser than one candidate window — a
    # validated capacity (BinDiag.dropped_tiles).
    dense_tile_cap: int | None = None
    # Group-window raster kernel (single-pass configs): one contiguous
    # candidate-window DMA + one 3-dot resolve per 8-tile group instead
    # of per tile. Static row budget for a group's window — a validated
    # capacity (overflow → BinDiag.dropped_cap); autotune derives it.
    group_pair_cap: int | None = None
    # Fine-subtile main raster pass (fused.raster_fused_pallas
    # fine_bins): bin at (tile_w/8)-px subtile granularity and test each
    # subtile's candidates against only its 128 pixels — ~8x less dead
    # coverage math when most binned pairs come from subtile-sized
    # triangles (dense instancing; autotune derives it from the pair
    # census). span_cap/span_mid_cap/pair_budget are then in FINE units.
    fine_bins: bool = False
    # Merged group coverage loop + chunk-class-sorted compact raster
    # slots (fused.raster_fused_pallas merged_coverage): ONE coverage
    # fori_loop per kernel step instead of one per tile. Bit-identical
    # output; wins on multi-pass fat-window configs (x64 −0.37 ms
    # raster), loses on single-pass thin-tile grids — autotune derives
    # it from the probed raster_passes (tools/exp_merged.py).
    merged_coverage: bool = False
    # Scenes built via batch_from_mesh are de-indexed (triangle list is a
    # global arange), letting corner fetches be reshapes instead of
    # gathers. Set False for hand-built DrawBatches with shared vertices.
    sequential_tris: bool = True
    # Per-batch material indices into a materials tuple (per-draw material
    # descriptor binding analog, scene.cpp:198-200); None = all material 0.
    batch_material_ids: tuple | None = None
    gizmo_extent: int = 100  # gGizmo.ViewportExtent (scene.h:14)
    tbn_length: float = 0.05  # tbn.geom LENGTH
    outputs: str = "full"  # "full" (debug dict) | "image" (final u8 only)
    # Additive stretch capabilities (BASELINE config 5; off = parity):
    enable_shadows: bool = False  # shadow-map the light below
    shadow_light: int = 0  # index of the shadow-casting light
    shadow_size: int = 1024  # shadow map resolution (multiple of 128)
    shadow_bias: float = 2e-3
    # Compact pass-0 grid for the shadow raster (the light-view analog of
    # raster_tile_cap): light projections concentrate the scene into few
    # map tiles, so the full shadow grid is mostly dead steps. None =
    # full grid. Validated capacity (BinDiag.dropped_tiles via sh_diag);
    # autotune derives it from a light-view probe.
    shadow_tile_cap: int | None = None
    # Compact the screen-side PCF quad gather to the tiles whose covered
    # pixels land inside the light frustum (shadow_factor_compact). With
    # a caster-fitted map most pixels are outside the fitted XY and
    # resolve lit with no gather. None = full-rate PCF. Validated
    # capacity (dropped tiles merge into the shadow BinDiag); autotune
    # derives it from the main-view footprint.
    shadow_query_tile_cap: int | None = None
    # Batch indices whose AABB fits the shadow map's X/Y extents (the
    # CASTERS; ops/shadow.py light_view_proj). None = fit the whole scene.
    # Excluded batches still rasterize into the map (correct occluders
    # inside the fitted region) and their pixels outside it resolve to
    # fully lit — mark a batch non-fit only if no shadow it casts outside
    # the casters' footprint matters (e.g. the 100× ground plane, which
    # otherwise dilutes the map to ~14 texels across the shader ball).
    shadow_fit_batches: tuple | None = None
    enable_ibl: bool = False  # split-sum IBL ambient (pass ibl= to
    # render_frame; replaces the constant 0.03·albedo·ao term)
    # Opt-in N-tap in-level-0 anisotropic sampling: average N bilinear
    # taps along the pixel's major UV-gradient axis (approximates the
    # reference sampler's maxAnisotropy=16, render.cpp:1355-1358 — see
    # README "known deviations"). 1 = plain bilinear (bit-exact parity).
    # Costs N× the sampling gathers and bypasses the fused sampled-shade
    # kernel, so it is a quality knob, not a production default.
    aniso_taps: int = 1
    # Pair-rate block-table sampling: ONE texture-row gather per
    # vertically-adjacent pixel pair on the big-map fast path, both
    # pixels re-blended at their own uv inside the pair rep's gathered
    # (B+1)² texel window (taps edge-clamped when outside — see
    # ops/texture_quad.block_prep). The sampling stage is
    # gather-issue-bound, so this halves its dominant term. Rep pixels
    # (the covered one of each pair, preferring the even row) stay
    # bit-exact; partners are exact at texel rates ≲ B-1 and
    # edge-clamped past that. 0/False = one gather per pixel (bit-exact
    # parity; goldens and oracle tests pin this path); 1/True = vertical
    # pairs (2 px per gather); 2 = 2×2 quads (4 px per gather, cheaper
    # and correspondingly more partner clamping).
    pair_sampling: int = 0
    # Pair-rate PCF visibility (ops/shadow.shadow_factor_compact pair):
    # one shadow-quad gather per vertical pixel pair at the covered-
    # inside rep; the partner shares the rep's visibility (≤1 px
    # vertical shift of the smooth penumbra). Halves the PCF stage's
    # gather-issue term. Off = per-pixel PCF (pinned by shadow tests).
    pair_visibility: bool = False
    # Static (clean_cap, escape_cap) pass sizes for the exact per-tile
    # routing that makes pair_sampling bit-exact (see _sampled_hdr).
    # None = both passes sized at the full tile count (always exact,
    # no compaction win); autotune derives tight caps. Validated
    # capacity: escape tiles beyond escape_cap land in
    # BinDiag.dropped_tiles and fail check_bin_diag.
    sample_route_caps: tuple | None = None
    # Debug/measurement switch: run the UNROUTED window-clamped pair
    # sampler (round-3 behavior — partner pixels edge-clamp outside the
    # shared window; error bounds pinned by tests/test_texture_pair.py).
    # Production keeps this False: pair_sampling is then bit-exact.
    pair_lossy: bool = False
    # Early-z raster coverage (fused.raster_fused_pallas earlyz):
    # per-tile candidates scan near-first (descending conservative depth
    # bucket) and the coverage loop BREAKS once every pixel's winner
    # provably beats the remaining candidates. Bit-identical winners —
    # the kernel carries an explicit draw-order tie key (which also
    # closes the big/small-split and multipass tie knife-edges). Applies
    # to the Pallas path only; the XLA fallback stays draw-ordered.
    early_z: bool = False

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_h)


def _use_pallas(settings: RenderSettings) -> bool:
    if settings.raster == "auto":
        return jax.default_backend() == "tpu"
    return settings.raster == "pallas"


def _q16(x, enable: bool):
    """RGBA16F attachment round-trip (render.h:93-94), planar-friendly."""
    if not enable:
        return x
    if isinstance(x, tuple):
        return tuple(_q16(c, enable) for c in x)
    return x.astype(jnp.float16).astype(jnp.float32)


def _prunable_fields(settings: RenderSettings) -> tuple:
    """FusedPixels planes the production frame never reads, statically
    prunable from the main raster kernel (each plane costs blend math +
    an output DMA per tile; at 4K the full set writes ~660 MB/frame):
    depth (only TBN debug + full outputs read it), vertex color (PBR
    shades from materials), bary (no production consumer), and the
    material-id plane when there is a single material binding."""
    if settings.outputs == "full" or not _use_pallas(settings):
        return ()
    if (settings.gbuffer_viz != GBufferViz.RENDERED_SCENE
            or settings.show_tbn or settings.shading != "pbr"):
        return ()
    drop = ["depth", "b0", "b1", "cr", "cg", "cb"]
    if settings.batch_material_ids is None:
        drop.append("matf")
    return tuple(drop)


# The shadow raster only consumes the depth plane (plus idf, which the
# kernel always emits): every attribute blend/output is dead weight.
_SHADOW_DROP = tuple(
    f for f in fused._OUT_FIELDS if f not in ("depth", "idf")
)


def _raster(rec_table, setup, clip, tris, width, height,
            settings: RenderSettings, cap=None, init_zkey=None,
            skip_empty=True, overflow_cap=None, passes=None,
            viewport=None, main_pass=False, span_cap=None,
            drop_fields=None, tile_cap=None):
    """``viewport`` = (full_frame_height, y_origin) for band rendering: the
    Pallas path consumes band-rebased records (shift_record_table_y), the
    XLA fallback re-derives its own setup from clip and needs the band
    explicitly. Both backends share one capacity model (span/overflow
    overrides apply to the fallback's own binning AND its diag)."""
    if passes is None:
        passes = settings.raster_passes if cap is None else 1
    span = span_cap or settings.span_cap
    ov = overflow_cap or settings.overflow_cap
    if _use_pallas(settings):
        return fused.raster_fused_pallas(
            rec_table, setup, width, height,
            tile_h=settings.tile_h, tile_w=settings.tile_w,
            max_candidates=cap or settings.max_candidates,
            overflow_cap=ov,
            span_cap=span,
            init_zkey=init_zkey, skip_empty=skip_empty,
            pair_budget=settings.pair_budget,
            passes=passes,
            raster_tile_cap=(settings.raster_tile_cap if main_pass
                             else tile_cap),
            span_mid_cap=(settings.span_mid_cap if main_pass else None),
            group_pair_cap=(settings.group_pair_cap if main_pass
                            else None),
            dense_tile_cap=(settings.dense_tile_cap if main_pass
                            else None),
            drop_fields=(drop_fields if drop_fields is not None
                         else (_prunable_fields(settings) if main_pass
                               else ())),
            fine_bins=settings.fine_bins and main_pass,
            merged_coverage=settings.merged_coverage,
            earlyz=settings.early_z,
        )
    return fused.raster_fused_xla(
        rec_table, setup, clip, tris, width, height,
        tile_h=settings.tile_h, tile_w=settings.tile_w,
        # The fallback must bin with at least the pass's requested
        # capacity (max_candidates on the main pass, shadow_candidates on
        # a light-concentrated grid, overlay_candidates on spheres) TIMES
        # the pass count — the Pallas path's capacity is cap×passes via
        # multi-pass windows, and a fallback binning with only xla_cap
        # ACTUALLY drops geometry the Pallas path keeps (seen twice:
        # autotuned shadow raster at shadow_passes=6; autotuned sharded
        # band raster at raster_passes>1 with default xla_cap). Its own
        # drops are still counted on top of the modeled diag_caps, so
        # nothing is silent either way.
        cap=max(settings.xla_cap,
                (cap or settings.max_candidates) * passes),
        init_zkey=init_zkey,
        viewport_height=viewport[0] if viewport else None,
        y_origin=viewport[1] if viewport else 0,
        span_cap=span, overflow_cap=ov,
        diag_caps=(span, ov, (cap or settings.max_candidates) * passes,
                   settings.pair_budget),
    )


def _sample_one_material(mats, px: fused.FusedPixels,
                         settings: RenderSettings) -> dict:
    """Sample one material binding at the fused pixels' uv → slot planes.

    MaterialQuads (tuple of QuadTable): planar fast path. MaterialTextures /
    MaterialMips: legacy image-space sampling (bilinear / trilinear) kept
    for the additive mip path (BASELINE config 2) and oracle parity tests.
    """
    u, v = px.uv
    if isinstance(mats, tuple) and mats \
            and isinstance(mats[0], (tq.QuadTable, tq.BlockTable)):
        return tq.sample_material(
            mats, u, v, settings.tile_h, settings.tile_w,
            use_pallas=_use_pallas(settings),
            # Group-rate sampling here only in explicit lossy mode: this
            # standalone path has no exact routing, and it doubles as the
            # oracle the routed production path must bit-match.
            pair_rows=(settings.pair_sampling if settings.pair_lossy
                       else 0),
            valid=px.tri_id >= 0,
        )
    if isinstance(mats, tuple) and mats             and isinstance(mats[0], tq.MipQuadTable):
        return tq.sample_material_mips(
            mats, u, v, settings.tile_h, settings.tile_w,
            use_pallas=_use_pallas(settings),
        )

    # Legacy paths work on an (H, W, 2) uv image.
    from bibim_tpu.ops.texture import (
        quad_uv_lod, sample_bilinear, sample_trilinear,
    )

    w, h = settings.width, settings.height
    ui = _untile(u, settings)
    vi = _untile(v, settings)
    uv = jnp.stack([ui, vi], axis=-1)

    if isinstance(mats, MaterialMips):
        def tap(atlas):
            lod = quad_uv_lod(uv, atlas.heights[0], atlas.widths[0])
            return sample_trilinear(atlas, uv, lod)
    else:
        def tap(tex):
            return sample_bilinear(tex, uv)

    alb = tap(mats.albedo)
    nrm = tap(mats.normal)
    scalars = {
        "metallic": tap(mats.metallic)[..., 0],
        "roughness": tap(mats.roughness)[..., 0],
        "ao": tap(mats.ao)[..., 0],
        "height": tap(mats.height)[..., 0],
    }
    out = {
        "alb_r": alb[..., 0], "alb_g": alb[..., 1], "alb_b": alb[..., 2],
        "nrm_x": nrm[..., 0], "nrm_y": nrm[..., 1], "nrm_z": nrm[..., 2],
        **scalars,
    }
    return {k: _tile(img, settings) for k, img in out.items()}


def _sample_materials(materials, px: fused.FusedPixels,
                      settings: RenderSettings) -> dict:
    """Material routing: single binding, or per-pixel select over a tuple of
    bindings by the winning triangle's batch material id (the per-draw
    material descriptor binding analog, scene.cpp:198-200)."""
    if settings.aniso_taps > 1:
        # N-tap in-level-0 anisotropic filtering (see RenderSettings):
        # every sampled slot averages over taps spanning the pixel's
        # major-axis uv footprint. Applied uniformly to all maps, as
        # hardware sampler state would be.
        import dataclasses

        n = settings.aniso_taps
        u, v = px.uv
        du, dv = tq.aniso_uv_steps(u, v, settings.tile_h, settings.tile_w)
        s1 = dataclasses.replace(settings, aniso_taps=1)
        acc = None
        for i in range(n):
            t = (i + 0.5) / n - 0.5
            tap = _sample_materials(
                materials, px._replace(uv=(u + t * du, v + t * dv)), s1
            )
            acc = tap if acc is None else {
                k: acc[k] + tap[k] for k in acc
            }
        return {k: acc[k] * (1.0 / n) for k in acc}
    if isinstance(materials, (tuple, list)) and materials \
            and isinstance(materials[0], (tq.MipQuadMulti,
                                          tq.MipBlockMulti)):
        # Pre-merged multi-material mip tables: routing costs no extra
        # gathers (see merge_mip_quad_materials / merge_mip_block_materials).
        u, v = px.uv
        return tq.sample_material_mips_multi(
            materials, px.mat_id, u, v, settings.tile_h, settings.tile_w,
            use_pallas=_use_pallas(settings),
        )
    multi = (
        isinstance(materials, (tuple, list))
        and materials
        and not isinstance(materials[0], (tq.QuadTable, tq.BlockTable,
                                          tq.MipQuadTable))
        and not isinstance(materials, (MaterialTextures, MaterialMips))
    )
    if not multi:
        return _sample_one_material(materials, px, settings)

    out = None
    for mi, mat in enumerate(materials):
        s = _sample_one_material(mat, px, settings)
        if out is None:
            out = s
        else:
            sel = px.mat_id == mi
            out = {k: jnp.where(sel, s[k], out[k]) for k in out}
    return out


def _untile(plane, settings: RenderSettings):
    return fused.untile(plane, settings.width, settings.height,
                        settings.tiles_x, settings.tile_h, settings.tile_w)


def _tile(img, settings: RenderSettings, fill=0.0):
    return fused.tile_plane(img, settings.tiles_x, settings.tiles_y,
                            settings.tile_h, settings.tile_w, fill)


def _scene_record_table(soup, setup, settings: RenderSettings):
    return fused.build_record_table(
        setup, soup.tris, soup.uv, soup.normal, soup.tangent, soup.world,
        soup.color, soup.mat_id, sequential=settings.sequential_tris,
    )


def _is_quad_tuple(m) -> bool:
    """True for a material binding the fused sampled-shade kernel can
    consume: a tuple of Quad/Block tables (single material) or merged
    multi-material mip groups (MipBlockMulti / MipQuadMulti — per-pixel
    material routing happens in the prep planes)."""
    return (isinstance(m, (tuple, list)) and bool(m)
            and all(isinstance(t, (tq.QuadTable, tq.BlockTable,
                                   tq.MipBlockMulti, tq.MipQuadMulti))
                    for t in m))


def _effective_pair(materials, settings: RenderSettings) -> int:
    """The pair_sampling level the fused sampled-shade path actually
    runs: mip bindings force per-pixel sampling (LOD comes from
    SCREEN-SPACE uv derivatives, which the member permutation would
    scramble — trilinear bindings already gather at block-row rate)."""
    pair = int(settings.pair_sampling)
    if pair and any(isinstance(t, (tq.MipBlockMulti, tq.MipQuadMulti))
                    for t in materials):
        pair = 0
    return pair


def _compact_ids(mask, k: int, sentinel: int):
    """Compact a (NT,) mask to k slot indices; dead slots get
    ``sentinel`` (a scratch row the caller pads on and slices off — no
    idempotency games). Returns (ids (k,), overflow count)."""
    nt = mask.shape[0]
    k = min(int(k), nt)
    neg = jnp.where(mask, -jnp.arange(nt, dtype=jnp.int32),
                    jnp.int32(-(1 << 30)))
    top, _ = jax.lax.top_k(neg, k)
    live = top > -(1 << 30)
    ids = jnp.where(live, -top, jnp.int32(sentinel))
    over = jnp.maximum(jnp.sum(mask, dtype=jnp.int32) - k, 0)
    return ids, over


def _sampled_hdr(px, materials, lights, view_block,
                 settings: RenderSettings, light_vis, gbuffer_mode: bool,
                 diags: list | None = None):
    """Sampled-shade stage with EXACT group-rate routing.

    With ``pair_sampling`` on, block-table groups share one texture-row
    gather per 2×1/2×2 pixel group — bit-exact for every pixel whose
    bilinear footprint lands inside the group's gathered (B+1)² texel
    window, edge-clamped (approximate) outside it. Escapes are the rule,
    not the exception, under minification (measured 76% of covered
    quad-groups on the 1080p headline frame, tools/exp_escape.py) — but
    they are BIMODAL per tile: ground-plane tiles escape almost wholesale
    while ball/near-field tiles are fully exact. So the frame routes per
    tile: tiles with zero escapes (ops/texture_quad.escape_tiles — same
    integer window math as the sampler) take the group-rate pass, tiles
    with any escape take a per-pixel exact pass, and the HDR planes
    scatter back by slot. The result is bit-identical to pair_sampling=0
    BY CONSTRUCTION while cutting ~3/4 of the gather-issue term on clean
    tiles (the sampling stage's dominant cost, docs/PERFORMANCE.md).

    ``sample_route_caps`` = (clean_cap, escape_cap) static pass sizes —
    validated capacities like every other compaction: clean tiles beyond
    clean_cap overflow into the exact pass (always correct), escape
    tiles beyond escape_cap are counted in BinDiag.dropped_tiles and
    fail check_bin_diag loudly. ``pair_lossy=True`` restores the
    unrouted window-clamped sampler (measurement tool, not production).
    """
    pair = _effective_pair(materials, settings)
    route = (pair > 0 and not settings.pair_lossy
             and any(isinstance(t, tq.BlockTable) for t in materials))
    if not route:
        return _sampled_hdr_pass(px, materials, lights, view_block,
                                 settings, light_vis, gbuffer_mode, pair)

    u, v = px.uv
    valid = px.tri_id >= 0
    nt, npx = valid.shape
    flags = None
    for t in materials:
        if isinstance(t, tq.BlockTable):
            f = tq.escape_tiles(t, u, v, valid, pair, settings.tile_w)
            flags = f if flags is None else (flags | f)
    q_cap, e_cap = settings.sample_route_caps or (nt, nt)
    q_cap, e_cap = min(int(q_cap), nt), min(int(e_cap), nt)
    clean = ~flags
    # Clean tiles beyond the clean pass's capacity run exact instead —
    # conservative in both directions (the exact pass is always right).
    rank = jnp.cumsum(clean.astype(jnp.int32)) - 1
    over_q = clean & (rank >= q_cap)
    clean_ids, _ = _compact_ids(clean & ~over_q, q_cap, nt)
    esc_ids, esc_over = _compact_ids(flags | over_q, e_cap, nt)
    if diags is not None:
        diags.append(fused.BinDiag(
            dropped_overflow=jnp.int32(0), dropped_cap=jnp.int32(0),
            dropped_pairs=jnp.int32(0), dropped_tiles=esc_over,
        ))

    def sub(tree, ids):
        def g(p, fill=0):
            pp = jnp.pad(p, ((0, 1),) + ((0, 0),) * (p.ndim - 1),
                         constant_values=fill)
            return pp[ids]
        out = jax.tree_util.tree_map(g, tree)
        if isinstance(tree, fused.FusedPixels):
            # Sentinel slots (ids == nt) must read as dead tiles, not
            # tri_id=0 "fully covered" garbage the shading kernel then
            # normalizes into NaNs (discarded, but wasted work) — mirror
            # the tri_id=-1 fill used by the render_frame compaction.
            out = out._replace(tri_id=g(tree.tri_id, -1))
        return out

    out = [jnp.zeros((nt + 1, npx), jnp.float32) for _ in range(3)]
    for ids, cap_pair in ((clean_ids, pair), (esc_ids, 0)):
        hdr = _sampled_hdr_pass(
            sub(px, ids), materials, lights, view_block, settings,
            sub(light_vis, ids) if light_vis else None,
            gbuffer_mode, cap_pair,
        )
        out = [o.at[ids].set(c) for o, c in zip(out, hdr)]
    return tuple(o[:nt] for o in out)


def _sampled_hdr_pass(px, materials, lights, view_block,
                      settings: RenderSettings, light_vis,
                      gbuffer_mode: bool, pair: int):
    """ONE Pallas pass from sampled materials to masked HDR planes:
    block-table blend + small-table MXU select + normal map + (deferred)
    G-buffer masking/fp16 quantization + the GGX light loop
    (ops/shading_pallas.shade_sampled_pallas). Replaces the
    [_sample_materials → apply_normal_map → _q16 → shade] chain on the
    production TPU path — every plane between the texture gather and the
    HDR output stays in VMEM. ``pair`` = the group-rate level for block
    tables (callers route tiles so that pair > 0 is bit-exact here; see
    _sampled_hdr)."""
    from bibim_tpu.ops.shading_pallas import (
        SAMPLED_SMALL_ROWS,
        shade_sampled_pallas,
    )

    u, v = px.uv
    # Measured layout choice (tools/exp_pair.py, 1080p headline):
    # pair level (2 px/gather) is fastest with the PIXEL layout + one
    # XLA repeat (6.98 ms vs 9.01 member); quad level (4 px/gather) is
    # fastest MEMBER-major with in-kernel lane-segment concat expansion
    # (5.88 ms) — the quarter-rate gather+transpose pays for the ~14
    # plane permutes the member layout needs.
    member = pair >= 2
    if member:
        ry, rx = tq.pair_factors(pair)

        def perm(p):
            return tq.member_perm(p, ry, rx, settings.tile_w)

        def unperm(p):
            return tq.member_unperm(p, ry, rx, settings.tile_w)
    else:
        def perm(p):
            return p

        def unperm(p):
            return p

    pu, pv = perm(u), perm(v)
    pmat = perm(px.mat_id) if px.mat_id is not None else None
    groups = []
    for t in materials:
        if isinstance(t, tq.MipBlockMulti):
            # Trilinear mips: one block-row gather per pixel, the 41-tap
            # level blend runs in-kernel (BASELINE config 2).
            groups.append(tq.mip_block_prep(
                t, pmat, pu, pv, settings.tile_h, settings.tile_w))
            continue
        if isinstance(t, tq.MipQuadMulti):
            rows_pad = max(8, -(-t.quads.shape[0] // 8) * 8)
            if (all(len(h) == 1 for h in t.heights)
                    and t.quads.dtype == jnp.uint8
                    and rows_pad <= SAMPLED_SMALL_ROWS):
                groups.append(tq.small_prep_multi(t, pmat, pu, pv))
            else:
                slots = tq.sample_material_mips_multi(
                    (t,), pmat, pu, pv, settings.tile_h,
                    settings.tile_w, use_pallas=_use_pallas(settings))
                groups.append({"kind": "direct", "present": t.present,
                               "planes": [slots[s] for s in t.present]})
            continue
        rows_pad = max(8, -(-t.height * t.width // 8) * 8)
        if isinstance(t, tq.BlockTable):
            groups.append(tq.block_prep(
                t, u, v, pair_rows=pair, valid=px.tri_id >= 0,
                tile_w=settings.tile_w,
                layout="member" if member else "pixel"))
        elif (isinstance(t, tq.QuadTable) and t.quads.dtype == jnp.uint8
              and rows_pad <= SAMPLED_SMALL_ROWS):
            groups.append(tq.small_prep(t, pu, pv))
        else:
            # Mid/large quad tables keep their standalone sampling path
            # (MXU kernel or row gather); slots enter as direct planes.
            if (isinstance(t, tq.QuadTable)
                    and t.height * t.width <= tq.SMALL_ROWS
                    and t.quads.dtype == jnp.uint8):
                slots = tq.sample_table_small_pallas(
                    t, pu, pv, settings.tile_h, settings.tile_w)
            else:
                slots = tq.sample_table_xla(t, pu, pv)
            groups.append({"kind": "direct", "present": t.present,
                           "planes": [slots[s] for s in t.present]})
    vis_plane = light_vis[settings.shadow_light] if light_vis else None
    if vis_plane is not None:
        vis_plane = perm(vis_plane)
    hdr3 = shade_sampled_pallas(
        groups, tuple(perm(c) for c in px.world),
        tuple(perm(c) for c in px.normal),
        tuple(perm(c) for c in px.tangent), perm(px.tri_id >= 0),
        lights, view_block.view_pos, view_block.enable_normal_map,
        vis_plane=vis_plane, vis_light=settings.shadow_light,
        gbuffer_mode=gbuffer_mode,
        quantize=gbuffer_mode and settings.quantize_fp16,
    )
    return tuple(unperm(c) for c in hdr3)


def _planar_materials(m) -> bool:
    """True when the material binding samples planar (NT, NPX) planes
    shape-agnostically (quad tables); the legacy MaterialTextures /
    MaterialMips image-space paths do not."""
    if isinstance(m, (MaterialTextures, MaterialMips)):
        return False
    if isinstance(m, (tuple, list)):
        if not m:
            return False
        if isinstance(m[0], (tq.QuadTable, tq.BlockTable, tq.MipQuadTable,
                             tq.MipQuadMulti, tq.MipBlockMulti)):
            return True
        return all(_planar_materials(x) for x in m)
    return False


def _use_planar(scene: SceneData, settings: RenderSettings) -> bool:
    """The corner-planar triangle pipeline runs for de-indexed scenes
    (batch_from_mesh builds the host corner planes); hand-built
    shared-vertex batches keep the legacy (T, 3) path."""
    if settings.geometry == "legacy":
        return False
    ok = settings.sequential_tris and all(
        b.corner_planes is not None for b in scene.batches
    )
    if settings.geometry == "planar" and not ok:
        raise ValueError("geometry='planar' needs de-indexed batches with "
                         "corner_planes (build via batch_from_mesh)")
    return ok


def _assemble_and_raster(scene, view_block, settings: RenderSettings):
    """Main-pass geometry + raster, planar when the scene supports it.

    Returns (px, zkey, diag, soup_or_none, psoup_or_none)."""
    width, height = settings.width, settings.height
    if _use_planar(scene, settings):
        psoup = assemble_scene_planar(
            scene.batches, view_block.view, view_block.proj,
            settings.batch_material_ids,
        )
        setup = triangle_setup_planar(psoup.clip, width, height)
        rec_table = fused.build_record_table_planar(setup, psoup)
        if _use_pallas(settings):
            clip = tris = None
        else:
            clip, tris = planar_compat_clip(psoup)
        px, zkey, diag = _raster(
            rec_table, setup, clip, tris, width, height, settings,
            main_pass=True,
        )
        return px, zkey, diag, None, psoup
    soup = assemble_scene(
        scene.batches, view_block.view, view_block.proj,
        settings.batch_material_ids,
    )
    setup = triangle_setup(soup.clip, soup.tris, width, height,
                           sequential=settings.sequential_tris)
    rec_table = _scene_record_table(soup, setup, settings)
    px, zkey, diag = _raster(
        rec_table, setup, soup.clip, soup.tris, width, height, settings,
        main_pass=True,
    )
    return px, zkey, diag, soup, None


def _materialize_gbuffer_planes(px, materials, view_block,
                                settings: RenderSettings):
    """gbuffer.frag materialization: material sampling + TBN normal mapping
    + (deferred) fp16 attachment quantization → planar G-buffer channels.

    Shared by the single-chip frame and the band-sharded path."""
    valid = px.tri_id >= 0
    slots = _sample_materials(materials, px, settings)
    albedo = (slots["alb_r"], slots["alb_g"], slots["alb_b"])
    nmap = (slots["nrm_x"], slots["nrm_y"], slots["nrm_z"])
    normal = apply_normal_map(
        px.normal, px.tangent, nmap, view_block.enable_normal_map
    )
    # In deferred mode the planes round-trip through fp16, emulating the
    # RGBA16F attachments; the forward path shades at full precision
    # straight from the sampled material (forward_brdf.frag), no G-buffer.
    quant = settings.quantize_fp16 and settings.deferred

    def masked(ch):
        return jnp.where(valid, ch, 0.0)

    g_pos = _q16(tuple(masked(c) for c in px.world), quant)
    g_nrm = _q16(tuple(masked(c) for c in normal), quant)
    g_alb = _q16(tuple(masked(c) for c in albedo), quant)
    g_mrah = _q16(
        (masked(slots["metallic"]), masked(slots["roughness"]),
         masked(slots["ao"]), masked(slots["height"])), quant,
    )
    return g_pos, g_nrm, g_alb, g_mrah, valid


def _forward_hdr(px, materials, lights, view_block, settings,
                 light_vis=None, ibl=None, fused_shade=False, diags=None):
    """True forward lighting path (forward_brdf.vert/.frag, subpass 2 at
    main.cpp:106-113): shade at fragment rate straight from the sampled
    material taps and the interpolated vertex attributes — full f32, no
    G-buffer materialization, no RGBA16F attachment round-trip. Distinct
    from the deferred path both in code and in cost (skips the quantize +
    materialize stage entirely). ``fused_shade`` runs the light loop in
    the single-pass Pallas kernel (production TPU path)."""
    valid = px.tri_id >= 0
    if (fused_shade and _is_quad_tuple(materials)
            and settings.aniso_taps == 1
            and not (settings.enable_ibl and ibl is not None)):
        # Sampling + normal map + lighting in ONE Pallas pass (no
        # G-buffer, no quantize — forward_brdf.frag shades raw samples).
        hdr3 = _sampled_hdr(px, materials, lights, view_block, settings,
                            light_vis, gbuffer_mode=False, diags=diags)
        return hdr3, valid
    slots = _sample_materials(materials, px, settings)
    albedo = (slots["alb_r"], slots["alb_g"], slots["alb_b"])
    nmap = (slots["nrm_x"], slots["nrm_y"], slots["nrm_z"])
    normal = apply_normal_map(
        px.normal, px.tangent, nmap, view_block.enable_normal_map
    )
    ambient = None
    if settings.enable_ibl and ibl is not None:
        from bibim_tpu.ops.ibl import ibl_ambient

        view_dir = tuple(
            view_block.view_pos[c] - px.world[c] for c in range(3)
        )
        ambient = ibl_ambient(
            ibl, normal, view_dir, albedo, slots["metallic"],
            slots["roughness"], slots["ao"], settings.tile_h,
            settings.tile_w, use_pallas=_use_pallas(settings),
        )
        ambient = tuple(jnp.where(valid, a, 0.0) for a in ambient)
    if fused_shade:
        from bibim_tpu.ops.shading_pallas import shade_tonemap_pallas

        vis_plane = None
        if light_vis:
            vis_plane = light_vis[settings.shadow_light]
        hdr3 = shade_tonemap_pallas(
            px.world, normal, albedo, slots["metallic"],
            slots["roughness"], slots["ao"], valid, lights,
            view_block.view_pos, jnp.int32(0), jnp.float32(1.0),
            vis_plane=vis_plane, vis_light=settings.shadow_light,
            ambient=ambient, quantize=False, tonemap=False,
        )
        return hdr3, valid
    hdr3 = shade_pbr_planar(
        px.world, normal, albedo, slots["metallic"], slots["roughness"],
        slots["ao"], lights, view_block.view_pos,
        light_vis=light_vis, ambient=ambient,
    )
    return tuple(jnp.where(valid, c, 0.0) for c in hdr3), valid


def _pbr_hdr(g_pos, g_nrm, g_alb, g_mrah, valid, lights, view_block,
             light_vis=None, ambient=None):
    """Deferred lighting (brdf.frag) on G-buffer planes → masked HDR."""
    hdr3 = shade_pbr_planar(
        g_pos, g_nrm, g_alb, g_mrah[0], g_mrah[1], g_mrah[2],
        lights, view_block.view_pos,
        light_vis=light_vis, ambient=ambient,
    )
    # Lighting runs on cleared G-buffer in the reference; masked here →
    # clear color black.
    return tuple(jnp.where(valid, c, 0.0) for c in hdr3)


def _pbr_ldr_fused(g_pos, g_nrm, g_alb, g_mrah, valid, lights, view_block,
                   frame_params, settings: RenderSettings,
                   light_vis=None, ambient=None):
    """Deferred lighting + RGBA16F quantize + tonemap in ONE Pallas pass
    (ops/shading_pallas.py): the XLA chain materializes ~20 intermediate
    planes through HBM; fusing them is worth ~1.4 ms at 1080p. Returns
    LDR planes directly (the subpass-1 + subpass-3 chain)."""
    from bibim_tpu.ops.shading_pallas import shade_tonemap_pallas

    vis_plane = None
    if light_vis:
        vis_plane = light_vis[settings.shadow_light]
    # Mosaic has no f16 converts, so the fp16 attachment round-trip and
    # the tonemap run as one small fused XLA pass after the kernel.
    hdr3 = shade_tonemap_pallas(
        g_pos, g_nrm, g_alb, g_mrah[0], g_mrah[1], g_mrah[2], valid,
        lights, view_block.view_pos, frame_params.enable_tone_mapping,
        frame_params.exposure, vis_plane=vis_plane,
        vis_light=settings.shadow_light, ambient=ambient,
        quantize=False, tonemap=False,
    )
    hdr3 = _q16(hdr3, settings.quantize_fp16)
    return tuple(
        tone_map(c, frame_params.enable_tone_mapping, frame_params.exposure)
        for c in hdr3
    )


def _light_sphere_planar_soup(lights: Lights, overlay: OverlayResources,
                              view_proj):
    """Corner-planar light-sphere geometry: modelMat = translate(light.pos)
    (light.vert:11-12), flat per-instance light color. The legacy (V,3)/
    (T,3) build was op-count-bound (~0.95 ms of ~1.3 µs/op dispatches at
    1080p, tools/exp_overlay2.py) — corner-concatenated planes run the
    same transform in ~25 dense ops."""
    from bibim_tpu.ops.geometry import PlanarSoup

    vs = overlay.sphere_positions  # (V,3) static unit mesh
    tris = overlay.sphere_tris  # (F,3) static
    num_l = lights.num_lights
    f = tris.shape[0]
    corner_idx = tris.T.reshape(-1)  # (3F,) corner-major, static gather
    pcat = tuple(vs[:, k][corner_idx] for k in range(3))
    wcat = tuple(
        pcat[k][None, :] + lights.pos[:, k, None] for k in range(3)
    )  # (L, 3F)
    ccat = tuple(
        view_proj[m, 0] * wcat[0] + view_proj[m, 1] * wcat[1]
        + view_proj[m, 2] * wcat[2] + view_proj[m, 3]
        for m in range(4)
    )

    def corners(xcat):  # (L, 3F) → 3 per-corner (L·F,) planes
        return tuple(
            jax.lax.slice_in_dim(xcat, c * f, (c + 1) * f,
                                 axis=1).reshape(-1)
            for c in range(3)
        )

    zeros = jnp.zeros((num_l * f,), jnp.float32)
    zt = (zeros, zeros, zeros)
    colc = tuple(
        jnp.broadcast_to(lights.color[:, ch, None],
                         (num_l, f)).reshape(-1)
        for ch in range(3)
    )
    return PlanarSoup(
        clip=tuple(corners(c) for c in ccat),
        world=tuple(corners(w) for w in wcat),
        normal=(zt, zt, zt),
        tangent=(zt, zt, zt),
        uv=(zt, zt),
        color=tuple((c, c, c) for c in colc),
        mat=zeros,
    )


def _composite_light_spheres(ldr3, zkey, lights: Lights,
                             overlay: OverlayResources, view_proj,
                             settings: RenderSettings, band=None):
    """Light-source spheres (light.vert/frag + main.cpp:138-148): instanced
    sphere at each light position, flat light color, depth-tested against
    the scene depth (continued via init_zkey), drawn after tone mapping.

    ``band`` = (band_h, y0) renders the band-local slice (sharded path)."""
    height = settings.height
    y0 = None
    if band is not None:
        height, y0 = band
    soup = _light_sphere_planar_soup(lights, overlay, view_proj)
    setup = triangle_setup_planar(
        soup.clip, settings.width, settings.height,
        band_y0=y0, band_height=height if band else None,
    )
    rec = fused.build_record_table_planar(setup, soup)
    if band is not None:
        rec = fused.shift_record_table_y(rec, y0)
    if _use_pallas(settings):
        # Compact-grid overlay kernel: a full-frame kernel pass for a few
        # hundred sphere triangles measured ~5 ms at 1080p (grid overhead);
        # visiting only covered tiles makes it sub-millisecond.
        return fused.composite_overlay_pallas(
            rec, setup, ldr3, zkey, settings.width, height,
            tile_h=settings.tile_h, tile_w=settings.tile_w,
            max_candidates=settings.overlay_candidates,
            overflow_cap=settings.overlay_overflow_cap,
            span_cap=32,
            max_tiles=min(settings.overlay_max_tiles,
                          settings.tiles_x * -(-height // settings.tile_h)),
            # Sphere triangles are tiny (r=0.1): almost all fit SPAN_DENSE
            # slots, so span-class binning shrinks the overlay pair sort
            # ~16×. The mid-list capacity derives from the overlay's
            # static triangle count (a sphere close enough that > a
            # quarter of its triangles span 3..32 tiles pushes most of
            # them past span_cap into the overflow list instead); it
            # stays a validated capacity — overflow fails loudly via
            # dropped_pairs.
            span_mid_cap=max(256, rec.shape[0] // 4),
        )
    clip, tris = planar_compat_clip(soup)
    px, _, diag = _raster(
        rec, setup, clip, tris, settings.width, height, settings,
        cap=settings.overlay_candidates, init_zkey=zkey, skip_empty=True,
        overflow_cap=settings.overlay_overflow_cap,
        span_cap=32,  # matches the compact overlay kernel's binning
        viewport=(settings.height, y0) if band is not None else None,
    )
    hit = px.tri_id >= 0
    return tuple(jnp.where(hit, px.color[c], ldr3[c]) for c in range(3)), diag


def _composite_hud(ldr3, hud, settings: RenderSettings):
    """Burn the HUD text cells into the LDR planes (the ImGui-in-subpass-4
    analog, main.cpp:172): static cell-quad geometry, per-frame lit mask,
    drawn depth-free (reversed-Z 1.0 vs a cleared depth plane) through the
    same compact overlay kernel as the light spheres."""
    geom, mask = hud
    cx = jnp.asarray(geom.cx)
    cy = jnp.asarray(geom.cy)
    m = jnp.asarray(mask, jnp.float32)
    n = cx.shape[0]
    # Corners tl/tr/br/bl (y-down, CW); mask 0 collapses the quad to its
    # center point → zero-area → culled by triangle setup.
    offx = jnp.asarray([-1.0, 1.0, 1.0, -1.0], jnp.float32) * geom.dx
    offy = jnp.asarray([-1.0, -1.0, 1.0, 1.0], jnp.float32) * geom.dy
    x = (cx[:, None] + offx[None, :] * m[:, None]).reshape(-1)
    y = (cy[:, None] + offy[None, :] * m[:, None]).reshape(-1)
    ones = jnp.ones_like(x)
    clip = jnp.stack([x, y, ones, ones], axis=-1)  # z = w = 1: always wins
    base = (jnp.arange(n, dtype=jnp.int32) * 4)[:, None]
    tris = jnp.concatenate(
        [base + jnp.asarray([[0, 1, 3]], jnp.int32),
         base + jnp.asarray([[1, 2, 3]], jnp.int32)], axis=0
    )
    setup = triangle_setup(clip, tris, settings.width, settings.height)
    zeros2 = jnp.zeros((x.shape[0], 2), jnp.float32)
    zeros3 = jnp.zeros((x.shape[0], 3), jnp.float32)
    white = jnp.ones((x.shape[0], 3), jnp.float32)
    rec = fused.build_record_table(setup, tris, zeros2, zeros3, zeros3,
                                   zeros3, white)
    nt = settings.tiles_x * settings.tiles_y
    npx = settings.tile_h * settings.tile_w
    clear_key = jnp.zeros((nt, npx), jnp.int32)
    # Cell quads are a few pixels: span ≤ 4 tiles; one 8×128 tile holds at
    # most ~220 lit cells of a 2×-scale line (~440 tris) — capacities
    # below are validated like every other overlay pass (BinDiag).
    if _use_pallas(settings):
        return fused.composite_overlay_pallas(
            rec, setup, ldr3, clear_key, settings.width, settings.height,
            tile_h=settings.tile_h, tile_w=settings.tile_w,
            max_candidates=512, overflow_cap=64, span_cap=4,
            max_tiles=min(64, nt),
        )
    px, _, diag = _raster(
        rec, setup, clip, tris, settings.width, settings.height, settings,
        cap=512, init_zkey=clear_key, skip_empty=True,
        overflow_cap=64, span_cap=4,
    )
    hit = px.tri_id >= 0
    return tuple(jnp.where(hit, px.color[c], ldr3[c]) for c in range(3)), \
        diag


def _gizmo_clip(view, proj, overlay: OverlayResources):
    """Gizmo vertices → clip through the gizmo viewport camera
    (gizmo.vert:12-27 — main-view rotation kept, camera 27 back along
    look, 30° fov). Shared by the render pass and the autotune demand
    probe so the two can never desynchronize."""
    rot = view[:3, :3]
    look = view[2, :3]
    view_pos = look * -27.0
    trans = -rot @ view_pos
    gz_view = view.at[:3, 3].set(trans)
    d = 1.0 / jnp.tan(0.261799)
    gz_proj = proj.at[0, 0].set(d).at[1, 1].set(-d)
    vp = m3.matmul(gz_proj, gz_view)
    p4 = jnp.concatenate(
        [overlay.gizmo_positions,
         jnp.ones_like(overlay.gizmo_positions[..., :1])], axis=-1,
    )
    clip = jnp.einsum("vk,mk->vm", p4, vp,
                      precision=jax.lax.Precision.HIGHEST)
    return clip, gz_view


def _render_gizmo(view, proj, overlay: OverlayResources,
                  settings: RenderSettings):
    """Render the orientation gizmo into its own ``gizmo_extent``² viewport
    with cleared depth (main.cpp:150-171), Lambert-lit in view space
    (gizmo.vert/frag). Returns (hit (ext,ext) bool image, rgb (ext,ext)
    image planes)."""
    ext = settings.gizmo_extent
    clip, gz_view = _gizmo_clip(view, proj, overlay)
    gz_settings = RenderSettings(
        width=ext, height=ext, raster=settings.raster,
        tile_h=settings.tile_h, tile_w=settings.tile_w,
        max_candidates=settings.overlay_candidates,
        overflow_cap=settings.overflow_cap, span_cap=settings.span_cap,
        xla_cap=min(settings.xla_cap, 512),
    )
    setup = triangle_setup(clip, overlay.gizmo_tris, ext, ext)
    zeros2 = jnp.zeros((clip.shape[0], 2), jnp.float32)
    rec = fused.build_record_table(
        setup, overlay.gizmo_tris, zeros2, overlay.gizmo_normals,
        jnp.zeros_like(overlay.gizmo_normals),
        overlay.gizmo_positions, overlay.gizmo_colors,
    )
    px, _, gz_diag = _raster(rec, setup, clip, overlay.gizmo_tris, ext, ext,
                             gz_settings, cap=settings.overlay_candidates,
                             skip_empty=True)
    gz_rgb = shade_flat_planar(px.color, px.normal, gz_view[:3, :3])
    hit = px.tri_id >= 0

    def region(c):
        return fused.untile(c, ext, ext, gz_settings.tiles_x,
                            gz_settings.tile_h, gz_settings.tile_w)

    return region(hit), tuple(region(c) for c in gz_rgb), gz_diag


def _composite_gizmo(ldr3_img, view, proj, overlay: OverlayResources,
                     settings: RenderSettings):
    """Composite the gizmo into the top-right corner of (H, W) LDR planes."""
    ext = settings.gizmo_extent
    hit_img, rgb, gz_diag = _render_gizmo(view, proj, overlay, settings)
    # Clamp the viewport to the frame (tiny debug frames < 100px).
    ey = min(ext, settings.height)
    ex = min(ext, settings.width)
    x0 = settings.width - ex
    out = []
    for c in range(3):
        img = ldr3_img[c]
        patch = jnp.where(hit_img[:ey, :ex], rgb[c][:ey, :ex],
                          img[0:ey, x0:])
        out.append(img.at[0:ey, x0:].set(patch))
    return tuple(out), gz_diag


def _composite_tbn(ldr3_img, soup, depth_img, view_proj,
                   settings: RenderSettings):
    """TBN visualization (tbn.vert/geom/frag): per-face centroid→T/B/N
    segments in world space, R/G/B, depth-tested, no depth write."""
    tri_world = soup.world[soup.tris]  # (T,3,3)
    centroid = tri_world.mean(axis=1)

    def face_avg(attr):
        a = attr[soup.tris]
        vv = a.mean(axis=1)
        return vv / jnp.maximum(jnp.linalg.norm(vv, axis=-1, keepdims=True),
                                1e-20)

    ends = {
        (1.0, 0.0, 0.0): centroid
        + face_avg(soup.tangent) * settings.tbn_length,
        (0.0, 1.0, 0.0): centroid
        + face_avg(jnp.cross(soup.normal, soup.tangent)) * settings.tbn_length,
        (0.0, 0.0, 1.0): centroid + face_avg(soup.normal) * settings.tbn_length,
    }

    def project(p):
        p4 = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        return jnp.einsum("vk,mk->vm", p4, view_proj,
                          precision=jax.lax.Precision.HIGHEST)

    ldr = jnp.stack(ldr3_img, axis=-1)
    c_clip = project(centroid)
    for color, end in ends.items():
        ldr = rasterize_lines(
            c_clip, project(end),
            jnp.broadcast_to(jnp.asarray(color), centroid.shape),
            depth_img, ldr,
        )
    return tuple(ldr[..., c] for c in range(3))


def _shadow_fit_ranges(scene, settings: RenderSettings):
    """Static (start, end) slices of the concatenated triangle planes and
    vertex rows for ``settings.shadow_fit_batches`` (None, None when the
    fit covers the whole scene)."""
    if settings.shadow_fit_batches is None:
        return None, None
    tri, vert = [], []
    t0 = v0 = 0
    for bi, b in enumerate(scene.batches):
        n_i = b.model.shape[0]
        t1 = t0 + n_i * b.indices.shape[0]
        v1 = v0 + n_i * b.positions.shape[0]
        if bi in settings.shadow_fit_batches:
            tri.append((t0, t1))
            vert.append((v0, v1))
        t0, v0 = t1, v1
    return tuple(tri), tuple(vert)


def _world_bounds_planar(world, ranges=None):
    """(min, max) (3,) bounds of corner-planar world planes, optionally
    over static (start, end) triangle slices."""
    sl = ranges if ranges else ((0, None),)
    wmin = jnp.stack([
        jnp.min(jnp.stack([world[k][c][s:e].min()
                           for c in range(3) for (s, e) in sl]))
        for k in range(3)
    ])
    wmax = jnp.stack([
        jnp.max(jnp.stack([world[k][c][s:e].max()
                           for c in range(3) for (s, e) in sl]))
        for k in range(3)
    ])
    return wmin, wmax


def _shadow_map_from_soup(soup, lights, settings: RenderSettings,
                          fit_ranges=None):
    """Depth-only light pass through the same fused raster → ShadowMap
    (band-independent; ops/shadow.py). ``fit_ranges`` = static vertex-row
    slices of the caster batches (shadow_fit_batches)."""
    from bibim_tpu.ops import shadow as sh

    size = settings.shadow_size
    d = lights.dir[settings.shadow_light]
    wmin = soup.world.min(axis=0)
    wmax = soup.world.max(axis=0)
    fmin = fmax = None
    if fit_ranges:
        fit_rows = jnp.concatenate(
            [soup.world[s:e] for (s, e) in fit_ranges])
        fmin = fit_rows.min(axis=0)
        fmax = fit_rows.max(axis=0)
    lvp = sh.light_view_proj(d, wmin, wmax, fit_min=fmin, fit_max=fmax)

    p4 = jnp.concatenate([soup.world, jnp.ones_like(soup.world[..., :1])],
                         axis=-1)
    clip_l = jnp.einsum("vk,mk->vm", p4, lvp,
                        precision=jax.lax.Precision.HIGHEST)
    setup_l = triangle_setup(clip_l, soup.tris, size, size,
                             sequential=settings.sequential_tris)
    zeros2 = jnp.zeros((clip_l.shape[0], 2), jnp.float32)
    zeros3 = jnp.zeros((clip_l.shape[0], 3), jnp.float32)
    rec_l = fused.build_record_table(
        setup_l, soup.tris, zeros2, zeros3, zeros3, zeros3, zeros3,
        sequential=settings.sequential_tris,
    )
    px_l, _, sh_diag = _raster(
        rec_l, setup_l, clip_l, soup.tris, size, size, settings,
        cap=settings.shadow_candidates,
        passes=settings.shadow_passes or settings.raster_passes,
        tile_cap=settings.shadow_tile_cap,
    )
    tiles_x = -(-size // settings.tile_w)
    depth_img = fused.untile(px_l.depth, size, size, tiles_x,
                             settings.tile_h, settings.tile_w)
    return sh.build_shadow_map(depth_img, lvp, size), sh_diag


def _shadow_visibility(soup, px, lights, settings: RenderSettings,
                       fit_ranges=None):
    """Shadow map + planar PCF visibility for the shadow-casting light."""
    smap, sh_diag = _shadow_map_from_soup(soup, lights, settings,
                                          fit_ranges=fit_ranges)
    return _pcf_vis(smap, px, settings, sh_diag)


def _pcf_vis(smap, px, settings: RenderSettings, sh_diag):
    """Screen-side PCF visibility — footprint-compacted when
    shadow_query_tile_cap is set (the gather only runs for tiles whose
    covered pixels land inside the light frustum; dropped footprint tiles
    merge into the shadow pass's BinDiag)."""
    from bibim_tpu.ops import shadow as sh

    if settings.shadow_query_tile_cap is not None or \
            settings.pair_visibility:
        cap = settings.shadow_query_tile_cap
        if cap is None:
            cap = px.tri_id.shape[0]  # no compaction, pair PCF only
        vis, dropped = sh.shadow_factor_compact(
            smap, px.world, px.tri_id >= 0,
            cap, settings.shadow_bias,
            pair=settings.pair_visibility, tile_w=settings.tile_w,
        )
        sh_diag = sh_diag._replace(
            dropped_tiles=sh_diag.dropped_tiles + dropped
        )
        return vis, sh_diag
    return sh.shadow_factor(smap, px.world, settings.shadow_bias), sh_diag


def _shadow_map_planar(psoup, lights, settings: RenderSettings,
                       fit_ranges=None):
    """Corner-planar :func:`_shadow_map_from_soup` (dense (T,) light-space
    transform + planar setup/record build). ``fit_ranges`` = static
    triangle-plane slices of the caster batches (shadow_fit_batches)."""
    from bibim_tpu.ops import shadow as sh
    from bibim_tpu.ops.geometry import PlanarSoup

    size = settings.shadow_size
    d = lights.dir[settings.shadow_light]
    wmin, wmax = _world_bounds_planar(psoup.world)
    fmin = fmax = None
    if fit_ranges:
        fmin, fmax = _world_bounds_planar(psoup.world, fit_ranges)
    lvp = sh.light_view_proj(d, wmin, wmax, fit_min=fmin, fit_max=fmax)

    clip_l = tuple(
        tuple(
            lvp[m, 0] * psoup.world[0][c] + lvp[m, 1] * psoup.world[1][c]
            + lvp[m, 2] * psoup.world[2][c] + lvp[m, 3]
            for c in range(3)
        )
        for m in range(4)
    )
    setup_l = triangle_setup_planar(clip_l, size, size)
    zero = jnp.zeros_like(psoup.world[0][0])
    z3 = ((zero,) * 3,) * 3
    zero_soup = PlanarSoup(clip=clip_l, world=z3, normal=z3, tangent=z3,
                           uv=((zero,) * 3,) * 2, color=z3, mat=zero)
    rec_l = fused.build_record_table_planar(setup_l, zero_soup)
    if _use_pallas(settings):
        clip = tris = None
    else:
        clip, tris = planar_compat_clip(zero_soup)
    px_l, _, sh_diag = _raster(
        rec_l, setup_l, clip, tris, size, size, settings,
        cap=settings.shadow_candidates,
        passes=settings.shadow_passes or settings.raster_passes,
        drop_fields=_SHADOW_DROP,
        tile_cap=settings.shadow_tile_cap,
    )
    tiles_x = -(-size // settings.tile_w)
    depth_img = fused.untile(px_l.depth, size, size, tiles_x,
                             settings.tile_h, settings.tile_w)
    return sh.build_shadow_map(depth_img, lvp, size), sh_diag


def _shadow_visibility_planar(psoup, px, lights, settings: RenderSettings,
                              fit_ranges=None):
    smap, sh_diag = _shadow_map_planar(psoup, lights, settings,
                                       fit_ranges=fit_ranges)
    return _pcf_vis(smap, px, settings, sh_diag)


def _shadow_vis_any(soup, psoup, px, scene, settings: RenderSettings):
    tri_ranges, vert_ranges = _shadow_fit_ranges(scene, settings)
    if psoup is not None:
        return _shadow_visibility_planar(psoup, px, scene.lights, settings,
                                         fit_ranges=tri_ranges)
    return _shadow_visibility(soup, px, scene.lights, settings,
                              fit_ranges=vert_ranges)


@functools.partial(jax.jit, static_argnames=("settings",))
def render_frame(
    scene: SceneData,
    view_block: ViewBlock,
    frame_params: FrameParams,
    materials,
    overlay: OverlayResources | None,
    settings: RenderSettings,
    ibl=None,
    hud=None,
):
    """Render one frame.

    ``settings.outputs``: "image" returns {'image': (H,W,3) u8} only (the
    production/bench path — no debug intermediates are materialized);
    "full" adds ldr/hdr/depth/tri_id/gbuffer images for tests & debugging.
    """
    width, height = settings.width, settings.height

    px, zkey, diag, soup, psoup = _assemble_and_raster(
        scene, view_block, settings
    )
    diags = [diag]

    # Coverage-compacted shading: the gather-rate-bound sampling + GGX
    # stages only run for the tiles the raster actually covered; the LDR
    # planes scatter back before overlay composition (background tiles are
    # exactly zero through tonemap + sRGB). Disabled for debug outputs.
    nt_full = px.tri_id.shape[0]
    compact_ids = None
    can_compact = (
        settings.live_tile_cap is not None
        and settings.live_tile_cap < nt_full
        and settings.gbuffer_viz == GBufferViz.RENDERED_SCENE
        and not settings.show_tbn
        and settings.shading != "flat"
        # Legacy image-space material bindings round-trip through (H, W)
        # images and cannot shade compact planes.
        and _planar_materials(materials)
    )
    if can_compact and settings.outputs == "full":
        # Debug outputs shade at full rate, but still report whether this
        # frame would overflow the cap — so bench/validation runs (which
        # use outputs="full") verify the production cap honestly.
        live = jnp.any(px.tri_id >= 0, axis=1)
        diags.append(fused.BinDiag(
            dropped_overflow=jnp.int32(0), dropped_cap=jnp.int32(0),
            dropped_pairs=jnp.int32(0),
            dropped_tiles=jnp.maximum(
                jnp.sum(live, dtype=jnp.int32) - settings.live_tile_cap, 0
            ),
        ))
    if (settings.outputs == "full" and settings.sample_route_caps
            and settings.pair_sampling and not settings.pair_lossy
            and _is_quad_tuple(materials)
            and any(isinstance(t, tq.BlockTable) for t in materials)
            and _effective_pair(materials, settings)):
        # Debug frames shade through the XLA oracle, but still validate
        # the production routing caps (same pattern as live_tile_cap
        # above): escape tiles beyond escape_cap, plus clean-slot
        # overflow that would cascade into the exact pass.
        pair_eff = _effective_pair(materials, settings)
        u0, v0 = px.uv
        valid0 = px.tri_id >= 0
        flags0 = None
        for t in materials:
            if isinstance(t, tq.BlockTable):
                f = tq.escape_tiles(t, u0, v0, valid0, pair_eff,
                                    settings.tile_w)
                flags0 = f if flags0 is None else (flags0 | f)
        nt_prod = min(settings.live_tile_cap or nt_full, nt_full) \
            if can_compact else nt_full
        q_cap, e_cap = settings.sample_route_caps
        esc_n = jnp.sum(flags0, dtype=jnp.int32)
        over_q = jnp.maximum(nt_prod - esc_n - min(int(q_cap), nt_prod), 0)
        diags.append(fused.BinDiag(
            dropped_overflow=jnp.int32(0), dropped_cap=jnp.int32(0),
            dropped_pairs=jnp.int32(0),
            dropped_tiles=jnp.maximum(
                esc_n + over_q - min(int(e_cap), nt_prod), 0),
        ))
    if can_compact and settings.outputs != "full":
        live = jnp.any(px.tri_id >= 0, axis=1)
        # Dead slots gather a sentinel row (tri_id −1, attrs 0): truly
        # dead downstream — no recompute, and the sampling router sees
        # them as clean/uncovered (a first-live-tile duplicate would
        # inherit that tile's escape flag and bloat the exact pass).
        compact_ids, dropped = _compact_ids(
            live, settings.live_tile_cap, nt_full
        )
        diags.append(fused.BinDiag(
            dropped_overflow=jnp.int32(0), dropped_cap=jnp.int32(0),
            dropped_pairs=jnp.int32(0), dropped_tiles=dropped,
        ))

        def _sub_plane(p, fill=0):
            pp = jnp.pad(p, ((0, 1),) + ((0, 0),) * (p.ndim - 1),
                         constant_values=fill)
            return pp[compact_ids]

        tri_c = _sub_plane(px.tri_id, -1)
        px = jax.tree_util.tree_map(_sub_plane, px)._replace(tri_id=tri_c)

    valid = px.tri_id >= 0

    gb = {}
    ldr3_fused = None  # set when the fused shade+tonemap kernel ran
    if settings.shading == "flat":
        # Unlit flat-color Lambert in view space (gizmo.frag model) —
        # benchmark config 1 and color-only meshes.
        rot = view_block.view[:3, :3]
        hdr3 = shade_flat_planar(px.color, px.normal, rot)
        hdr3 = tuple(jnp.where(valid, c, 0.0) for c in hdr3)
    elif not settings.deferred:
        # Forward lighting (subpass 2, main.cpp:106-113): no G-buffer
        # exists this frame. A G-buffer visualization request shows the
        # *cleared* attachments (black), matching the reference's subpass
        # structure where buffer_visualize samples attachments nothing
        # wrote (main.cpp:114-121).
        light_vis = None
        if settings.enable_shadows and scene.lights.num_lights > 0:
            vis_plane, sh_diag = _shadow_vis_any(
                soup, psoup, px, scene, settings
            )
            light_vis = {settings.shadow_light: vis_plane}
            diags.append(sh_diag)
        if settings.gbuffer_viz != GBufferViz.RENDERED_SCENE:
            zero = jnp.zeros_like(px.depth)
            hdr3 = (zero, zero, zero)
        else:
            hdr3, valid = _forward_hdr(
                px, materials, scene.lights, view_block, settings,
                light_vis=light_vis, ibl=ibl,
                fused_shade=(_use_pallas(settings)
                             and settings.outputs != "full"),
                diags=diags,
            )
    else:
        zero = jnp.zeros_like(px.depth)

        light_vis = None
        if settings.enable_shadows and scene.lights.num_lights > 0:
            vis_plane, sh_diag = _shadow_vis_any(
                soup, psoup, px, scene, settings
            )
            light_vis = {settings.shadow_light: vis_plane}
            diags.append(sh_diag)

        if (settings.gbuffer_viz == GBufferViz.RENDERED_SCENE
                and _use_pallas(settings) and settings.outputs != "full"
                and not settings.enable_ibl and _is_quad_tuple(materials)
                and settings.aniso_taps == 1):
            # Production TPU path: sampling + normal map + fp16 G-buffer
            # + lighting fused into ONE Pallas pass; only the hdr→fp16
            # round trip + tonemap remain as a small XLA elementwise tail
            # (Mosaic has no exp-parity guarantee vs XLA; see
            # _pbr_ldr_fused).
            hdr3_s = _sampled_hdr(px, materials, scene.lights, view_block,
                                  settings, light_vis, gbuffer_mode=True,
                                  diags=diags)
            hdr3_s = _q16(hdr3_s, settings.quantize_fp16)
            ldr3_fused = tuple(
                tone_map(c, frame_params.enable_tone_mapping,
                         frame_params.exposure)
                for c in hdr3_s
            )
            hdr3 = (zero, zero, zero)  # unused (ldr3_fused replaces it)
        else:
            g_pos, g_nrm, g_alb, g_mrah, valid = \
                _materialize_gbuffer_planes(
                    px, materials, view_block, settings
                )
            ambient = None
            if settings.enable_ibl and ibl is not None:
                from bibim_tpu.ops.ibl import ibl_ambient

                view_dir = tuple(
                    view_block.view_pos[c] - g_pos[c] for c in range(3)
                )
                ambient = ibl_ambient(
                    ibl, g_nrm, view_dir, g_alb, g_mrah[0], g_mrah[1],
                    g_mrah[2], settings.tile_h, settings.tile_w,
                    use_pallas=_use_pallas(settings),
                )
                ambient = tuple(jnp.where(valid, a, 0.0) for a in ambient)

            if settings.gbuffer_viz != GBufferViz.RENDERED_SCENE:
                # buffer_visualize.frag: raw G-buffer rgb → HDR target.
                viz_planes = {
                    GBufferViz.POSITION: g_pos,
                    GBufferViz.NORMAL: g_nrm,
                    GBufferViz.ALBEDO: g_alb,
                    GBufferViz.MRHA: g_mrah[:3],
                    GBufferViz.MATERIAL_INDEX: (
                        jnp.where(valid, 1.0, 0.0), zero, zero
                    ),  # gbuffer.frag:32 placeholder
                }
                hdr3 = viz_planes[settings.gbuffer_viz]
            elif _use_pallas(settings) and settings.outputs != "full":
                # Production TPU path for bindings the sampled-shade
                # kernel can't consume (mips, IBL ambient): lighting +
                # quantize + tonemap fused in one Pallas pass ("full"
                # debug outputs keep the XLA oracle chain, which also
                # materializes the hdr intermediate).
                ldr3_fused = _pbr_ldr_fused(
                    g_pos, g_nrm, g_alb, g_mrah, valid, scene.lights,
                    view_block, frame_params, settings,
                    light_vis=light_vis, ambient=ambient,
                )
                hdr3 = (zero, zero, zero)  # ldr3_fused replaces it
            else:
                hdr3 = _pbr_hdr(g_pos, g_nrm, g_alb, g_mrah, valid,
                                scene.lights, view_block,
                                light_vis=light_vis, ambient=ambient)

            if settings.outputs == "full":
                gb = {
                    "position": jnp.stack(
                        [_untile(c, settings) for c in g_pos], -1),
                    "normal": jnp.stack(
                        [_untile(c, settings) for c in g_nrm], -1),
                    "albedo": jnp.stack(
                        [_untile(c, settings) for c in g_alb], -1),
                    "mrah": jnp.stack(
                        [_untile(c, settings) for c in g_mrah], -1),
                    "matindex": jnp.stack(
                        [_untile(jnp.where(valid, 1.0, 0.0), settings),
                         _untile(zero, settings),
                         _untile(zero, settings)], -1),
                }

    if ldr3_fused is not None:
        ldr3 = ldr3_fused
    else:
        hdr3 = _q16(hdr3, settings.quantize_fp16)
        ldr3 = tuple(
            tone_map(c, frame_params.enable_tone_mapping,
                     frame_params.exposure)
            for c in hdr3
        )

    if compact_ids is not None:
        npx_c = ldr3[0].shape[1]
        ldr3 = tuple(
            jnp.zeros((nt_full + 1, npx_c), c.dtype)
            .at[compact_ids].set(c)[:nt_full]
            for c in ldr3
        )

    view_proj = m3.matmul(view_block.proj, view_block.view)

    if settings.show_lights and overlay is not None \
            and scene.lights.num_lights > 0:
        ldr3, sp_diag = _composite_light_spheres(
            ldr3, zkey, scene.lights, overlay, view_proj, settings
        )
        diags.append(sp_diag)

    if settings.show_hud and hud is not None:
        ldr3, hud_diag = _composite_hud(ldr3, hud, settings)
        diags.append(hud_diag)

    # Image-space stages: TBN lines + corner gizmo + output encode.
    ldr3_img = tuple(_untile(c, settings) for c in ldr3)
    if settings.show_tbn and overlay is not None:
        if soup is None:  # planar main pass; TBN debug wants vertex arrays
            soup = assemble_scene(
                scene.batches, view_block.view, view_block.proj,
                settings.batch_material_ids,
            )
        ldr3_img = _composite_tbn(
            ldr3_img, soup, _untile(px.depth, settings), view_proj, settings
        )
    if settings.show_gizmo and overlay is not None:
        ldr3_img, gz_diag = _composite_gizmo(
            ldr3_img, view_block.view, view_block.proj, overlay, settings
        )
        diags.append(gz_diag)

    if settings.srgb_output:
        out3 = tuple(srgb_encode(c) for c in ldr3_img)
    else:
        out3 = tuple(jnp.clip(c, 0.0, 1.0) for c in ldr3_img)
    image = to_u8(jnp.stack(out3, axis=-1))

    if settings.outputs == "image":
        return {"image": image}
    # Aggregate capacity diagnostics over every raster pass of the frame
    # (main, shadow, light spheres, gizmo).
    total_diag = fused.BinDiag(
        dropped_overflow=sum(d.dropped_overflow for d in diags),
        dropped_cap=sum(d.dropped_cap for d in diags),
        dropped_pairs=sum(d.dropped_pairs for d in diags),
        dropped_tiles=sum(getattr(d, "dropped_tiles", 0) for d in diags),
    )
    if settings.outputs == "image+diag":
        # The production frame plus the capacity scalars: what the
        # interactive session renders so its drop watcher can re-probe
        # capacities (pipeline.autotune) without debug-rate shading.
        return {"image": image, "bin_diag": total_diag}
    return {
        "image": image,
        "ldr": jnp.stack(ldr3_img, axis=-1),
        "hdr": jnp.stack([_untile(c, settings) for c in hdr3], -1),
        "depth": _untile(px.depth, settings),
        "tri_id": _untile(px.tri_id, settings),
        "gbuffer": gb,
        "bin_diag": total_diag,
    }


# Size-groups above this many texels bind as neighborhood-block tables:
# 16× fewer gather rows + the full-lane Pallas blend. Measured on the
# production compacted 1080p stream (tools/exp_block3.py): quad path
# 16.4 ms → block+Pallas 3.6 ms, bit-identical output. Below this the
# quad gather is already in the fast row-count regime and the 25-tap
# blend isn't worth it.
BLOCK_TABLE_THRESHOLD = 1 << 20


def material_quads_from_set(material_set, index: int,
                            block_threshold: int | None
                            = BLOCK_TABLE_THRESHOLD) -> tuple:
    """Bind one material as grouped quad tables (the TPU fast path) with
    per-map default fallback (createFrame material descriptor wiring,
    render.cpp:1598-1636).

    ``block_threshold``: groups larger than this many texels build
    neighborhood-block tables (16× fewer gather rows + the full-lane
    Pallas blend — see ops/texture_quad.py) instead of quad tables.
    Pass ``None`` to force quad tables everywhere."""
    return tq.build_quad_tables(tq.pack_material_maps(material_set, index),
                                block_threshold=block_threshold)


def material_textures_from_set(material_set, index: int) -> MaterialTextures:
    """Legacy level-0 image binding (oracle parity tests)."""
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


def material_mip_quads_from_set(material_set, index: int) -> tuple:
    """Trilinear mip binding on the fast quad-table path (additive over
    the reference's mip-less samplers; BASELINE config 2)."""
    from bibim_tpu.assets.materials import PBRMapType

    def mips(t):
        return [np.asarray(m)
                for m in material_set.get_pbr_map_or_default(index, t)]

    alb = mips(PBRMapType.ALBEDO)
    nrm = mips(PBRMapType.NORMAL)
    return tq.build_mip_quad_tables({
        "alb_r": [m[:, :, 0:1] for m in alb],
        "alb_g": [m[:, :, 1:2] for m in alb],
        "alb_b": [m[:, :, 2:3] for m in alb],
        "nrm_x": [m[:, :, 0:1] for m in nrm],
        "nrm_y": [m[:, :, 1:2] for m in nrm],
        "nrm_z": [m[:, :, 2:3] for m in nrm],
        "metallic": mips(PBRMapType.METALLIC),
        "roughness": mips(PBRMapType.ROUGHNESS),
        "ao": mips(PBRMapType.AO),
        "height": mips(PBRMapType.HEIGHT),
    })


def material_mips_from_set(material_set, index: int) -> MaterialMips:
    """Trilinear mip binding (additive over the reference; config 2)."""
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
            gizmo.colors if gizmo.colors is not None
            else np.ones_like(gizmo.positions)
        ),
        gizmo_tris=jnp.asarray(gizmo.indices),
    )
