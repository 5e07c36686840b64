"""Framebuffer-band sharding over a device mesh (sort-middle rendering).

Each device: replicated geometry → vertex transform → bins/rasterizes only
its horizontal band of the frame → samples/shades its band → composites
overlays that intersect the band. ``shard_map`` with image rows sharded
over the mesh axis; bands are independent, so there are no halo exchanges —
the only cross-chip data movement is the final row gather when the host
reads the image (SURVEY.md §5 "distributed communication backend").

Band-local rasterization reuses the *unmodified* fused kernel: the
per-triangle record table is rebased to band-local row coordinates by
folding the band origin into the edge/z/w constant terms
(ops.fused.shift_record_table_y), so the kernel, binning, and resolve are
byte-identical to the single-chip path. Non-divisible frame heights are
padded to a whole number of bands (cropped after the gather).

Overlay parity: light spheres continue the band's depth buffer exactly like
the single-chip pass; the corner gizmo is rendered once (replicated) and
each band composites its dynamic row slice. TBN line overlays are a
host-side debug feature and are not sharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bibim_tpu import math3d as m3
from bibim_tpu.ops import fused
from bibim_tpu.ops.geometry import (
    assemble_scene,
    assemble_scene_planar,
    planar_compat_clip,
)
from bibim_tpu.ops.raster import triangle_setup, triangle_setup_planar
from bibim_tpu.ops.tonemap import srgb_encode, to_u8, tone_map
from bibim_tpu.pipeline.framegraph import (
    FrameParams,
    OverlayResources,
    RenderSettings,
    ViewBlock,
    _composite_light_spheres,
    _forward_hdr,
    _materialize_gbuffer_planes,
    _raster,
    _pbr_hdr,
    _pbr_ldr_fused,
    _shadow_map_from_soup,
    _shadow_map_planar,
    _render_gizmo,
    _scene_record_table,
    _use_pallas,
    _use_planar,
    _q16,
)
from bibim_tpu.scene.scene import SceneData


def _band_cap(cap: int | None, n: int, band_nt: int) -> int | None:
    """Scale a frame-level compact-grid capacity to one of ``n`` bands.

    Coverage is rarely uniform across bands, so the per-band share gets a
    slack margin; the psum'd BinDiag still validates the result (a skewed
    camera that overflows the scaled cap fails loudly, exactly like the
    single-chip caps)."""
    if cap is None:
        return None
    return min(-(-cap // n) + 8 + band_nt // 8, band_nt)


def render_frame_sharded(
    mesh: Mesh,
    scene: SceneData,
    view_block: ViewBlock,
    frame_params: FrameParams,
    materials,
    settings: RenderSettings,
    overlay: OverlayResources | None = None,
    ibl=None,
    check: bool = True,
    return_diag: bool = False,
    band_settings: RenderSettings | None = None,
):
    """Render one frame with the framebuffer bands sharded over ``mesh``.

    Returns an (H, W, 3) uint8 image whose rows are sharded over the mesh
    axis (device_get assembles it on the host). Shadows build their
    (band-independent) light-view map once outside the shard_map; IBL
    ambient is per-pixel and shades band-locally.

    Capacity diagnostics from every band (main raster + band compaction +
    overlay composite) are psum'd over the mesh axis; with ``check`` the
    frame hard-fails on any dropped geometry (the multi-chip path has no
    debug outputs, so silent drops would otherwise be invisible —
    CLAUDE.md invariant; reference analog: the validation layer's
    hard-assert, render.cpp:191). ``return_diag`` returns (image, BinDiag)
    for callers that want to inspect instead."""
    if settings.shading != "pbr":
        raise NotImplementedError(
            "render_frame_sharded shards the deferred PBR path; flat "
            "shading scenes are single-chip-cheap — render them unsharded"
        )
    from bibim_tpu.pipeline.framegraph import GBufferViz

    if settings.gbuffer_viz != GBufferViz.RENDERED_SCENE:
        raise NotImplementedError(
            "G-buffer visualization is a debug view; use the single-chip "
            "path"
        )

    (axis_name,) = mesh.axis_names
    n = mesh.devices.size
    th = settings.tile_h
    band_h = -(-settings.height // n)
    band_h = -(-band_h // th) * th  # whole tiles per band
    h_pad = band_h * n
    width = settings.width

    # Replicated gizmo patch: rendered once at ext², padded to the full
    # (padded) frame so each band can take its dynamic row slice. Channel 3
    # carries the coverage mask.
    gz = None
    if settings.show_gizmo and overlay is not None:
        ext = settings.gizmo_extent
        hit_img, rgb, _gz_diag = _render_gizmo(view_block.view,
                                               view_block.proj, overlay,
                                               settings)
        ey = min(ext, h_pad)
        ex = min(ext, width)
        patch = jnp.stack(
            [rgb[0][:ey, :ex], rgb[1][:ey, :ex], rgb[2][:ey, :ex],
             hit_img[:ey, :ex].astype(jnp.float32)], axis=-1
        )
        gz = jnp.zeros((h_pad, width, 4), jnp.float32)
        gz = gz.at[0:ey, width - ex :].set(patch)

    import dataclasses

    band_nt = settings.tiles_x * (band_h // th)
    # Bands get the single-chip perf machinery at band scale: pass-0 grid
    # compaction + coverage-compacted shading. Preferred: probe-derived
    # per-band caps (autotune.autotune_settings_sharded → band_settings —
    # worst-band demands, uniform across bands because shard_map runs one
    # program). Fallback: frame-level caps scaled to a band's share with
    # slack. Either way the psum'd diagnostics validate the result.
    if band_settings is not None:
        band_live_cap = band_settings.live_tile_cap
    else:
        band_settings = dataclasses.replace(
            settings, raster_tile_cap=_band_cap(settings.raster_tile_cap,
                                                n, band_nt)
        )
        band_live_cap = _band_cap(settings.live_tile_cap, n, band_nt)

    # Shadow map: light-view depth is band-independent — build once from
    # the full scene and replicate into every band.
    smap = None
    if settings.enable_shadows and scene.lights.num_lights > 0:
        use_planar = _use_planar(scene, settings)
        from bibim_tpu.pipeline.framegraph import _shadow_fit_ranges

        tri_ranges, vert_ranges = _shadow_fit_ranges(scene, settings)

        @jax.jit  # one dispatch for the whole map build (CLAUDE.md rule 5)
        def build_smap(batches, view, proj, lights):
            if use_planar:
                psoup_full = assemble_scene_planar(
                    batches, view, proj, settings.batch_material_ids
                )
                return _shadow_map_planar(psoup_full, lights, settings,
                                          fit_ranges=tri_ranges)
            soup_full = assemble_scene(
                batches, view, proj, settings.batch_material_ids
            )
            return _shadow_map_from_soup(soup_full, lights, settings,
                                         fit_ranges=vert_ranges)

        smap, sh_diag = build_smap(scene.batches, view_block.view,
                                   view_block.proj, scene.lights)
        # The sharded API returns only the image, so surface caster drops
        # here instead of silently losing shadow geometry (CLAUDE.md).
        from bibim_tpu.utils.validation import check_bin_diag

        check_bin_diag(sh_diag, where="sharded shadow pass")

    extras = {}
    if gz is not None:
        extras["gz"] = gz
    if smap is not None:
        extras["smap"] = smap
    if settings.enable_ibl and ibl is not None:
        extras["ibl"] = ibl

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(axis_name, None, None), P()),
        # pallas_call (raster/texture/shading kernels) can't declare
        # varying-mesh-axes (`vma`) on its out_shape structs, which the
        # default check_vma=True rejects on TPU. Bands are independent by
        # construction (the only collective is the diag psum), so the
        # varying-axis audit adds nothing here.
        check_vma=False,
    )
    def band_fn(scene, view_block, frame_params, materials, extras):
        k = lax.axis_index(axis_name)
        y0 = (k * band_h).astype(jnp.float32)

        if _use_planar(scene, settings):
            psoup = assemble_scene_planar(
                scene.batches, view_block.view, view_block.proj,
                settings.batch_material_ids,
            )
            setup = triangle_setup_planar(
                psoup.clip, width, settings.height,
                band_y0=y0, band_height=band_h,
            )
            rec = fused.shift_record_table_y(
                fused.build_record_table_planar(setup, psoup), y0
            )
            clip = tris = None
            if not _use_pallas(settings):
                clip, tris = planar_compat_clip(psoup)
        else:
            soup = assemble_scene(scene.batches, view_block.view,
                                  view_block.proj,
                                  settings.batch_material_ids)
            setup = triangle_setup(
                soup.clip, soup.tris, width, settings.height,
                band_y0=y0, band_height=band_h,
                sequential=settings.sequential_tris,
            )
            rec = fused.shift_record_table_y(
                _scene_record_table(soup, setup, settings), y0
            )
            clip, tris = soup.clip, soup.tris
        px, zkey, diag = _raster(
            rec, setup, clip, tris, width, band_h,
            band_settings, viewport=(settings.height, y0), main_pass=True,
        )
        diags = [diag]

        # Band-local coverage compaction (the single-chip live_tile_cap
        # machinery): sampling + GGX run only on the band's covered tiles.
        from bibim_tpu.pipeline.framegraph import _planar_materials

        nt_band = px.tri_id.shape[0]
        compact_ids = None
        if (band_live_cap is not None and band_live_cap < nt_band
                and _planar_materials(materials)):
            from bibim_tpu.pipeline.framegraph import _compact_ids

            live = jnp.any(px.tri_id >= 0, axis=1)
            # Sentinel-row dead slots (tri_id −1), matching the
            # single-chip path: no dead recompute, and the sampling
            # router classifies them as clean/uncovered.
            compact_ids, dropped = _compact_ids(
                live, band_live_cap, nt_band
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
            px = jax.tree_util.tree_map(_sub_plane, px)._replace(
                tri_id=tri_c)

        band_view = _band_view(band_settings, band_h)
        light_vis = None
        if "smap" in extras:
            from bibim_tpu.ops import shadow as sh

            if settings.shadow_query_tile_cap is not None:
                # Footprint-compacted PCF per band (the full-frame cap is
                # a conservative bound on any band's footprint); dropped
                # footprint tiles join the band diags → psum'd + checked.
                vis, q_dropped = sh.shadow_factor_compact(
                    extras["smap"], px.world, px.tri_id >= 0,
                    settings.shadow_query_tile_cap, settings.shadow_bias,
                )
                diags.append(fused.BinDiag(
                    dropped_overflow=jnp.int32(0),
                    dropped_cap=jnp.int32(0),
                    dropped_pairs=jnp.int32(0), dropped_tiles=q_dropped,
                ))
            else:
                vis = sh.shadow_factor(
                    extras["smap"], px.world, settings.shadow_bias
                )
            light_vis = {settings.shadow_light: vis}
        from bibim_tpu.pipeline.framegraph import (
            _is_quad_tuple,
            _sampled_hdr,
        )

        if (settings.deferred and _use_pallas(settings)
                and "ibl" not in extras and _is_quad_tuple(materials)):
            # Same single-pass sampled-shade kernel as the single-chip
            # production path (sampling + normal map + fp16 G-buffer +
            # GGX in one Pallas pass) — bands keep the single-chip cost
            # structure per unit area.
            hdr3 = _sampled_hdr(px, materials, scene.lights, view_block,
                                band_view, light_vis, gbuffer_mode=True,
                                diags=diags)
        elif settings.deferred:
            g_pos, g_nrm, g_alb, g_mrah, valid = _materialize_gbuffer_planes(
                px, materials, view_block, band_view
            )
            ambient = None
            if "ibl" in extras:
                from bibim_tpu.ops.ibl import ibl_ambient

                view_dir = tuple(
                    view_block.view_pos[c] - g_pos[c] for c in range(3)
                )
                ambient = ibl_ambient(
                    extras["ibl"], g_nrm, view_dir, g_alb, g_mrah[0],
                    g_mrah[1], g_mrah[2], settings.tile_h, settings.tile_w,
                    use_pallas=_use_pallas(settings),
                )
                ambient = tuple(jnp.where(valid, a, 0.0) for a in ambient)
            if _use_pallas(settings):
                ldr3 = _pbr_ldr_fused(
                    g_pos, g_nrm, g_alb, g_mrah, valid, scene.lights,
                    view_block, frame_params, band_view,
                    light_vis=light_vis, ambient=ambient,
                )
                hdr3 = None
            else:
                hdr3 = _pbr_hdr(g_pos, g_nrm, g_alb, g_mrah, valid,
                                scene.lights, view_block,
                                light_vis=light_vis, ambient=ambient)
        else:
            hdr3, valid = _forward_hdr(px, materials, scene.lights,
                                       view_block, band_view,
                                       light_vis=light_vis,
                                       ibl=extras.get("ibl"),
                                       fused_shade=_use_pallas(settings),
                                       diags=diags)
        if hdr3 is not None:
            hdr3 = _q16(hdr3, settings.quantize_fp16)
            ldr3 = tuple(
                tone_map(c, frame_params.enable_tone_mapping,
                         frame_params.exposure)
                for c in hdr3
            )

        if compact_ids is not None:
            npx_c = ldr3[0].shape[1]
            ldr3 = tuple(
                jnp.zeros((nt_band + 1, npx_c), c.dtype)
                .at[compact_ids].set(c)[:nt_band]
                for c in ldr3
            )

        if settings.show_lights and overlay is not None \
                and scene.lights.num_lights > 0:
            view_proj = m3.matmul(view_block.proj, view_block.view)
            ldr3, sp_diag = _composite_light_spheres(
                ldr3, zkey, scene.lights, overlay, view_proj, band_settings,
                band=(band_h, y0),
            )
            diags.append(sp_diag)

        tiles_x = band_settings.tiles_x
        imgs = [
            fused.untile(c, width, band_h, tiles_x, th, settings.tile_w)
            for c in ldr3
        ]
        if "gz" in extras:
            gz_band = lax.dynamic_slice(
                extras["gz"], (k * band_h, 0, 0), (band_h, width, 4)
            )
            gz_hit = gz_band[..., 3:4] > 0.5
            stacked = jnp.stack(imgs, axis=-1)
            stacked = jnp.where(gz_hit, gz_band[..., :3], stacked)
            imgs = [stacked[..., c] for c in range(3)]

        if settings.srgb_output:
            imgs = [srgb_encode(c) for c in imgs]
        else:
            imgs = [jnp.clip(c, 0.0, 1.0) for c in imgs]

        total = fused.BinDiag(
            dropped_overflow=sum(d.dropped_overflow for d in diags),
            dropped_cap=sum(d.dropped_cap for d in diags),
            dropped_pairs=sum(d.dropped_pairs for d in diags),
            dropped_tiles=sum(
                jnp.asarray(getattr(d, "dropped_tiles", 0), jnp.int32)
                for d in diags
            ),
        )
        total = jax.tree_util.tree_map(
            lambda x: lax.psum(x, axis_name), total
        )
        return to_u8(jnp.stack(imgs, axis=-1)), total

    out, diag = jax.jit(band_fn)(scene, view_block, frame_params,
                                 materials, extras)
    img = out[: settings.height]
    if check:
        from bibim_tpu.utils.validation import check_bin_diag

        check_bin_diag(diag, where="sharded frame")
    if return_diag:
        return img, diag
    return img


def _band_view(settings: RenderSettings, band_h: int) -> RenderSettings:
    """Settings with the band's height (for helpers that derive tiles_y)."""
    import dataclasses

    return dataclasses.replace(settings, height=band_h)


def _diag_has_drops(diag) -> bool:
    import numpy as np

    return any(
        int(np.asarray(leaf)) > 0
        for leaf in (diag.dropped_overflow, diag.dropped_cap,
                     diag.dropped_pairs, diag.dropped_tiles)
    )


class ShardedRenderer:
    """Autotuned band-sharded rendering with the single-chip session's
    drop-watcher re-probe story (host/session.py _retune analog for the
    multi-chip path).

    First frame: probe the scene + camera per band and derive worst-band
    capacities (autotune.autotune_settings_sharded). On any later frame
    whose psum'd BinDiag reports dropped geometry — e.g. the camera swung
    coverage into one band past the probed margin — re-probe at THAT
    camera, merge the fresh derivation with caps only ever growing
    (autotune.grow_caps), and re-render the frame complete. Recovery
    instead of the bare render_frame_sharded hard-fail; a frame that
    still drops after re-probing raises (validated-capacity invariant)."""

    def __init__(self, mesh: Mesh, settings: RenderSettings, materials,
                 overlay: OverlayResources | None = None, ibl=None,
                 margin: float = 1.25):
        self.mesh = mesh
        self.base_settings = settings
        self.materials = materials
        self.overlay = overlay
        self.ibl = ibl
        self.margin = margin
        self.retunes = 0
        self._frame: RenderSettings | None = None
        self._band: RenderSettings | None = None

    def _tune(self, scene: SceneData, view_block: ViewBlock) -> None:
        from bibim_tpu.pipeline.autotune import (
            autotune_settings_sharded,
            grow_caps,
        )

        frame, band, _probe = autotune_settings_sharded(
            scene, view_block, self.base_settings,
            n_bands=self.mesh.devices.size, margin=self.margin,
            overlay=self.overlay, materials=self.materials,
        )
        if self._band is not None:
            band = grow_caps(self._band, band)
            frame = grow_caps(self._frame, frame)
        self._frame, self._band = frame, band
        self.retunes += 1

    def render(self, scene: SceneData, view_block: ViewBlock,
               frame_params: FrameParams):
        """Render one frame; returns the (H, W, 3) uint8 image."""
        if self._band is None:
            self._tune(scene, view_block)
        img, diag = render_frame_sharded(
            self.mesh, scene, view_block, frame_params, self.materials,
            self._frame, overlay=self.overlay, ibl=self.ibl,
            check=False, return_diag=True, band_settings=self._band,
        )
        if _diag_has_drops(diag):
            from bibim_tpu.utils.log import log_info

            log_info("sharded frame reported dropped geometry — "
                     "re-probing band capacities")
            self._tune(scene, view_block)
            img = render_frame_sharded(
                self.mesh, scene, view_block, frame_params, self.materials,
                self._frame, overlay=self.overlay, ibl=self.ibl,
                check=True, band_settings=self._band,
            )
        return img

