"""Adaptive capacity derivation — measure a frame, set the caps.

Every compaction in the pipeline is a *validated capacity* (CLAUDE.md):
``max_candidates × passes``, ``pair_budget``, ``live_tile_cap``,
``raster_tile_cap``, ``overflow_cap``. Round 1 pinned them per benchmark
config from offline sweeps; this module derives them from the scene +
camera instead:

1. :func:`probe_frame_caps` runs ONE jitted probe (the production binning
   pass, uncapped, plus optionally the raster for exact coverage) and
   reads the frame's true demands: worst-tile candidate count, live
   (tile, triangle) pairs, bin-live and covered tile counts, overflow
   triangles.
2. :func:`derive_settings` turns the measured demands into capacities
   with a safety margin, rounded up to coarse buckets (~3% granularity)
   so nearby cameras share a jit specialization — the RenderSettings-
   as-pipeline-key model (framegraph docstring) with machine-chosen keys.

The caps stay validated: a camera move past the margin overflows a cap,
the BinDiag check fails loudly (or the session's drop watcher re-probes),
and the next bucket recompiles — the TPU analog of Vulkan pipeline
recreation on resize (/root/reference/src/main.cpp:1042-1070).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bibim_tpu.ops import fused
from bibim_tpu.ops.geometry import assemble_scene, assemble_scene_planar
from bibim_tpu.ops.raster import triangle_setup, triangle_setup_planar


class CapProbe(NamedTuple):
    """One frame's measured capacity demands (host ints)."""

    n_tiles: int  # total screen tiles
    bin_tiles: int  # tiles with binned candidates or big-triangle cover
    covered_tiles: int  # raster-covered tiles (== bin_tiles when the
    # probe skipped the raster)
    max_candidates: int  # worst tile's candidate count
    total_pairs: int  # live (tile, triangle) pairs
    n_big: int  # triangles routed to the shared overflow list
    # Per candidate span_cap (2/4/8/16): how many triangles would route
    # to the overflow list, and the live pairs among the rest. The sort
    # input is T × span_cap slots, so the smallest span_cap whose
    # overflow list stays modest wins (tools/exp_raster.py: span 16 sorts
    # 625k dead slots for 17k live pairs on the headline frame); the k=2
    # entry sizes the span-class mid list (fused.SPAN_DENSE).
    span_big: tuple = ()  # ((span, n_big, pairs), ...)
    n_tris: int = 0
    dense_tiles: int = 0  # tiles denser than one 512-candidate window
    # (sizes dense_tile_cap for multi-pass configs)
    group_win: int = 0  # worst 8-consecutive-live-tile candidate window
    # (sizes the group-window kernel's group_pair_cap)
    small_pair_frac: float = 0.0  # fraction of live pairs from triangles
    # with bbox ≤ (tile_w/8 × tile_h) px — the fine-subtile kernel's win
    # is proportional to this (fused.raster_fused_pallas fine_bins)
    escape_tiles: int = -1  # tiles where ANY covered pixel escapes its
    # pair/quad sampling group's shared texel window (sizes the exact
    # routing's sample_route_caps; −1 = not probed — needs materials)


def _bin_stats(setup, settings, width, height):
    """Binning/coverage demand statistics from a triangle setup (the
    probe body shared by the full-frame and per-band probes)."""
    n_tris = setup.valid.shape[0]
    # Uncapped binning: huge max_candidates/overflow so nothing clamps;
    # span_cap stays at the production setting (it defines the
    # small/big-triangle split the capacities are measured against).
    # fine_bins probes at subtile granularity — pair/window/overflow
    # demands differ (a triangle pairs once per 16-px subtile), while
    # window stats reduce back to coarse tiles (the kernel's DMA unit).
    tiles_x = -(-width // settings.tile_w)
    nsub = fused.NSUB_FINE if settings.fine_bins else 1
    (_, starts, counts_b, big_ids, n_big, _, tiles_y, _) = (
        fused.bin_pairs(
            setup, tiles_x * settings.tile_w if nsub > 1 else width,
            height, settings.tile_h, settings.tile_w // nsub,
            span_cap=settings.span_cap,
            overflow_cap=max(64, min(n_tris, 1 << 14)),
            max_candidates=1 << 22, pair_budget=None,
        )
    )
    nt = tiles_y * tiles_x
    total_pairs = jnp.sum(counts_b)
    counts = (counts_b if nsub == 1
              else jnp.sum(counts_b.reshape(nt, nsub), axis=1))
    # Pass-0 grid liveness includes conservative big-triangle cover (the
    # 100× ground plane rasterizes from the overflow list, not the bins —
    # raster_tile_cap must budget for those tiles too). Build the 15
    # raster-coefficient record columns the cover test reads.
    def splane(name, k):
        v = getattr(setup, name)
        return v[k] if isinstance(v, tuple) else v[:, k]

    big_valid = big_ids >= 0
    bidx = jnp.maximum(big_ids, 0)
    coef_cols = [
        splane(name, k)[bidx]
        for name in ("edge_a", "edge_b", "edge_c", "z_coef", "w_coef")
        for k in range(3)
    ]
    ov = jnp.stack(coef_cols, axis=-1) * big_valid.astype(jnp.float32)[
        :, None
    ]
    ov = jnp.pad(ov, ((0, 0), (0, fused.REC_CH - ov.shape[1])))
    live0 = (counts > 0) | fused._big_cover_mask(
        ov, big_ids, nt, tiles_x, settings.tile_h, settings.tile_w
    )
    bin_live = jnp.sum(live0.astype(jnp.int32))
    # Span distribution for deriving span_cap (tile-span area per
    # triangle, same formula as bin_pairs).
    if hasattr(setup.bbox, "shape"):
        bx0, by0, bx1, by1 = (setup.bbox[:, i] for i in range(4))
    else:
        bx0, by0, bx1, by1 = setup.bbox
    bin_w = settings.tile_w // nsub
    area = ((bx1 // bin_w) - (bx0 // bin_w) + 1) * (
        (by1 // settings.tile_h) - (by0 // settings.tile_h) + 1
    )
    span_stats = {}
    for k in (2, 4, 8, 16):
        big_k = setup.valid & (area > k)
        span_stats[f"span{k}_big"] = jnp.sum(big_k.astype(jnp.int32))
        span_stats[f"span{k}_pairs"] = jnp.sum(
            jnp.where(setup.valid & (area <= k), area, 0)
        )
    # Subtile-sized-triangle pair share (sizes the fine_bins decision).
    sub_small = (setup.valid
                 & (bx1 - bx0 < settings.tile_w // fused.NSUB_FINE)
                 & (by1 - by0 < settings.tile_h))
    span_stats["small_pairs"] = jnp.sum(jnp.where(sub_small, area, 0))

    # Worst group window: the group-window kernel fetches each 8-tile
    # compact group's contiguous candidate range in one DMA — its static
    # budget must cover the largest sum over 8 consecutive live tiles.
    ids_all, _ = fused._compact_tile_list(live0, nt)
    c_live = jnp.where(
        jnp.arange(nt, dtype=jnp.int32) < bin_live, counts[ids_all], 0
    )
    pad = (-nt) % 8
    if pad:
        c_live = jnp.pad(c_live, (0, pad))
    group_win = jnp.max(c_live.reshape(-1, 8).sum(axis=1))

    out = {
        "n_tris": jnp.sum(setup.valid.astype(jnp.int32)) * 0
        + jnp.int32(n_tris),
        "bin_tiles": bin_live,
        "max_candidates": jnp.max(counts),
        "total_pairs": total_pairs,
        "n_big": n_big,
        "covered_tiles": bin_live,
        "group_win": group_win,
        # Multi-pass configs clamp max_candidates at 512 (derive), so
        # tiles beyond one window = counts > 512.
        "dense_tiles": jnp.sum((counts > 512).astype(jnp.int32)),
        **span_stats,
    }
    return out


@functools.partial(
    jax.jit, static_argnames=("settings", "measure_coverage", "esc_probe")
)
def _probe_jit(scene, view_block, settings, measure_coverage,
               esc_probe=None):
    from bibim_tpu.pipeline.framegraph import (
        _assemble_and_raster,
        _use_planar,
    )

    width, height = settings.width, settings.height
    if _use_planar(scene, settings):
        psoup = assemble_scene_planar(
            scene.batches, view_block.view, view_block.proj,
            settings.batch_material_ids,
        )
        setup = triangle_setup_planar(psoup.clip, width, height)
    else:
        soup = assemble_scene(
            scene.batches, view_block.view, view_block.proj,
            settings.batch_material_ids,
        )
        setup = triangle_setup(soup.clip, soup.tris, width, height,
                               sequential=settings.sequential_tris)
    out = _bin_stats(setup, settings, width, height)
    if measure_coverage:
        # Exact shaded coverage needs the raster (a one-off probe cost);
        # run the production frame's main pass with open capacities.
        open_settings = dataclasses.replace(
            settings,
            max_candidates=1024, raster_passes=8, span_cap=settings.span_cap,
            overflow_cap=512, pair_budget=1 << 21,
            live_tile_cap=None, raster_tile_cap=None,
            xla_cap=max(settings.xla_cap, 2048),
        )
        px, _, _, _, _ = _assemble_and_raster(scene, view_block,
                                              open_settings)
        out["covered_tiles"] = jnp.sum(
            jnp.any(px.tri_id >= 0, axis=1).astype(jnp.int32)
        )
        if esc_probe:
            # Escape-tile demand for the exact sampling router (see
            # framegraph._sampled_hdr): tiles where group-rate block
            # sampling would clamp any covered pixel's footprint.
            from bibim_tpu.ops import texture_quad as tq

            pair_level, shapes = esc_probe
            u, v = px.uv
            valid = px.tri_id >= 0
            flags = None
            for (h, w) in shapes:
                f = tq.escape_tiles_hw(h, w, u, v, valid, pair_level,
                                       settings.tile_w)
                flags = f if flags is None else (flags | f)
            out["escape_tiles"] = jnp.sum(flags.astype(jnp.int32))
    return out


def probe_frame_caps(scene, view_block, settings,
                     measure_coverage: bool = True,
                     esc_probe=None) -> CapProbe:
    """Measure one frame's capacity demands (one probe jit; cached per
    scene shape). ``measure_coverage=False`` skips the raster and uses
    bin-live tiles as the coverage bound (conservative, cheaper).
    ``esc_probe`` = (pair_level, ((h, w), ...block tables)) adds the
    sampling router's escape-tile demand (needs the raster)."""
    out = _probe_jit(scene, view_block, settings, measure_coverage,
                     esc_probe=esc_probe if measure_coverage else None)
    out = {k: int(v) for k, v in out.items()}
    nt = (-(-settings.width // settings.tile_w)
          * -(-settings.height // settings.tile_h))
    return CapProbe(
        n_tiles=nt,
        bin_tiles=out["bin_tiles"],
        covered_tiles=out["covered_tiles"],
        max_candidates=out["max_candidates"],
        total_pairs=out["total_pairs"],
        n_big=out["n_big"],
        span_big=tuple(
            (k, out[f"span{k}_big"], out[f"span{k}_pairs"])
            for k in (2, 4, 8, 16)
        ),
        n_tris=out["n_tris"],
        group_win=out["group_win"],
        dense_tiles=out["dense_tiles"],
        small_pair_frac=out["small_pairs"] / max(out["total_pairs"], 1),
        escape_tiles=out.get("escape_tiles", -1),
    )


@functools.partial(jax.jit, static_argnames=("settings", "band_h"))
def _probe_band_jit(scene, view_block, settings, band_h, y0):
    """Binning demands of ONE framebuffer band: the production band
    pipeline's triangle setup (band-culled, band-local rows — exactly
    what tile_shard's band_fn bins) at band height. ``y0`` is traced, so
    all bands share one compiled probe."""
    from bibim_tpu.pipeline.framegraph import _use_planar

    width = settings.width
    if _use_planar(scene, settings):
        psoup = assemble_scene_planar(
            scene.batches, view_block.view, view_block.proj,
            settings.batch_material_ids,
        )
        setup = triangle_setup_planar(psoup.clip, width, settings.height,
                                      band_y0=y0, band_height=band_h)
    else:
        soup = assemble_scene(
            scene.batches, view_block.view, view_block.proj,
            settings.batch_material_ids,
        )
        setup = triangle_setup(soup.clip, soup.tris, width,
                               settings.height, band_y0=y0,
                               band_height=band_h,
                               sequential=settings.sequential_tris)
    return _bin_stats(setup, settings, width, band_h)


def probe_band_caps(scene, view_block, settings, n_bands: int) -> CapProbe:
    """Worst-band capacity demands for the band-sharded renderer
    (VERDICT r2 weak #6: derived per-band caps instead of the
    scale-plus-slack heuristic).

    ``shard_map`` runs ONE compiled program on every device, so per-band
    capacities must be uniform — each demand is the elementwise max over
    bands (the reduction a psum'd demand vector would feed). Each band is
    probed with the production band setup, so the numbers are exactly
    what ``render_frame_sharded``'s band_fn will bin. Coverage is bounded
    by bin-live tiles (no per-band raster probe); the cap stays validated
    by the psum'd BinDiag."""
    th = settings.tile_h
    band_h = -(-settings.height // n_bands)
    band_h = -(-band_h // th) * th
    outs = []
    for b in range(n_bands):
        o = _probe_band_jit(scene, view_block, settings, band_h,
                            jnp.float32(b * band_h))
        outs.append({k: int(v) for k, v in o.items()})
    worst = {k: max(o[k] for o in outs) for k in outs[0]}
    band_nt = (-(-settings.width // settings.tile_w)) * (band_h // th)
    return CapProbe(
        n_tiles=band_nt,
        bin_tiles=worst["bin_tiles"],
        covered_tiles=worst["bin_tiles"],
        max_candidates=worst["max_candidates"],
        total_pairs=worst["total_pairs"],
        n_big=worst["n_big"],
        span_big=tuple(
            (k, worst[f"span{k}_big"], worst[f"span{k}_pairs"])
            for k in (2, 4, 8, 16)
        ),
        n_tris=worst["n_tris"],
        group_win=worst["group_win"],
        dense_tiles=worst["dense_tiles"],
        small_pair_frac=worst["small_pairs"] / max(worst["total_pairs"], 1),
    )


def autotune_settings_sharded(scene, view_block, settings, n_bands: int,
                              margin: float = 1.25, overlay=None,
                              materials=None):
    """Probe + derive for the band-sharded path.

    Frame-level autotune first (span routing, shadow caps, overlay tile
    bound — band-independent, or conservative full-frame bounds the band
    shading reuses), then per-band probes at the chosen span; the band
    raster/compaction caps are derived from the WORST band's demands.
    Returns ``(frame_settings, band_settings, band_probe)``:
    ``frame_settings`` drives the outside-shard_map passes (shadow map,
    gizmo), ``band_settings`` goes to ``render_frame_sharded``'s
    ``band_settings`` parameter."""
    # With materials the frame-level probe also measures coverage + the
    # escape-tile demand, so the sampling-router decision (pair routing
    # on/off + route caps) is derived exactly like single-chip — the
    # band pass self-clamps the frame-scale route caps to its own tile
    # count (_sampled_hdr mins against nt). Without materials the
    # cheaper bin-only probe is kept.
    derived, _probe = autotune_settings(scene, view_block, settings,
                                        margin=margin,
                                        measure_coverage=materials
                                        is not None,
                                        materials=materials,
                                        overlay=overlay)
    base_band = dataclasses.replace(settings, span_cap=derived.span_cap)
    band_probe = probe_band_caps(scene, view_block, base_band, n_bands)
    band = derive_settings(derived, band_probe, margin=margin)
    if band.span_cap != derived.span_cap:
        # The band derivation picked a smaller span: re-probe bands at
        # that span (same rule as autotune_settings — bin stats measured
        # at the old span would under-derive the big-cover liveness).
        base_band = dataclasses.replace(settings, span_cap=band.span_cap)
        band_probe = probe_band_caps(scene, view_block, base_band, n_bands)
        band = derive_settings(
            dataclasses.replace(derived, span_cap=band.span_cap),
            band_probe, margin=margin,
        )
    return derived, band, band_probe


# Capacities where None means "uncapped" (None must win a merge) vs the
# dense-pass grid size where None means "no dense pass" (a number wins).
_CAPS_NONE_UNCAPPED = ("live_tile_cap", "raster_tile_cap")
_CAPS_INT = ("max_candidates", "raster_passes", "overflow_cap",
             "pair_budget", "overlay_candidates", "overlay_max_tiles",
             "overlay_overflow_cap")


def grow_caps(old, new):
    """Merge a fresh derivation into previous settings with caps only
    ever growing (the session drop-watcher rule: a camera oscillating
    across a bucket edge must not thrash jit specializations). Routing
    choices (span_cap/span_mid_cap/merged_coverage) take the fresh
    derivation — their overflow is separately validated."""
    merged = {}
    for k in _CAPS_INT:
        merged[k] = max(getattr(old, k), getattr(new, k))
    for k in _CAPS_NONE_UNCAPPED:
        a, b = getattr(old, k), getattr(new, k)
        merged[k] = None if (a is None or b is None) else max(a, b)
    a, b = old.dense_tile_cap, new.dense_tile_cap
    if merged["raster_passes"] > 1:
        merged["dense_tile_cap"] = max(
            (v for v in (a, b) if v is not None), default=None
        )
    else:
        merged["dense_tile_cap"] = None
    return dataclasses.replace(new, **merged)


@functools.partial(jax.jit, static_argnames=("settings",))
def _probe_shadow_jit(scene, view_block, settings):
    """Light-view binning demands (the shadow raster's own concentration
    profile — the main-camera probe says nothing about it). Replicates
    the front half of framegraph._shadow_map_planar, then bins uncapped."""
    from bibim_tpu.ops import shadow as sh
    from bibim_tpu.pipeline.framegraph import (
        _shadow_fit_ranges,
        _world_bounds_planar,
    )

    size = settings.shadow_size
    psoup = assemble_scene_planar(
        scene.batches, view_block.view, view_block.proj,
        settings.batch_material_ids,
    )
    wmin, wmax = _world_bounds_planar(psoup.world)
    tri_ranges, _ = _shadow_fit_ranges(scene, settings)
    fmin = fmax = None
    if tri_ranges:
        fmin, fmax = _world_bounds_planar(psoup.world, tri_ranges)
    lvp = sh.light_view_proj(
        scene.lights.dir[settings.shadow_light], wmin, wmax,
        fit_min=fmin, fit_max=fmax,
    )
    clip_l = tuple(
        tuple(
            lvp[m, 0] * psoup.world[0][c] + lvp[m, 1] * psoup.world[1][c]
            + lvp[m, 2] * psoup.world[2][c] + lvp[m, 3]
            for c in range(3)
        )
        for m in range(4)
    )
    setup_l = triangle_setup_planar(clip_l, size, size)
    n_tris = setup_l.valid.shape[0]
    (_, _starts, counts, big_ids, n_big, _, tiles_y, tiles_x) = (
        fused.bin_pairs(
            setup_l, size, size, settings.tile_h, settings.tile_w,
            span_cap=settings.span_cap,
            overflow_cap=max(64, min(n_tris, 1 << 14)),
            max_candidates=1 << 22, pair_budget=None,
        )
    )
    nt = tiles_y * tiles_x
    big_valid = big_ids >= 0
    bidx = jnp.maximum(big_ids, 0)
    coef_cols = [
        getattr(setup_l, name)[k][bidx]
        for name in ("edge_a", "edge_b", "edge_c", "z_coef", "w_coef")
        for k in range(3)
    ]
    ov = jnp.stack(coef_cols, axis=-1) * big_valid.astype(jnp.float32)[
        :, None
    ]
    ov = jnp.pad(ov, ((0, 0), (0, fused.REC_CH - ov.shape[1])))
    live0 = (counts > 0) | fused._big_cover_mask(
        ov, big_ids, nt, tiles_x, settings.tile_h, settings.tile_w
    )
    # Screen-side PCF footprint: covered main-view pixels whose light
    # clip position lands inside the (possibly caster-fitted) map — sizes
    # shadow_query_tile_cap. Open capacities like probe_frame_caps.
    from bibim_tpu.pipeline.framegraph import _assemble_and_raster

    open_settings = dataclasses.replace(
        settings,
        max_candidates=1024, raster_passes=8,
        overflow_cap=512, pair_budget=1 << 21,
        live_tile_cap=None, raster_tile_cap=None,
        enable_shadows=False,
        xla_cap=max(settings.xla_cap, 2048),
    )
    px, _, _, _, _ = _assemble_and_raster(scene, view_block, open_settings)
    smap_stub = sh.ShadowMap(quads=jnp.zeros((1, 4)), light_vp=lvp, size=size)
    cx, cy, cz = sh._light_clip(smap_stub, px.world)
    q_live = jnp.any(
        sh._inside_frustum(cx, cy, cz) & (px.tri_id >= 0), axis=1
    )
    return {
        "max_candidates": jnp.max(counts),
        "total_pairs": jnp.sum(counts),
        "n_big": n_big,
        "live_tiles": jnp.sum(live0.astype(jnp.int32)),
        "query_tiles": jnp.sum(q_live.astype(jnp.int32)),
    }


def derive_shadow_settings(scene, view_block, settings,
                           margin: float = 1.25):
    """Probe the light view and derive the shadow raster's capacities
    (shadow_candidates/passes, shadow_tile_cap; pair_budget/overflow_cap
    raised if the light view demands more than the main camera).

    Light projections concentrate the scene into few map tiles (config 5:
    3 live of 1024, worst tile 3708 candidates), so the derived grid is
    compacted and the windows sized to the measured worst tile (measured:
    8.3 → 2.2 ms at 4K, tools/exp_shadowprobe.py). All caps stay
    validated: the shadow pass's BinDiag is psum'd/checked like the main
    pass's, so a probe gone stale fails loudly."""
    from bibim_tpu.pipeline.framegraph import _use_planar

    if not _use_planar(scene, settings):
        return settings  # legacy-layout scenes keep hand-set shadow caps
    out = {k: int(v) for k, v in
           _probe_shadow_jit(scene, view_block, settings).items()}
    nt = (-(-settings.shadow_size // settings.tile_w)
          * -(-settings.shadow_size // settings.tile_h))
    mc = _bucket(int(out["max_candidates"] * margin), floor=64)
    passes = 1
    if mc > 1024:
        passes = -(-mc // 1024)
        mc = 1024
    tcap = _bucket(int(out["live_tiles"] * margin) + 8, floor=64)
    nt_screen = (-(-settings.width // settings.tile_w)
                 * -(-settings.height // settings.tile_h))
    qcap = _bucket(int(out["query_tiles"] * margin) + 8, floor=64)
    return dataclasses.replace(
        settings,
        shadow_candidates=mc,
        shadow_passes=passes,
        shadow_tile_cap=tcap if tcap < nt else None,
        shadow_query_tile_cap=qcap if qcap < nt_screen else None,
        pair_budget=max(settings.pair_budget,
                        _bucket(int(out["total_pairs"] * margin),
                                floor=4096)),
        overflow_cap=max(settings.overflow_cap,
                         _bucket(int(out["n_big"] * margin) + 16,
                                 floor=64)),
    )


def dense_cap_candidates(settings, probe: CapProbe,
                         margin: float = 1.25) -> tuple:
    """Measured-choice candidate set for ``dense_tile_cap`` on merged
    multi-pass configs.

    The dense-pass slot-list size is a pure SCHEDULE choice above the
    measured demand (all candidates validate via dropped_tiles): the
    r5 x64 ladder measured a reproducible 9.50 → 8.78 ms full-frame dip
    at 2× the probed demand (128 → 192 slots at 91 dense tiles) that
    does NOT appear at other cameras (40-tile view: 1× ≈ 2×) and
    INVERTS in the isolated raster stage — whole-program XLA
    layout/fusion luck, not a derivable law (tools/exp_x64r5.py,
    tools/exp_dense_ladder.py; docs/PERFORMANCE.md round-5). Analysis
    cannot pick this; measurement can. Returns the derived settings
    plus the 2× variant for :func:`pick_measured`."""
    if not settings.merged_coverage or settings.dense_tile_cap is None:
        return (settings,)
    alt = min(_bucket(int(2 * probe.dense_tiles * margin), floor=64),
              probe.n_tiles)
    if alt == settings.dense_tile_cap:
        return (settings,)
    return (settings, dataclasses.replace(settings, dense_tile_cap=alt))


def pick_measured(candidates, measure):
    """Pick the fastest of several VALIDATED settings candidates by
    measuring each (``measure(settings) -> ms``).

    The analytic derivation covers capacities (what must not drop);
    discrete schedule choices whose cost is decided by the compiled
    artifact's layout/fusion (e.g. dense-pass slot count) are chosen by
    measurement instead — the capacity discipline is unaffected because
    every candidate's caps are probe-validated. Returns
    ``(best_settings, [(ms, settings), ...])``."""
    results = [(float(measure(s)), s) for s in candidates]
    best = min(results, key=lambda r: r[0])
    return best[1], results


def _bucket(x: int, floor: int = 64) -> int:
    """Round up to a coarse grid (granularity ≈ 3% of magnitude) so
    nearby demands share a jit specialization."""
    x = max(int(x), 1)
    g = max(floor, 1 << max(0, x.bit_length() - 5))
    return -(-x // g) * g


@functools.partial(
    jax.jit, static_argnames=("width", "height", "tile_h", "tile_w")
)
def _probe_overlay_jit(lights, overlay, view_proj, width, height,
                       tile_h, tile_w):
    """Binning demands of the light-sphere overlay pass — the SAME
    binning _composite_light_spheres runs (span_cap=32), so the derived
    caps cover exactly what the pass bins. Two measured failure modes
    of the fixed defaults: small-projected spheres concentrate a whole
    16×16 sphere (512 tris, ×N lights) into one 8×128 px tile, far past
    the 384-row window (seen: sharded dryrun drop of ~2.4k overlay
    candidates at 960×512); and near-plane-straddling spheres (the
    headline camera sits ON the spheres' plane) depth-cull to ZERO live
    content while the bbox heuristic goes conservative-full-screen — a
    384-step compact grid of pure padding. (Static-keyed on the few
    scalars it reads, not the whole settings object — a drop-watcher
    retune that grows unrelated caps must not recompile the probe.)"""
    from bibim_tpu.pipeline.framegraph import _light_sphere_planar_soup

    soup = _light_sphere_planar_soup(lights, overlay, view_proj)
    setup = triangle_setup_planar(soup.clip, width, height)
    n_tris = setup.valid.shape[0]
    tiles_x = -(-width // tile_w)
    (_, _starts, counts, big_ids, n_big, _, tiles_y, _tx) = fused.bin_pairs(
        setup, width, height, tile_h, tile_w, span_cap=32,
        overflow_cap=max(64, min(n_tris, 1 << 14)),
        max_candidates=1 << 22, pair_budget=None,
    )
    nt = tiles_y * tiles_x
    big_valid = big_ids >= 0
    bidx = jnp.maximum(big_ids, 0)
    coef_cols = [
        getattr(setup, name)[k][bidx]
        for name in ("edge_a", "edge_b", "edge_c", "z_coef", "w_coef")
        for k in range(3)
    ]
    ov = jnp.stack(coef_cols, axis=-1) * big_valid.astype(jnp.float32)[
        :, None
    ]
    ov = jnp.pad(ov, ((0, 0), (0, fused.REC_CH - ov.shape[1])))
    live = (counts > 0) | fused._big_cover_mask(
        ov, big_ids, nt, tiles_x, tile_h, tile_w
    )
    return {"max_candidates": jnp.max(counts), "n_big": n_big,
            "live_tiles": jnp.sum(live.astype(jnp.int32))}


@functools.partial(
    jax.jit, static_argnames=("ext", "tile_h", "tile_w", "span_cap")
)
def _probe_gizmo_jit(view, proj, overlay, ext, tile_h, tile_w, span_cap):
    """Worst-tile demand of the corner-gizmo raster — it binds the SAME
    ``overlay_candidates`` window as the sphere composite
    (framegraph._render_gizmo). The viewport camera + clip build is the
    shared framegraph._gizmo_clip helper, so the probe can never
    desynchronize from the pass it sizes."""
    from bibim_tpu.pipeline.framegraph import _gizmo_clip

    clip, _gz_view = _gizmo_clip(view, proj, overlay)
    setup = triangle_setup(clip, overlay.gizmo_tris, ext, ext)
    n_tris = overlay.gizmo_tris.shape[0]
    (_, _s, counts, _b, _nb, _, _ty, _tx) = fused.bin_pairs(
        setup, ext, ext, tile_h, tile_w,
        span_cap=span_cap,
        overflow_cap=max(64, n_tris),
        max_candidates=1 << 22, pair_budget=None,
    )
    return {"max_candidates": jnp.max(counts)}


def derive_overlay_caps(scene, view_block, settings, overlay,
                        margin: float = 1.25) -> dict:
    """Probe-derived ``overlay_candidates`` + ``overlay_max_tiles``
    (both floored at 64; both remain VALIDATED capacities — a camera
    swing past the margin shows up as overlay dropped_tiles/dropped_cap
    and the session drop-watcher re-probes, same recovery story as the
    main raster caps). ``overlay_candidates`` covers the worst demand
    of EVERY pass that binds it: the light-sphere composite AND the
    corner-gizmo raster."""
    from bibim_tpu import math3d as m3

    out: dict = {}
    demands = []
    if settings.show_lights and getattr(scene, "lights", None) is not None \
            and scene.lights.num_lights > 0:
        vp = m3.matmul(view_block.proj, view_block.view)
        p = _probe_overlay_jit(scene.lights, overlay, vp,
                               settings.width, settings.height,
                               settings.tile_h, settings.tile_w)
        demands.append(int(p["max_candidates"]))
        out["overlay_max_tiles"] = _bucket(
            int(int(p["live_tiles"]) * margin) + 8, floor=64)
        # Overflow (big/straddling sphere triangles) is a demand too:
        # a scene whose spheres overflow the list would otherwise drop
        # pairs every frame with nothing for the re-probe to grow.
        out["overlay_overflow_cap"] = max(
            settings.overlay_overflow_cap,
            _bucket(int(int(p["n_big"]) * margin) + 8, floor=64),
        )
    if settings.show_gizmo:
        g = _probe_gizmo_jit(view_block.view, view_block.proj, overlay,
                             settings.gizmo_extent, settings.tile_h,
                             settings.tile_w, settings.span_cap)
        demands.append(int(g["max_candidates"]))
    if demands:
        out["overlay_candidates"] = _bucket(
            int(max(demands) * margin) + 8, floor=64)
    return out


def derive_overlay_tiles(lights_pos, view, proj, settings,
                         radius: float = 0.1, margin: float = 1.5) -> int:
    """Conservative screen-tile bound for the light-sphere overlay pass
    (r=0.1 UV spheres at each light, main.cpp:950-967): project each
    light's AABB corners; a sphere straddling the near plane falls back
    to full screen. The compact overlay grid's per-step cost is real even
    for dead slots, so a worst-frame-sized hand cap (384 tiles for ~30
    covered) measured ~0.55 ms of pure padding at 1080p — this derives
    the cap from the scene+camera like every other capacity (overflow
    still fails loudly via BinDiag.dropped_tiles)."""
    import numpy as np

    nt = (-(-settings.width // settings.tile_w)
          * -(-settings.height // settings.tile_h))
    vp = np.asarray(proj, np.float64) @ np.asarray(view, np.float64)
    tiles = 0
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
         for sz in (-1, 1)], np.float64) * radius
    for p in np.asarray(lights_pos, np.float64):
        pts = p[None, :] + corners  # (8,3)
        h = np.concatenate([pts, np.ones((8, 1))], axis=1) @ vp.T  # (8,4)
        if (h[:, 3] <= 1e-6).any():
            return nt  # near-plane straddle: conservative full screen
        ndc = h[:, :2] / h[:, 3:4]
        x = (ndc[:, 0] * 0.5 + 0.5) * settings.width
        y = (ndc[:, 1] * 0.5 + 0.5) * settings.height
        x0 = int(np.clip(np.floor(x.min() / settings.tile_w), 0,
                         settings.tiles_x - 1))
        x1 = int(np.clip(np.floor(x.max() / settings.tile_w), 0,
                         settings.tiles_x - 1))
        y0 = int(np.clip(np.floor(y.min() / settings.tile_h), 0,
                         settings.tiles_y - 1))
        y1 = int(np.clip(np.floor(y.max() / settings.tile_h), 0,
                         settings.tiles_y - 1))
        if x.max() >= 0 and x.min() < settings.width \
                and y.max() >= 0 and y.min() < settings.height:
            tiles += (x1 - x0 + 1) * (y1 - y0 + 1)
    return min(_bucket(int(tiles * margin) + 8, floor=64), nt)


def derive_settings(settings, probe: CapProbe, margin: float = 1.25):
    """RenderSettings with capacities derived from a :class:`CapProbe`.

    ``margin`` is headroom for camera motion between probes; the result
    is still validated by BinDiag, so an underestimate fails loudly
    rather than dropping geometry."""
    mc = _bucket(int(probe.max_candidates * margin), floor=64)
    passes = 1
    if mc > 1024:
        # Dense tiles: depth-chained 512-candidate windows beat both one
        # huge resolve and 1024-windows now that extra passes run on a
        # compacted dense-tile grid — the per-tile resolve matmul's row
        # count is the kernel's dominant term at instanced density
        # (tools/exp_x64raster.py: maxc 2112/1pass 9.66 ms, 1024/3 8.08,
        # 512/6+dense128 7.41 on config 4; tools/exp_c4.py is the older
        # pre-compaction sweep).
        passes = -(-mc // 512)
        mc = 512
    live = _bucket(int(probe.covered_tiles * margin), floor=64)
    raster = _bucket(int(probe.bin_tiles * margin), floor=64)

    # span_cap: the sort input is T × span_cap slots, so a smaller span
    # shrinks the sort — but every pass-0 grid tile tests the ENTIRE
    # overflow list, so each extra big triangle costs ~a candidate on
    # every live tile. Only shrink the span when it adds almost nothing
    # to the overflow list (bench r2: span 4 moved ~150 silhouette
    # triangles to the list and cost more than the sort saved).
    span_cap = settings.span_cap
    n_big = probe.n_big
    pairs = probe.total_pairs
    for k, big_k, pairs_k in probe.span_big:
        if (fused.SPAN_DENSE < k < span_cap
                and big_k <= max(32, probe.n_big + 16)):
            span_cap, n_big, pairs = k, big_k, pairs_k
            break

    # Span-class binning: most triangles cover ≤ SPAN_DENSE tiles, so
    # expand everything at 2 slots and the measured few mid-span
    # triangles through a compacted list — enabled when it shrinks the
    # sort input by ≥ ~25%.
    span_mid = None
    big_dense = next(
        (b for k2, b, _ in probe.span_big if k2 == fused.SPAN_DENSE), None
    )
    if big_dense is not None and span_cap > fused.SPAN_DENSE:
        mid_n = max(big_dense - n_big, 0)
        cap = _bucket(int(mid_n * margin) + 16, floor=128)
        t = max(probe.n_tris, 1)
        if (t * fused.SPAN_DENSE + cap * span_cap
                <= 0.75 * t * span_cap):
            span_mid = cap

    # Group-window kernel: measured NEUTRAL on the headline frame (one
    # window DMA + one 3-dot resolve per group costs as many FLOPs as it
    # saves in fixed per-dot overhead — the shared window makes every
    # pixel's one-hot span the group's rows). Derivation stays opt-in:
    # pass a group_pair_cap-bearing settings object to use it.
    group_pair = settings.group_pair_cap
    if settings.fine_bins:
        group_pair = None  # mutually exclusive kernels (fine wins)
    if group_pair is not None and passes == 1 and probe.group_win > 0:
        group_pair = _bucket(int(probe.group_win * margin) + 8, floor=64)
    elif passes != 1:
        group_pair = None

    dense_cap = None
    if passes > 1:
        dense_cap = _bucket(int(probe.dense_tiles * margin) + 8, floor=64)

    # Merged group coverage loop: wins when candidate windows are fat
    # and multi-pass (x64: 7.24 → 6.87 ms raster stage), loses on the
    # single-pass thin-tile headline (3.73 → 4.26) — tools/exp_merged.py.
    # The derived raster_passes IS that signature. With early_z the
    # merged group loop has no remaining-work break (fused.py), so the
    # z-sort + dual-key carry would be pure overhead — keep the per-tile
    # loop, which early-outs, on that path.
    merged = passes > 1 and not settings.fine_bins and not settings.early_z

    live_cap = live if live < probe.n_tiles else None

    # Exact sampling-router pass sizes (framegraph._sampled_hdr): the
    # clean pass holds every non-escaping slot (dead compact slots are
    # clean), the exact pass the escaping tiles — both with margin, both
    # validated (escape overflow → BinDiag.dropped_tiles; clean overflow
    # cascades into the exact pass's margin).
    route = settings.sample_route_caps
    pair = settings.pair_sampling
    if settings.pair_sampling and probe.escape_tiles >= 0:
        nt_prod = live_cap if live_cap is not None else probe.n_tiles
        esc = min(probe.escape_tiles, nt_prod)
        # Routing pays only when a real fraction of the COVERED tiles is
        # escape-free: the clean pass's quad-rate gathers save ~3/4 of a
        # clean tile's gather issue, but the escape flags + compaction +
        # dual passes cost ~0.3 ms flat at 1080p. Measured on the r4
        # frames (BENCH r4a/r4b): headline 778/780 covered tiles escape
        # → routed 7.98 ms vs unrouted-exact 7.66; 4K ~all covered
        # escape → 32.34 vs 32.26. Mip-less minification makes escapes
        # the rule — route only on magnification-dominant frames.
        clean_live = max(int(probe.covered_tiles) - esc, 0)
        if clean_live < max(64, int(probe.covered_tiles) // 4):
            pair = 0
            route = None
        else:
            e_cap = min(_bucket(int(esc * margin) + 8, floor=32), nt_prod)
            q_cap = min(
                _bucket(int((nt_prod - esc) * margin) + 8, floor=32),
                nt_prod)
            route = (q_cap, e_cap)

    return dataclasses.replace(
        settings,
        pair_sampling=pair,
        max_candidates=mc,
        raster_passes=passes,
        merged_coverage=merged,
        dense_tile_cap=dense_cap,
        span_cap=span_cap,
        span_mid_cap=span_mid,
        overflow_cap=_bucket(int(n_big * margin) + 16, floor=64),
        pair_budget=_bucket(int(pairs * margin), floor=4096),
        live_tile_cap=live_cap,
        raster_tile_cap=raster if raster < probe.n_tiles else None,
        group_pair_cap=group_pair,
        sample_route_caps=route,
    )


def autotune_settings(scene, view_block, settings, margin: float = 1.25,
                      measure_coverage: bool = True, materials=None,
                      overlay=None):
    """Probe + derive in one call. Returns (settings, probe).

    If the derivation picks a different span_cap, the bin statistics are
    re-probed at that span (a smaller span reclassifies triangles as
    "big", and their conservative cover inflates pass-0 grid liveness —
    bin counts measured at the old span would under-derive
    raster_tile_cap). Coverage (a raster result) is span-independent and
    is not re-measured.

    ``materials``: the frame's material binding — with pair_sampling on,
    the coverage probe also measures the escape-tile demand that sizes
    sample_route_caps (only the block tables' (h, w) are read).

    ``overlay``: the light-sphere OverlayResources — when given (and
    show_lights is on), the light-sphere pass's own binning is probed
    and ``overlay_candidates`` raised to its worst-tile demand
    (small-projected spheres can pile a whole sphere into one tile)."""
    esc_probe = None
    if settings.pair_sampling and materials is not None:
        from bibim_tpu.ops import texture_quad as tq

        shapes = tuple(
            (t.height, t.width) for t in materials
            if isinstance(t, tq.BlockTable)
        ) if isinstance(materials, (tuple, list)) else ()
        if shapes:
            esc_probe = (int(settings.pair_sampling), shapes)
    probe = probe_frame_caps(scene, view_block, settings,
                             measure_coverage=measure_coverage,
                             esc_probe=esc_probe)
    derived = derive_settings(settings, probe, margin=margin)
    if derived.span_cap != settings.span_cap:
        base2 = dataclasses.replace(settings, span_cap=derived.span_cap)
        probe2 = probe_frame_caps(scene, view_block, base2,
                                  measure_coverage=False)
        probe = probe2._replace(covered_tiles=probe.covered_tiles,
                                escape_tiles=probe.escape_tiles)
        derived = derive_settings(base2, probe, margin=margin)
    # NOTE: auto-enabling fine_bins here (census small_pair_frac ≥ 0.75
    # + ≥96 candidates/live-tile) was measured a LOSS on config 4 — the
    # per-subtile lockstep loop runs at the MAX subtile depth and the
    # instanced scene's candidates cluster in 1-2 subtiles per tile
    # (tools/exp_fine.py: 8.6 ms vs 5.7 coarse). fine_bins stays a
    # user-forced setting; when forced, the probe above already measured
    # fine-granularity demands (span_cap in fine units).
    if derived.show_lights and getattr(scene, "lights", None) is not None \
            and scene.lights.num_lights > 0:
        derived = dataclasses.replace(
            derived,
            overlay_max_tiles=min(
                derived.overlay_max_tiles,
                derive_overlay_tiles(
                    scene.lights.pos[: scene.lights.num_lights],
                    view_block.view, view_block.proj, derived,
                ),
            ),
        )
    if overlay is not None:
        # Measured overlay caps (sphere composite + gizmo raster both
        # bind overlay_candidates) replace the bbox heuristic above.
        derived = dataclasses.replace(
            derived,
            **derive_overlay_caps(
                scene, view_block, derived, overlay, margin=margin,
            ),
        )
    if derived.enable_shadows and getattr(scene, "lights", None) is not None \
            and scene.lights.num_lights > 0:
        derived = derive_shadow_settings(scene, view_block, derived,
                                         margin=margin)
    return derived, probe
