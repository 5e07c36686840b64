"""Runtime validation — the Vulkan validation-layer analog (SURVEY.md §5).

The reference enables VK_LAYER_KHRONOS_validation in debug builds and
hard-asserts on any validation error (render.cpp:34-66, 191). The TPU
equivalents: NaN/Inf detection on jitted outputs (jax debug_nans), shape and
dtype contract checks on the scene pytrees, and an optional deterministic
CPU-oracle cross-check for the rasterizer.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np

from bibim_tpu.utils.log import bb_assert


@contextlib.contextmanager
def validation_layer(nan_checks: bool = True):
    """Enable debug-build style checking for the enclosed scope.

    Like the reference's debug messenger, errors raise immediately
    (BB_ASSERT analog) instead of producing corrupt frames.
    """
    old_nans = jax.config.jax_debug_nans
    try:
        if nan_checks:
            jax.config.update("jax_debug_nans", True)
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)


def check_scene_data(scene) -> None:
    """Shape/dtype contract checks for a SceneData pytree (the API-misuse
    class of validation errors)."""
    for bi, b in enumerate(scene.batches):
        v = b.positions.shape[0]
        bb_assert(b.positions.ndim == 2 and b.positions.shape[1] == 3,
                  f"batch {bi}: positions must be (V,3)")
        for name in ("uvs", "normals", "tangents", "colors"):
            arr = getattr(b, name)
            bb_assert(arr.shape[0] == v, f"batch {bi}: {name} count != positions")
        bb_assert(b.indices.ndim == 2 and b.indices.shape[1] == 3,
                  f"batch {bi}: indices must be (F,3)")
        bb_assert(int(np.max(np.asarray(b.indices), initial=0)) < v,
                  f"batch {bi}: index out of range")
        bb_assert(b.model.shape[-2:] == (4, 4) and b.model.shape == b.inv_model.shape,
                  f"batch {bi}: instance matrices must be (I,4,4)")
    l = scene.lights
    n = l.pos.shape[0]
    for name in ("type", "dir", "intensity", "color", "inner_cutoff", "outer_cutoff"):
        bb_assert(getattr(l, name).shape[0] == n, f"lights: {name} count mismatch")
    bb_assert(n <= 100, "MAX_NUM_LIGHTS is 100 (render.h:320)")


def check_frame_output(out: dict) -> None:
    """Post-frame invariants (depth in [0,1], image dtype, finite HDR)."""
    depth = np.asarray(out["depth"])
    bb_assert(np.isfinite(depth).all(), "depth has non-finite values")
    bb_assert(depth.min() >= 0.0 and depth.max() <= 1.0, "depth out of [0,1]")
    img = np.asarray(out["image"])
    bb_assert(img.dtype == np.uint8, "image must be uint8")
    hdr = np.asarray(out["hdr"])
    bb_assert(np.isfinite(hdr).all(), "HDR buffer has NaN/Inf")


def check_bin_diag(diag, where: str = "frame") -> None:
    """Binning-capacity check: geometry silently dropped by the tiler is a
    validation error, not a rendering choice. ``diag`` is the BinDiag from
    ops.fused (also surfaced as render_frame(outputs='full')['bin_diag']).

    Raise with actionable advice instead of shipping frames with holes —
    the failure mode VERDICT r1 called out for dense instanced scenes."""
    ov = int(diag.dropped_overflow)
    cap = int(diag.dropped_cap)
    bb_assert(
        ov == 0,
        f"{where}: {ov} huge triangles dropped — raise "
        "RenderSettings.overflow_cap",
    )
    bb_assert(
        cap == 0,
        f"{where}: {cap} tile candidates dropped — raise "
        "RenderSettings.max_candidates (or span_cap if triangles are "
        "being misclassified as huge)",
    )
    pairs = int(getattr(diag, "dropped_pairs", 0))
    bb_assert(
        pairs == 0,
        f"{where}: {pairs} (triangle, tile) pairs beyond the pair budget — "
        "raise RenderSettings.pair_budget",
    )
    tiles = int(getattr(diag, "dropped_tiles", 0))
    bb_assert(
        tiles == 0,
        f"{where}: {tiles} live tiles beyond a compact-grid capacity — "
        "raise whichever cap this frame exceeds: "
        "RenderSettings.live_tile_cap (shaded-coverage tiles), "
        "raster_tile_cap (pass-0 bin-live tiles), overlay_max_tiles "
        "(overlay-covered tiles), or dense_tile_cap (extra-pass tiles)",
    )
