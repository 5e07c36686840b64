"""Headline benchmark: 1080p ShaderBall PBR frame on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms/frame", "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md); the driver-set north star
is < 4 ms/frame (> 500 shaded Mpix/s) at 1080p, so vs_baseline = 4ms / ours
(>1 means beating the target). Extra keys record the other BASELINE.md
configs and the per-stage breakdown of the headline config.

Measurement model: the headline and per-config numbers are SUSTAINED
on-device ms/frame — SCAN_FRAMES data-chained frames rendered inside one
jit (each frame's full-image reduction feeds the next frame's exposure,
so nothing is dead code and frames serialize on device exactly like a
render loop). The bench host reaches the TPU through a remote tunnel
whose ~2.5 ms per-dispatch RTT does not fully pipeline (config 1's
entire frame sits at that floor); a local TPU host overlaps dispatch
with device work, so the per-dispatch loop figure is environment
overhead, reported separately under "configs_loop".
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 1920, 1080
TARGET_MS = 4.0
WARMUP = 3
ITERS = 20


def _sync(x):
    """Force real completion: tiny dependent readback (block_until_ready is
    not trusted on tunnel-attached devices)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(leaf.ravel()[:1]))


def _validate(render, name: str) -> None:
    """Render one frame with debug outputs and assert the tiler dropped
    nothing (CLAUDE.md: capacity limits must never drop geometry silently).
    The published numbers are for complete frames."""
    from bibim_tpu.utils.validation import check_bin_diag

    out = render()
    check_bin_diag(out["bin_diag"], where=name)


def _time(fn, *args, iters=ITERS, warmup=WARMUP):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    samples = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        samples.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(samples))


SCAN_FRAMES = 8


def _time_scan(frame_body, iters=4, warmup=1):
    """Sustained on-device ms/frame: render SCAN_FRAMES data-dependent
    frames inside ONE jit (lax.scan) and divide by the count.

    The bench host reaches the TPU through a remote tunnel whose ~2.5 ms
    per-dispatch RTT does not fully pipeline (config 1's whole frame is
    2.2 ms — the dispatch floor, not the renderer). A local TPU host
    overlaps dispatch with device work, so the scan measurement is the
    honest renderer number; the dispatch-loop figure is reported
    separately as *_loop. Each frame's carry folds a full-image
    reduction into the next frame's exposure, so no stage of any frame
    is dead code and frames serialize on device like a real loop."""

    @jax.jit
    def run():
        def step(carry, _):
            img = frame_body(carry)
            dep = (jnp.sum(img, dtype=jnp.int32) & 1).astype(
                jnp.float32) * 1e-30
            return dep, img[:1, :1]

        _, outs = jax.lax.scan(step, jnp.float32(0), None,
                               length=SCAN_FRAMES)
        return outs

    out = None
    for _ in range(warmup):
        out = run()
    _sync(out)
    samples = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run()
        _sync(out)
        samples.append(
            (time.perf_counter() - t0) / iters / SCAN_FRAMES * 1e3
        )
    return float(np.median(samples))


def _time_scan_stage(make_body, iters=4, warmup=1):
    """Sustained ms for ONE stage: run it SCAN_FRAMES times inside one jit
    with a full-output reduction chained into the carry (tools/exp_harness:
    constant inputs get CSE'd and sliced outputs get DCE'd — the carry must
    perturb an input and depend on EVERY output element)."""

    @jax.jit
    def run():
        def step(carry, _):
            out = make_body(carry)
            leaves = jax.tree_util.tree_leaves(out)
            dep = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return (dep * 1e-30).reshape(()), leaves[0].ravel()[:1]

        _, outs = jax.lax.scan(step, jnp.float32(0), None,
                               length=SCAN_FRAMES)
        return outs

    out = None
    for _ in range(warmup):
        out = run()
    _sync(out)
    samples = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run()
        _sync(out)
        samples.append(
            (time.perf_counter() - t0) / iters / SCAN_FRAMES * 1e3
        )
    return float(np.median(samples))


def bench_shaderball(report: dict) -> float:
    """Config 3 (headline): ShaderBall + pbr materials, GGX, 1080p."""
    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams,
        RenderSettings,
        ViewBlock,
        make_overlay_resources,
        material_quads_from_set,
        render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    from bibim_tpu.pipeline.autotune import autotune_settings

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    # Capacities are DERIVED from a probe of this scene + camera
    # (pipeline.autotune) — no hand-pinned caps; _validate still asserts
    # the derivation dropped nothing.
    # (overlay caps are probe-derived too — derive_overlay_caps — so no
    # hand values here either.)
    base = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image")
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material)
    )
    overlay = make_overlay_resources()
    view_block = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    frame_params = FrameParams(
        enable_tone_mapping=jnp.int32(1), exposure=jnp.float32(1.0)
    )
    import dataclasses

    data = scene.scene_data()
    # Production sampler: pair_sampling=2 REQUESTS quad-rate block
    # sampling with exact tile routing (bit-identical to per-pixel
    # sampling by construction, framegraph._sampled_hdr; pinned by
    # tests/test_tpu.py::test_pair_sampling_routed_exact) — and autotune
    # DECIDES from the escape-tile probe whether routing pays. On this
    # mip-less minification-heavy frame ~100% of covered tiles escape,
    # so the derivation routes everything to the one-gather-per-pixel
    # exact pass (pair_sampling→0): the headline is the px-exact path.
    base = dataclasses.replace(base, pair_sampling=2)
    settings, _probe = autotune_settings(data, view_block, base,
                                         margin=1.05, materials=mats,
                                         overlay=overlay)
    report["sampling"] = {
        "pair_sampling": settings.pair_sampling, "routed_exact": True,
        "route_caps": list(settings.sample_route_caps or ()),
        "escape_tiles": _probe.escape_tiles,
        "covered_tiles": _probe.covered_tiles,
    }

    _validate(
        lambda: render_frame(data, view_block, frame_params, mats, overlay,
                             dataclasses.replace(settings, outputs="full")),
        "config3_shaderball_1080p",
    )

    def step():
        return render_frame(data, view_block, frame_params, mats, overlay,
                            settings)["image"]

    report.setdefault("configs_loop", {})["shaderball_pbr_1080p"] = round(
        _time(step), 2)

    def frame_body(carry, s=None):
        # Hoist-proof by construction (VERDICT r2 item 2): the carry
        # perturbs the VIEW MATRIX, so every stage from vertex transform
        # down is loop-variant inside the scan — XLA's while-loop LICM
        # cannot hoist any of the frame. (carry is ±1e-30: numerically
        # inert, data-dependence real.)
        vbc = view_block._replace(view=view_block.view + carry)
        fpc = FrameParams(frame_params.enable_tone_mapping,
                          frame_params.exposure + carry)
        return render_frame(data, vbc, fpc, mats, overlay,
                            s if s is not None else settings)["image"]

    # Headline = the production sampler as autotune derived it (exact
    # either way: routing is bit-identical to per-pixel sampling).
    # "value_px_sampling" attributes the routing decision: when the
    # derivation disabled routing the two are the same measurement.
    ms = _time_scan(frame_body)
    report["value_exact"] = round(ms, 3)  # == value by construction
    if settings.pair_sampling:
        report["value_px_sampling"] = round(_time_scan(
            lambda c: frame_body(
                c, dataclasses.replace(settings, pair_sampling=0))), 3)
    else:
        report["value_px_sampling"] = report["value_exact"]

    # The supported bounded-error performance mode (README "Sampling
    # modes"): quad-rate window-clamp sampling. Off-headline (the
    # headline is exact), tracked per round so the mode's number is a
    # measurement, not an r3 quotation. Bounds pinned on hardware by
    # tests/test_tpu.py::test_pair_lossy_bounds_full_1080p.
    report.setdefault("configs_lossy", {})["shaderball_pbr_1080p_lossy"] = (
        round(_time_scan(lambda c: frame_body(
            c, dataclasses.replace(settings, pair_sampling=2,
                                   pair_lossy=True))), 2))

    from bibim_tpu.ops import fused
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar

    @jax.jit
    def geom(batches, view, proj):
        psoup = assemble_scene_planar(batches, view, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        return fused.raster_fused_pallas(
            rec, setup, WIDTH, HEIGHT,
            tile_h=settings.tile_h, tile_w=settings.tile_w,
            max_candidates=settings.max_candidates,
            raster_tile_cap=settings.raster_tile_cap,
        )

    # Stage timings are PRODUCTION-SHAPED (VERDICT r1 items 5+10): each
    # stage runs on the coverage-compacted live-tile planes with the
    # production kernels (use_pallas=True, block tables) and is timed
    # with the same in-jit scan as the headline, so no tunnel dispatch
    # pollutes the parts and they sum to ≈ the whole (the headline's
    # single schedule still overlaps stages slightly).
    live_cap = settings.live_tile_cap or (settings.tiles_x
                                          * settings.tiles_y)

    @jax.jit
    def compact_px(batches, view, proj):
        px, _, _ = geom(batches, view, proj)
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, live_cap)
        return jax.tree_util.tree_map(lambda p: p[ids], px)

    px_c = compact_px(data.batches, view_block.view, view_block.proj)

    from bibim_tpu.ops.shading_planar import shade_pbr_planar
    from bibim_tpu.ops.tonemap import tone_map

    @jax.jit
    def shade(px, lights, view_pos, exposure):
        hdr3 = shade_pbr_planar(
            px.world, px.normal, px.color, px.uv[0] * 0, px.uv[0] * 0 + .5,
            px.uv[0] * 0 + 1, lights, view_pos,
        )
        return tuple(tone_map(c, jnp.int32(1), exposure) for c in hdr3)

    use_pallas = jax.default_backend() == "tpu"
    report["stages"] = {
        "raster_resolve": round(_time_scan_stage(
            lambda c: geom(data.batches, view_block.view + c,
                           view_block.proj)), 2),
        "material_sample": round(_time_scan_stage(
            lambda c: tq.sample_material(
                mats, px_c.uv[0] + c, px_c.uv[1],
                tile_h=settings.tile_h, tile_w=settings.tile_w,
                use_pallas=use_pallas)), 2),
        "shade_tonemap": round(_time_scan_stage(
            lambda c: shade(px_c, data.lights, view_block.view_pos + c,
                            jnp.float32(1.0))), 2),
    }
    return ms


def bench_gizmo(report: dict) -> None:
    """Config 1: gizmo.obj, flat shading, 512×512."""
    from bibim_tpu import math3d as m3
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera
    from bibim_tpu.scene.gizmoscene import (
        GIZMO_CAMERA_DISTANCE, GIZMO_FOV_DEGREES, GizmoScene,
    )

    scene = GizmoScene()
    data = scene.scene_data()
    cam = FreeLookCamera(
        pos=np.array([0.0, 0.0, -GIZMO_CAMERA_DISTANCE], np.float32)
    )
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(GIZMO_FOV_DEGREES, 1.0, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(0),
                     exposure=jnp.float32(1.0))
    s = RenderSettings(width=512, height=512, shading="flat",
                       show_lights=False, show_gizmo=False, outputs="image")

    import dataclasses

    _validate(
        lambda: render_frame(data, vb, fp, None, None,
                             dataclasses.replace(s, outputs="full")),
        "config1_gizmo_512",
    )

    def step():
        return render_frame(data, vb, fp, None, None, s)["image"]

    report.setdefault("configs_loop", {})["gizmo_flat_512"] = round(
        _time(step), 2)

    def frame_body(carry):
        return render_frame(data, vb._replace(view=vb.view + carry),
                            FrameParams(fp.enable_tone_mapping,
                                        fp.exposure + carry),
                            None, None, s)["image"]

    report["configs"]["gizmo_flat_512"] = round(_time_scan(frame_body), 2)


def bench_cube(report: dict) -> None:
    """Config 2: textured cubes, bilinear + mip (trilinear) sampling."""
    from bibim_tpu import math3d as m3
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock, render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera
    from bibim_tpu.scene.cube import CubeScene, cube_scene_materials

    scene = CubeScene()
    data = scene.scene_data()
    mats = jax.device_put(cube_scene_materials(with_mips=True))
    cam = FreeLookCamera()
    w, h = 1280, 720
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    from bibim_tpu.pipeline.autotune import autotune_settings

    base = RenderSettings(width=w, height=h, outputs="image",
                          batch_material_ids=scene.material_ids,
                          show_gizmo=False, show_lights=False)
    s, _ = autotune_settings(data, vb, base, margin=1.05)

    import dataclasses

    _validate(
        lambda: render_frame(data, vb, fp, mats, None,
                             dataclasses.replace(s, outputs="full")),
        "config2_cube_720p",
    )

    def step():
        return render_frame(data, vb, fp, mats, None, s)["image"]

    report.setdefault("configs_loop", {})["cube_mips_720p"] = round(
        _time(step, iters=5), 2)

    def frame_body(carry):
        return render_frame(data, vb._replace(view=vb.view + carry),
                            FrameParams(fp.enable_tone_mapping,
                                        fp.exposure + carry),
                            mats, None, s)["image"]

    report["configs"]["cube_mips_720p"] = round(_time_scan(frame_body), 2)


def bench_instanced(report: dict, n_instances: int = 64) -> None:
    """Config 4: 64 ShaderBall instances, 1080p."""
    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams,
        RenderSettings,
        ViewBlock,
        material_quads_from_set,
        render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    from bibim_tpu.scene.culling import cull_scene_instances

    scene = ShaderBallScene(num_instances=n_instances)
    cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    data = scene.scene_data()
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material)
    )
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    # Host frustum culling, exactly as the per-frame host loop would run
    # it (the reference recomputes instance matrices on the CPU each
    # frame; this is the same pass also dropping certainly-offscreen
    # instances before the static-shape triangle stages pay for them).
    data = cull_scene_instances(
        data, np.asarray(cam.get_view_matrix()),
        np.asarray(m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)),
    )
    # Dense distant instances: the probe measures the worst tile's ~2.1k
    # candidates and derives depth-chained 1024-candidate windows plus a
    # tight span_cap (the hand-swept tools/exp_c4.py winner, now derived).
    from bibim_tpu.pipeline.autotune import autotune_settings

    import dataclasses

    # Production routed-exact sampler (see bench_shaderball).
    base = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                          show_gizmo=False, show_lights=False,
                          pair_sampling=2)
    s, probe = autotune_settings(data, vb, base, margin=1.05,
                                 materials=mats)

    def frame_body_for(sx):
        def body(carry):
            return render_frame(data, vb._replace(view=vb.view + carry),
                                FrameParams(fp.enable_tone_mapping,
                                            fp.exposure + carry),
                                mats, None, sx)["image"]
        return body

    # Dense-pass slot count is a measured schedule choice (the analytic
    # derivation can't see whole-program layout/fusion effects — see
    # autotune.dense_cap_candidates / PERFORMANCE.md round-5); every
    # candidate's capacities stay probe-validated.
    from bibim_tpu.pipeline.autotune import (
        dense_cap_candidates,
        pick_measured,
    )

    cands = dense_cap_candidates(s, probe, margin=1.05)
    if len(cands) > 1:
        s, results = pick_measured(
            cands, lambda sx: _time_scan(frame_body_for(sx), iters=2))
        report["x64_dense_pick"] = [
            {"dense_tile_cap": sx.dense_tile_cap, "ms": round(t, 2)}
            for t, sx in results
        ]

    _validate(
        lambda: render_frame(data, vb, fp, mats, None,
                             dataclasses.replace(s, outputs="full")),
        "config4_shaderball_x64",
    )

    def step():
        return render_frame(data, vb, fp, mats, None, s)["image"]

    report.setdefault("configs_loop", {})[
        f"shaderball_x{n_instances}_1080p"] = round(_time(step, iters=5), 2)

    ms = round(_time_scan(frame_body_for(s)), 2)
    report["configs"][f"shaderball_x{n_instances}_1080p"] = ms
    report.setdefault("configs_px_sampling", {})[
        f"shaderball_x{n_instances}_1080p"] = (round(_time_scan(
            frame_body_for(dataclasses.replace(s, pair_sampling=0))), 2)
            if s.pair_sampling else ms)


def bench_stretch_4k(report: dict) -> None:
    """Config 5 (stretch): 4K frame — PBR + shadow map + IBL + overlays."""
    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops.ibl import make_ibl_sh
    from bibim_tpu.pipeline import (
        FrameParams,
        RenderSettings,
        ViewBlock,
        make_overlay_resources,
        material_quads_from_set,
        render_frame,
    )
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    w, h = 3840, 2160
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    mats = jax.device_put(
        material_quads_from_set(create_pbr_material_set(),
                                scene.selected_material)
    )
    ibl = jax.device_put(make_ibl_sh())
    overlay = make_overlay_resources()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    # 4K: main-camera capacities are probed+derived; the light-view
    # shadow raster has its own concentration profile (hand-set windows —
    # the probe only sees the main camera).
    from bibim_tpu.pipeline.autotune import autotune_settings

    base = RenderSettings(width=w, height=h, outputs="image",
                          enable_shadows=True, enable_ibl=True,
                          span_cap=32,
                          shadow_fit_batches=scene.shadow_fit_batches,
                          pair_sampling=2)
    data = scene.scene_data()
    # Shadow capacities (candidates/passes/tile cap) are derived from the
    # light-view probe inside autotune_settings — no hand caps; overlay
    # caps likewise (the sphere-pass binning probe).
    s, _ = autotune_settings(data, vb, base, margin=1.05, materials=mats,
                             overlay=overlay)

    import dataclasses

    _validate(
        lambda: render_frame(data, vb, fp, mats, overlay,
                             dataclasses.replace(s, outputs="full"),
                             ibl=ibl),
        "config5_stretch_4k",
    )

    def step():
        return render_frame(data, vb, fp, mats, overlay, s,
                            ibl=ibl)["image"]

    report.setdefault("configs_loop", {})["stretch_4k_shadows_ibl"] = round(
        _time(step, iters=5), 2)

    # Headline number = fully exact path: the autotuned sampler (routing
    # only when the escape probe says it pays — mip-less 4K minification
    # escapes everywhere, so this is the px-exact path) + per-pixel PCF.
    # The pair-rate PCF (lossy: partner shares the rep's visibility) is
    # reported alongside for attribution.
    def frame_body(carry, sx=s):
        return render_frame(data, vb._replace(view=vb.view + carry),
                            FrameParams(fp.enable_tone_mapping,
                                        fp.exposure + carry),
                            mats, overlay, sx, ibl=ibl)["image"]

    ms = round(_time_scan(frame_body, iters=4), 2)
    report["configs"]["stretch_4k_shadows_ibl"] = ms
    report.setdefault("configs_px_sampling", {})[
        "stretch_4k_shadows_ibl"] = (round(_time_scan(
            lambda c: frame_body(
                c, dataclasses.replace(s, pair_sampling=0)), iters=4), 2)
        if s.pair_sampling else ms)
    report.setdefault("configs_lossy", {})["stretch_4k_pair_vis"] = round(
        _time_scan(lambda c: frame_body(
            c, dataclasses.replace(s, pair_visibility=True)),
            iters=4), 2)

    # 4K stage breakdown (VERDICT r1 item 6): production-shaped bodies —
    # compacted slot planes, the real shadow map, the real psoup — timed
    # with the same in-jit scan harness as the headline stages. Each
    # standalone stage carries ~0.3-0.7 ms of harness floor.
    from bibim_tpu.ops import fused
    from bibim_tpu.ops import shadow as sh_ops
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.ops.ibl import ibl_ambient
    from bibim_tpu.pipeline.framegraph import (
        _assemble_and_raster,
        _shadow_fit_ranges,
        _shadow_map_planar,
    )

    live_cap = s.live_tile_cap or (s.tiles_x * s.tiles_y)
    fit_tri, _fit_vert = _shadow_fit_ranges(data, s)

    @jax.jit
    def probe4k(scene_data, view_block):
        px, _z, _d, _soup, psoup = _assemble_and_raster(
            scene_data, view_block, s)
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, live_cap)
        px_c = jax.tree_util.tree_map(lambda p: p[ids], px)
        smap, _sd = _shadow_map_planar(psoup, scene_data.lights, s,
                                       fit_ranges=fit_tri)
        return px_c, psoup, smap

    px_c, psoup, smap = probe4k(data, vb)
    use_pallas = jax.default_backend() == "tpu"

    def _perturb(tree, c):
        return jax.tree_util.tree_map(
            lambda p: p + c.astype(p.dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, tree)

    half = jax.tree_util.tree_map(lambda p: p * 0 + 0.5, px_c.uv[0])
    report["stages_4k"] = {
        "raster_resolve": round(_time_scan_stage(
            lambda c: _assemble_and_raster(
                data, vb._replace(view=vb.view + c), s)[:3], iters=2), 2),
        "shadow_map_raster": round(_time_scan_stage(
            lambda c: (lambda sm_d: (sm_d[0].quads, sm_d[0].light_vp,
                                     sm_d[1]))(
                _shadow_map_planar(_perturb(psoup, c), data.lights, s,
                                   fit_ranges=fit_tri)),
            iters=2), 2),
        "pcf_visibility": round(_time_scan_stage(
            (lambda c: sh_ops.shadow_factor_compact(
                smap, tuple(w + c for w in px_c.world),
                px_c.tri_id >= 0, s.shadow_query_tile_cap, s.shadow_bias))
            if s.shadow_query_tile_cap is not None else
            (lambda c: sh_ops.shadow_factor(
                smap, tuple(w + c for w in px_c.world), s.shadow_bias)),
            iters=2), 2),
        "material_sample": round(_time_scan_stage(
            lambda c: tq.sample_material(
                mats, px_c.uv[0] + c, px_c.uv[1],
                tile_h=s.tile_h, tile_w=s.tile_w,
                use_pallas=use_pallas), iters=2), 2),
        "ibl_ambient": round(_time_scan_stage(
            lambda c: ibl_ambient(
                ibl, tuple(n + c for n in px_c.normal),
                tuple(vb.view_pos[i] - w for i, w in enumerate(px_c.world)),
                px_c.color, half, half, half + 0.5,
                s.tile_h, s.tile_w, use_pallas=use_pallas), iters=2), 2),
    }


def _progress(msg: str) -> None:
    """Stage progress on stderr (stdout stays the one JSON line)."""
    import sys
    import time as _t

    print(f"[bench {_t.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main() -> None:
    import os

    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    report: dict = {"configs": {}}

    # Iteration filter: BIBIM_BENCH_ONLY="3,5" runs just those configs
    # (headline always runs — it is the metric line).
    only = os.environ.get("BIBIM_BENCH_ONLY")
    only_set = {c.strip() for c in only.split(",")} if only else None

    def want(cfg: str) -> bool:
        return only_set is None or cfg in only_set

    _progress("config 3: shaderball 1080p (headline)")
    ms = bench_shaderball(report)
    _progress(f"headline {ms:.2f} ms; config 1: gizmo 512")
    if want("1"):
        try:
            bench_gizmo(report)
        except Exception as e:  # pragma: no cover - aux configs must not
            report["configs"]["gizmo_flat_512"] = f"error: {e}"  # kill CI
    if want("2"):
        _progress("config 2: cube mips 720p")
        try:
            bench_cube(report)
        except Exception as e:  # pragma: no cover
            report["configs"]["cube_mips_720p"] = f"error: {e}"
    if want("4"):
        _progress("config 4: shaderball x64 1080p")
        try:
            bench_instanced(report)
        except Exception as e:  # pragma: no cover
            report["configs"]["shaderball_x64_1080p"] = f"error: {e}"
    if want("5"):
        _progress("config 5: 4K shadows+IBL")
        try:
            bench_stretch_4k(report)
        except Exception as e:  # pragma: no cover
            report["configs"]["stretch_4k_shadows_ibl"] = f"error: {e}"
    _progress("done")

    print(
        json.dumps(
            {
                "metric": "shaderball_pbr_1080p_frame",
                "value": round(ms, 3),
                "unit": "ms/frame",
                "vs_baseline": round(TARGET_MS / ms, 3),
                "mpix_per_s": round(WIDTH * HEIGHT / ms / 1e3, 1),
                "device": str(jax.devices()[0]),
                **report,
            }
        )
    )


if __name__ == "__main__":
    main()
