"""Round-5 x64 (config 4) exact-path sweep — VERDICT r4 #4.

The instanced config pays ~2 ms over the headline (9.6 vs 7.5 exact).
Candidates named by the verdict: per-instance frustum culling (ALREADY
on in bench_instanced), merged-coverage re-tune on the exact path, and
the 5-pass/fat-window structure last swept in r2/r3 (exp_c4/exp_merged)
before the exact re-centering. This sweeps the current autotuned
derivation against its neighbors with SUSTAINED in-jit-scan timing
(tools/exp_harness.py rules: view-matrix-chained carry, nothing dead).

Run (TPU): python tools/exp_x64r5.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

WIDTH, HEIGHT = 1920, 1080
SCAN = 8


def _sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]
                                     .ravel()[:1]))


def time_scan(frame_body, iters=3, warmup=1):
    @jax.jit
    def run():
        def step(carry, _):
            img = frame_body(carry)
            dep = (jnp.sum(img, dtype=jnp.int32) & 1).astype(
                jnp.float32) * 1e-30
            return dep, img[:1, :1]

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN)
        return outs

    out = None
    for _ in range(warmup):
        out = run()
    _sync(out)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run()
        _sync(out)
        samples.append((time.perf_counter() - t0) / iters / SCAN * 1e3)
    return float(np.median(samples))


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams, RenderSettings, ViewBlock,
        material_quads_from_set, render_frame,
    )
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    scene = ShaderBallScene(num_instances=64)
    cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    mats = jax.device_put(material_quads_from_set(
        create_pbr_material_set(), scene.selected_material))
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=jnp.asarray(cam.get_view_matrix()), proj=proj,
                   view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    data = cull_scene_instances(
        scene.scene_data(), np.asarray(cam.get_view_matrix()),
        np.asarray(proj))
    print("instances after cull:",
          [b.model.shape[0] for b in data.batches], flush=True)

    base = RenderSettings(width=WIDTH, height=HEIGHT, outputs="image",
                          show_gizmo=False, show_lights=False,
                          pair_sampling=2)
    s0, probe = autotune_settings(data, vb, base, margin=1.05,
                                  materials=mats)
    print("derived:", {k: getattr(s0, k) for k in (
        "max_candidates", "raster_passes", "span_cap", "span_mid_cap",
        "overflow_cap", "pair_budget", "live_tile_cap", "raster_tile_cap",
        "dense_tile_cap", "merged_coverage", "pair_sampling")},
        flush=True)
    print(f"probe: worst tile {probe.max_candidates}, pairs "
          f"{probe.total_pairs}, bin live {probe.bin_tiles}, covered "
          f"{probe.covered_tiles}, dense {probe.dense_tiles}", flush=True)

    ref_img = {}

    def run(tag, s, check_bits=True):
        out = render_frame(data, vb, fp, mats, None,
                           dataclasses.replace(s, outputs="full"))
        d = out["bin_diag"]
        drops = tuple(int(x) for x in jax.device_get(
            (d.dropped_overflow, d.dropped_cap, d.dropped_pairs,
             d.dropped_tiles)))
        img = np.asarray(jax.device_get(out["image"]))
        if check_bits:
            if "ref" not in ref_img:
                ref_img["ref"] = img
            eq = (img == ref_img["ref"]).all()
        else:
            eq = True

        def body(carry):
            vbc = vb._replace(view=vb.view + carry)
            return render_frame(data, vbc, fp, mats, None, s)["image"]

        ms = time_scan(body)
        print(f"{tag:52s} {ms:7.2f} ms  drops={drops} "
              f"{'bit==' if eq else 'DIFFERS'}", flush=True)
        return ms

    run("derived baseline", s0)
    if s0.merged_coverage:
        run("merged_coverage OFF", dataclasses.replace(
            s0, merged_coverage=False))
    else:
        run("merged_coverage ON", dataclasses.replace(
            s0, merged_coverage=True))

    # Window-structure ladder at fixed total capacity >= demand.
    demand = int(probe.max_candidates * 1.05) + 8
    for mc in (512, 1024, 2048):
        p = -(-demand // mc)
        if mc * p == s0.max_candidates * s0.raster_passes and \
                mc == s0.max_candidates:
            continue
        for merged in (True, False):
            run(f"windows {mc}x{p} merged={merged}",
                dataclasses.replace(s0, max_candidates=mc,
                                    raster_passes=p,
                                    merged_coverage=merged))

    # Span routing neighbors.
    for span in sorted({max(2, s0.span_cap // 2), s0.span_cap * 2}):
        if span == s0.span_cap:
            continue
        s2, _ = autotune_settings(
            data, vb, dataclasses.replace(base, span_cap=span),
            margin=1.05, materials=mats)
        s2 = dataclasses.replace(s2, span_cap=span)
        run(f"re-derived at span {span}", s2, check_bits=True)

    # Dense-pass granularity.
    if s0.dense_tile_cap is not None:
        for f in (2, 4):
            run(f"dense_tile_cap x{f}", dataclasses.replace(
                s0, dense_tile_cap=min(s0.dense_tile_cap * f,
                                       probe.n_tiles)))

    # Sampling side: is the x64 frame's sampler at px-exact already?
    if s0.pair_sampling:
        run("pair routing OFF (px exact)", dataclasses.replace(
            s0, pair_sampling=0, sample_route_caps=None))


if __name__ == "__main__":
    main()
