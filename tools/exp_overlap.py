"""Can an XLA row-gather stream overlap a Pallas kernel's compute AT ALL?

VERDICT r4 #1: the exact-headline roofline (docs/PERFORMANCE.md round-4)
credits XLA with ~1.3 ms of gather/compute overlap and names "scheduling
overlap" as the remaining 7.66 -> ~6.5 ms lever — but no experiment
attacks it directly. Before building a software-pipelined stripe frame
(sample stripe 0 while rastering stripe 1), this measures the primitive
the idea depends on: two INDEPENDENT ops in one jit — a pixel-rate row
gather (the material sampler's shape) and a pure-VMEM-compute Pallas
kernel (the raster kernel's shape) — against each op alone.

  total(C) ≈ max(A, B)  -> the scheduler overlaps core-issued gathers
                           with custom-call compute; stripes are worth
                           building.
  total(C) ≈ A + B      -> ops serialize on the single tensor core;
                           stripe interleaving cannot help, the frame's
                           residual "overlap gap" is not reachable by
                           reordering the DAG, and the lever closes.

Harness: tools/exp_harness.py rules — every variant runs inside one
8-iteration lax.scan whose carry perturbs ALL inputs and folds a FULL
reduction of EVERY output (no CSE, no DCE).

Run (TPU): python tools/exp_overlap.py          # micro A-F
           python tools/exp_overlap.py --frame  # frame-removal attribution
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bibim_tpu.utils.cache import enable_compilation_cache

N_PIX = 753_664  # headline covered-pixel count, rounded to lanes
ROWS_LOG2 = 18  # block-table scale (2048^2 map -> 2^18 quad rows)
ROW_I32 = 32  # 128 B rows as int32 lanes
SCAN = 8


def _sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]
                                     .ravel()[:1]))


def _time(run, iters=4, warmup=2):
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
        samples.append((time.perf_counter() - t0) / iters / SCAN * 1e3)
    return float(np.median(samples))


# -- the two component ops ---------------------------------------------------


def gather_ms_component(table, idx, carry):
    """Pixel-rate row gather, carry-perturbed; returns (rows, reduction)."""
    shift = (carry.astype(jnp.int32) & 1)
    rows = table[(idx + shift) & ((1 << ROWS_LOG2) - 1)]
    return jnp.sum(rows, dtype=jnp.int32)


def _compute_kernel(x_ref, o_ref, *, k):
    v = x_ref[...]

    def body(_, v):
        return v * 1.0000001 + 0.25

    o_ref[...] = lax.fori_loop(0, k, body, v)


def make_compute(g, k):
    """Pure-VMEM Pallas chain: grid g, k fma iterations per (8,128) block."""
    fn = pl.pallas_call(
        functools.partial(_compute_kernel, k=k),
        grid=(g,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g * 8, 128), jnp.float32),
    )
    return fn


def scan_run(body):
    @jax.jit
    def run():
        def step(carry, _):
            red = body(carry)
            return (red * 1e-30).astype(jnp.float32).reshape(()), red

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN)
        return outs

    return run


def frame_level():
    """Frame-removal attribution at the 1080p headline (the honest
    in-frame stage cost — exp_4kladder.py methodology): full production
    frame vs the same frame with 32² materials (MXU one-hot sampling, no
    pixel-rate gather). The delta is the TRUE in-frame cost of the
    gather sampler; if it matches the standalone stage scan (~4.0 ms),
    the frame has NO overlap to harvest and the stage-sum-vs-frame
    discrepancy is stage-harness inflation (known from
    tools/exp_x64frame.py: frozen-stream stage scans measure up to ~5×
    in-frame cost)."""
    import dataclasses

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.pipeline import (FrameParams, RenderSettings, ViewBlock,
                                    make_overlay_resources,
                                    material_quads_from_set, render_frame)
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    w, h = 1920, 1080
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    mset = create_pbr_material_set()
    sel = scene.selected_material
    mats = jax.device_put(material_quads_from_set(mset, sel))
    maps = tq.pack_material_maps(mset, sel)
    small_maps = {k: np.ascontiguousarray(
        img[::max(1, img.shape[0] // 32), ::max(1, img.shape[1] // 32)])
        for k, img in maps.items()}
    mats_small = jax.device_put(tq.build_quad_tables(small_maps))
    overlay = make_overlay_resources()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    fp = FrameParams(enable_tone_mapping=jnp.int32(1),
                     exposure=jnp.float32(1.0))
    base = RenderSettings(width=w, height=h, outputs="image",
                          overlay_candidates=256, overlay_max_tiles=384,
                          pair_sampling=2)
    data = scene.scene_data()
    s, _ = autotune_settings(data, vb, base, margin=1.05, materials=mats)
    print(f"device: {jax.devices()[0]}", flush=True)

    def run_variant(name, settings, m, ov):
        def body(carry):
            vbc = vb._replace(view=vb.view + carry)
            img = render_frame(data, vbc, fp, m, ov, settings)["image"]
            return (jnp.sum(img, dtype=jnp.int32) & 1).astype(jnp.float32)

        ms = _time(scan_run(body))
        print(f"{name:44s} {ms:8.3f} ms", flush=True)
        return ms

    full = run_variant("full production headline", s, mats, overlay)
    small = run_variant("32^2 materials (no big gather)", s, mats_small,
                        overlay)
    noov = run_variant("- overlays", s, mats, None)
    print(f"\nin-frame gather-sampler cost (full - small): "
          f"{full - small:.3f} ms", flush=True)
    print(f"in-frame overlay cost (full - no overlays): "
          f"{full - noov:.3f} ms", flush=True)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(5)
    table = jnp.asarray(
        rng.integers(0, 1 << 20, (1 << ROWS_LOG2, ROW_I32), np.int32))
    idx = jnp.asarray(
        rng.integers(0, 1 << ROWS_LOG2, (N_PIX,), np.int32))
    x = jnp.asarray(rng.uniform(0.5, 1.0, (512 * 8, 128)).astype(np.float32))

    # Calibrate the compute kernel to ~gather-stage length (~3 ms).
    print("== calibrate compute kernel ==", flush=True)
    chosen = None
    for k in (512, 1024, 2048, 4096, 8192):
        fn = make_compute(512, k)

        def body(carry, fn=fn):
            out = fn(x + carry)
            return jnp.sum(out, dtype=jnp.float32)

        ms = _time(scan_run(body))
        print(f"  g=512 k={k}: {ms:.3f} ms", flush=True)
        if chosen is None and ms >= 2.4:
            chosen = (k, ms)
    k, compute_ms = chosen if chosen else (8192, ms)
    fn = make_compute(512, k)

    def body_gather(carry):
        return gather_ms_component(table, idx, carry).astype(jnp.float32)

    def body_compute(carry):
        return jnp.sum(fn(x + carry), dtype=jnp.float32)

    def body_both(carry):
        # INDEPENDENT: neither op consumes the other's output; both
        # reductions feed the carry.
        g = gather_ms_component(table, idx, carry).astype(jnp.float32)
        c = jnp.sum(fn(x + carry), dtype=jnp.float32)
        return g + c

    def body_serial(carry):
        # DEPENDENT control: the kernel input is perturbed by the gather
        # result, forcing gather -> compute order.
        g = gather_ms_component(table, idx, carry).astype(jnp.float32)
        c = jnp.sum(fn(x + g * 1e-30 + carry), dtype=jnp.float32)
        return g + c

    def body_two_gathers(carry):
        # Do two independent gather streams overlap EACH OTHER?
        g1 = gather_ms_component(table, idx, carry)
        g2 = gather_ms_component(table, idx + 7, carry)
        return (g1 + g2).astype(jnp.float32)

    half = N_PIX // 2
    fn_half = make_compute(256, k)
    xh = x[: 256 * 8]

    def body_stripes(carry):
        # The stripe-pipeline shape at micro scale: gather(stripe 0),
        # then compute(stripe 1) INDEPENDENT of it, then gather(stripe 1)
        # dependent on compute 0's result, etc. If the scheduler could
        # overlap, the interleaved halves would beat body_serial's order.
        g1 = gather_ms_component(table, idx[:half], carry)
        c1 = jnp.sum(fn_half(xh + carry), dtype=jnp.float32)
        g2 = gather_ms_component(table, idx[half:], carry + c1 * 1e-30)
        c2 = jnp.sum(fn_half(xh + carry + g1.astype(jnp.float32) * 1e-30),
                     dtype=jnp.float32)
        return (g1 + g2).astype(jnp.float32) + c1 + c2

    print("== measure ==", flush=True)
    a = _time(scan_run(body_gather))
    print(f"A gather alone:            {a:.3f} ms", flush=True)
    b = _time(scan_run(body_compute))
    print(f"B pallas compute alone:    {b:.3f} ms", flush=True)
    c = _time(scan_run(body_both))
    print(f"C both, independent:       {c:.3f} ms "
          f"(sum {a + b:.3f}, max {max(a, b):.3f})", flush=True)
    d = _time(scan_run(body_serial))
    print(f"D both, data-dependent:    {d:.3f} ms", flush=True)
    e = _time(scan_run(body_two_gathers))
    print(f"E two gathers independent: {e:.3f} ms (2x gather {2 * a:.3f})",
          flush=True)
    f = _time(scan_run(body_stripes))
    print(f"F half-stripe interleave:  {f:.3f} ms (vs C {c:.3f})",
          flush=True)

    overlap = (a + b) - c
    print(f"\nC vs serial sum: {overlap:.3f} ms "
          f"({100 * overlap / min(a, b):.0f}% of the smaller op) — but "
          "the decisive comparison is C (independent) vs D (forced "
          "serial) vs F (stripe-interleaved): only a dependence-"
          "structure-sensitive schedule can be exploited by reordering "
          "the frame's DAG.")
    if d - c > 0.5 or d - f > 0.5:
        print("VERDICT: schedule IS dependence-sensitive — stripe "
              "pipelining can harvest overlap; build the split frame")
    else:
        print(f"VERDICT: C == D == F (spread "
              f"{max(c, d, f) - min(c, d, f):.3f} ms) — the schedule "
              "ignores dependence structure entirely (any C-vs-sum gap "
              "is co-compilation constant folding, present even when "
              "serialized). DAG reordering (stripes, donation, op "
              "ordering) cannot harvest the residual stage-sum gap; "
              "the lever closes.")


if __name__ == "__main__":
    if "--frame" in sys.argv:
        enable_compilation_cache()
        frame_level()
    else:
        main()
