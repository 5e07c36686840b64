"""Measurement-harness control: one gather, three timing methods.

The same real-stream gather has measured 4.7 ms (bench dispatch-loop
stage), and ~16 ms (lax.scan-wrapped with a carry dependency). Until
this is explained, no gather number is trustworthy. Times the identical
workload via:

  A. dispatch loop (bench._time style, 20 iters, sync once)
  B. lax.scan with carry-dependent indices
  C. lax.scan, carry only chains the OUTPUT (indices constant)
  D. dispatch loop around jit(gather+sum) with the sum consumed

Run: python tools/exp_harness.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SCAN_ITERS = 8


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)

    rows = 4194304
    n = 851968  # 832 x 1024: the 1080p compacted slot count
    table = jnp.asarray(
        np.random.default_rng(0).integers(-(1 << 31), 1 << 31,
                                          (rows, 4)).astype(np.int32))
    # run-heavy stream like the real one: runs of 4 identical indices
    base = np.random.default_rng(1).integers(0, rows, n // 4)
    idx_np = np.repeat(base, 4).astype(np.int32)
    idx = jnp.asarray(idx_np)

    @jax.jit
    def gather_sum(idx):
        q = table[idx]
        return jnp.sum(q, dtype=jnp.int32)

    # A: dispatch loop
    out = gather_sum(idx)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = gather_sum(idx)
    sync(out)
    a = (time.perf_counter() - t0) / 20 * 1e3
    print(f"A dispatch loop:            {a:8.3f} ms "
          f"({a * 1e6 / n:.2f} ns/slot)", flush=True)

    # B: scan, carry-dependent indices
    @jax.jit
    def scan_dep():
        def step(carry, _):
            q = table[idx + jnp.minimum(carry.astype(jnp.int32), 0)]
            s = jnp.sum(q, dtype=jnp.int32)
            return (s & 1).astype(jnp.float32) * 1e-30, s

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    out = scan_dep()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = scan_dep()
    sync(out)
    b = (time.perf_counter() - t0) / 4 / SCAN_ITERS * 1e3
    print(f"B scan dep-idx:             {b:8.3f} ms "
          f"({b * 1e6 / n:.2f} ns/slot)", flush=True)

    # C: scan, constant indices, carry chains output only
    @jax.jit
    def scan_const():
        def step(carry, _):
            q = table[idx]
            s = jnp.sum(q, dtype=jnp.int32) + carry.astype(jnp.int32)
            return (s & 1).astype(jnp.float32) * 1e-30, s

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    out = scan_const()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = scan_const()
    sync(out)
    c = (time.perf_counter() - t0) / 4 / SCAN_ITERS * 1e3
    print(f"C scan const-idx:           {c:8.3f} ms "
          f"({c * 1e6 / n:.2f} ns/slot)", flush=True)

    # D: dispatch loop but f32-unpacked like production
    @jax.jit
    def gather_f32(idx):
        q = table[idx]
        parts = [((q >> (8 * b)) & 0xFF).astype(jnp.float32)
                 for b in range(4)]
        qq = jnp.stack(parts, axis=-1).reshape(q.shape[0], -1)
        return jnp.sum(qq)

    out = gather_f32(idx)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = gather_f32(idx)
    sync(out)
    d = (time.perf_counter() - t0) / 20 * 1e3
    print(f"D dispatch loop + unpack:   {d:8.3f} ms "
          f"({d * 1e6 / n:.2f} ns/slot)", flush=True)


if __name__ == "__main__":
    main()


def real_stream_control():
    """E/F: the REAL 1080p stream — (E) production code path
    (sample_table_xla: uv in, footprint computed in-jit) vs (F) the same
    gather with idx precomputed and fed as an input array."""
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.ops import texture_quad as tq
    from bibim_tpu.pipeline import material_quads_from_set
    from bibim_tpu.scene import ShaderBallScene
    from bibim_tpu.ops import fused
    from bibim_tpu import math3d as m3
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.scene import FreeLookCamera

    mats = material_quads_from_set(create_pbr_material_set(),
                                   ShaderBallScene().selected_material)
    big = [t for t in mats if t.height * t.width > tq.SMALL_ROWS][0]
    Wt, Ht = big.width, big.height
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, 1920 / 1080, 0.1, 1000.0)
    data = scene.scene_data()

    @jax.jit
    def get_uv(batches):
        psoup = assemble_scene_planar(batches, view, proj, None)
        setup = triangle_setup_planar(psoup.clip, 1920, 1080)
        rec = fused.build_record_table_planar(setup, psoup)
        px, _, _ = fused.raster_fused_pallas(
            rec, setup, 1920, 1080, max_candidates=320, span_cap=16,
            pair_budget=24576, raster_tile_cap=1024)
        live = jnp.any(px.tri_id >= 0, axis=1)
        ids, _ = fused._compact_tile_list(live, 832)
        return px.uv[0][ids], px.uv[1][ids]

    u, v = get_uv(data.batches)
    n = u.size

    @jax.jit
    def prod(u, v):
        out = tq.sample_table_xla(big, u, v)
        return sum(jnp.sum(x) for x in out.values())

    out = prod(u, v)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = prod(u, v)
    sync(out)
    e = (time.perf_counter() - t0) / 20 * 1e3
    print(f"E production sample_table_xla: {e:8.3f} ms "
          f"({e * 1e6 / n:.2f} ns/slot)", flush=True)

    uf, vf = u.reshape(-1), v.reshape(-1)
    fx = uf * Wt - 0.5
    fy = vf * Ht - 0.5
    x0 = jnp.remainder(jnp.floor(fx).astype(jnp.int32), Wt)
    y0 = jnp.remainder(jnp.floor(fy).astype(jnp.int32), Ht)
    idx = y0 * Wt + x0
    idx = jax.device_put(np.asarray(jax.device_get(idx)))

    @jax.jit
    def fed(idx):
        q = big.quads[idx]
        return jnp.sum(q, dtype=jnp.int32)

    out = fed(idx)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = fed(idx)
    sync(out)
    f = (time.perf_counter() - t0) / 20 * 1e3
    print(f"F idx-as-input gather:         {f:8.3f} ms "
          f"({f * 1e6 / n:.2f} ns/slot)", flush=True)


real_stream_control()
