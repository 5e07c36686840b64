"""Attribute the 1.19 ms bin_pairs stage and the 0.97 ms geometry stage.

bin_pairs sorts T*SPAN_DENSE + span_mid_cap*span_cap slots (72.8k on the
headline frame) for 16.7k live pairs. A multi-class mid expansion
(classes at 4/8/16 slots sized from the probe's span distribution) would
shrink the sort input to ~39k. This measures whether the sort is
actually the dominant term before building it, plus the geometry chain's
internal split (assemble vs setup vs record build).

Run: python tools/exp_bin.py
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

WIDTH, HEIGHT = 1920, 1080
SCAN_ITERS = 8


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:56s} {(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:9.3f} ms",
          flush=True)
    return out


def scanned(fn):
    """Scan harness: FULL-output reduction chained into the carry (rule 8)."""

    @jax.jit
    def run(*args):
        def body(carry, _):
            scaled = jax.tree_util.tree_map(
                lambda a: a * (1 + carry * 0).astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                args,
            )
            out = fn(*scaled, carry)
            leaves = jax.tree_util.tree_leaves(out)
            dep = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-30
            return dep.astype(jnp.float32).reshape(()), leaves[0].ravel()[:1]

        _, outs = lax.scan(body, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    print(f"device: {jax.devices()[0]}", flush=True)
    scene = ShaderBallScene()
    cam = FreeLookCamera()
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    data = scene.scene_data()
    view_block = ViewBlock(view=view, proj=proj,
                           view_pos=jnp.asarray(cam.pos),
                           enable_normal_map=jnp.int32(0))
    settings, probe = autotune_settings(
        data, view_block,
        RenderSettings(width=WIDTH, height=HEIGHT, outputs="image"),
        margin=1.05,
    )
    print("probe:", probe, flush=True)
    print("span_mid_cap:", settings.span_mid_cap, "span_cap:",
          settings.span_cap, flush=True)

    # ---- primitive costs ------------------------------------------------
    t = probe.n_tris
    rng = np.random.default_rng(0)

    for n in (int(t * fused.SPAN_DENSE + settings.span_mid_cap
                  * settings.span_cap), 40960, 20480):
        tiles = jnp.asarray(rng.integers(0, 2026, n).astype(np.int32))
        tris = jnp.asarray(rng.permutation(n).astype(np.int32))

        def sort2(a, b, carry):
            return lax.sort((a + (carry * 0).astype(jnp.int32), b),
                            num_keys=2, is_stable=False)

        timeit(f"unstable 2-key sort, n={n}", scanned(sort2), tiles, tris)

    vals = jnp.asarray(rng.standard_normal(t).astype(np.float32))

    def topk(v, carry):
        return lax.top_k(v + carry * 0, 3328)

    timeit(f"top_k(3328) of {t}", scanned(topk), vals)

    big_sorted = jnp.sort(jnp.asarray(rng.integers(0, 2026, 72832)
                                      .astype(np.int32)))

    def ssearch(s, carry):
        return jnp.searchsorted(s + (carry * 0).astype(jnp.int32),
                                jnp.arange(2026, dtype=jnp.int32))

    timeit("searchsorted 2026 into 72.8k", scanned(ssearch), big_sorted)

    # ---- production bin_pairs (control) --------------------------------
    @jax.jit
    def geom(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        return psoup, setup

    psoup, setup = geom(view)

    def bin_prod(s, carry):
        s = jax.tree_util.tree_map(
            lambda a: a + (carry * 0).astype(a.dtype)
            if hasattr(a, "dtype") else a, s)
        out = fused.bin_pairs(
            s, WIDTH, HEIGHT, settings.tile_h, settings.tile_w,
            settings.span_cap, 64, settings.max_candidates,
            pair_budget=settings.pair_budget,
            span_mid_cap=settings.span_mid_cap,
        )
        return out[:5]

    def bin_nomid(s, carry):
        s = jax.tree_util.tree_map(
            lambda a: a + (carry * 0).astype(a.dtype)
            if hasattr(a, "dtype") else a, s)
        out = fused.bin_pairs(
            s, WIDTH, HEIGHT, settings.tile_h, settings.tile_w,
            settings.span_cap, 64, settings.max_candidates,
            pair_budget=settings.pair_budget, span_mid_cap=None,
        )
        return out[:5]

    timeit("bin_pairs production (span-class)", scanned(bin_prod), setup)
    timeit("bin_pairs span_mid=None (T*16 slots)", scanned(bin_nomid), setup)

    # ---- geometry chain breakdown (cumulative; standalone planar outputs
    # hit bad layouts, so each stage keeps its predecessor live) ---------
    def g1(view_m, carry):
        return assemble_scene_planar(
            data.batches, view_m * (1 + carry * 0), proj, None)

    def g2(view_m, carry):
        psoup = assemble_scene_planar(
            data.batches, view_m * (1 + carry * 0), proj, None)
        return triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)

    def g3(view_m, carry):
        psoup = assemble_scene_planar(
            data.batches, view_m * (1 + carry * 0), proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        return fused.build_record_table_planar(setup, psoup)

    timeit("geometry: assemble only", scanned(g1), view)
    timeit("geometry: assemble + setup", scanned(g2), view)
    timeit("geometry: assemble + setup + record", scanned(g3), view)


if __name__ == "__main__":
    main()
