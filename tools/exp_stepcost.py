"""What is the fused raster kernel's ~2.4 us/step fixed cost made of?

Hypothesis: per-step output DMA issue. The kernel writes 19 separate
(1, 8, 128) output blocks per grid step; if each write is its own DMA at
~0.1-0.2 us issue cost, 19 x 1024 steps explains most of the ~2.5 ms
fixed floor — and either packing the outputs into ONE (19*8, 128) block
or batching g tiles per step divides the issue count.

Variants (all 1024 steps' worth of (8,128) f32 tile output, same total
bytes written, trivial compute):
  A: 1 output plane, 1024 steps            (baseline floor)
  B: 19 output planes, 1024 steps          (the production shape)
  C: 1 packed (152, 128) output, 1024 steps
  D: 19 planes, (4, 8, 128) blocks, 256 steps
  E: 1 packed (4, 152, 128) output, 256 steps

Run: python tools/exp_stepcost.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 1024
TH, TW = 8, 128
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
    dt = (time.perf_counter() - t0) / iters / SCAN_ITERS
    per_step = dt / K * 1e9
    print(f"{name:44s} {dt * 1e3:8.3f} ms  ({per_step:7.1f} ns/tile)",
          flush=True)


def scanned(fn):
    @jax.jit
    def run(x):
        def body(carry, _):
            out = fn(x + carry)
            leaves = jax.tree_util.tree_leaves(out)
            dep = sum(jnp.sum(l) for l in leaves) * 1e-30
            return dep.reshape(()), leaves[0].ravel()[:1]

        _, outs = lax.scan(body, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def make_planes(n_out, g):
    def kernel(x_ref, *outs):
        v = x_ref[...]
        for j, o in enumerate(outs):
            o[...] = v * (j + 1.0)

    spec = pl.BlockSpec((g, TH, TW), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    def fn(x):
        return pl.pallas_call(
            kernel,
            grid=(K // g,),
            in_specs=[spec],
            out_specs=[spec] * n_out,
            out_shape=[jax.ShapeDtypeStruct((K, TH, TW), jnp.float32)]
            * n_out,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x)

    return fn


def make_packed(n_out, g):
    def kernel(x_ref, o_ref):
        v = x_ref[...]
        for j in range(n_out):
            o_ref[:, j * TH:(j + 1) * TH, :] = v * (j + 1.0)

    in_spec = pl.BlockSpec((g, TH, TW), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, n_out * TH, TW), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def fn(x):
        return pl.pallas_call(
            kernel,
            grid=(K // g,),
            in_specs=[in_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((K, n_out * TH, TW),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x)

    return fn


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((K, TH, TW), np.float32))

    timeit("A: 1 plane, g=1 (1024 steps)", scanned(make_planes(1, 1)), x)
    timeit("B: 19 planes, g=1 (production shape)",
           scanned(make_planes(19, 1)), x)
    timeit("C: 1 packed (152,128) out, g=1", scanned(make_packed(19, 1)), x)
    timeit("D: 19 planes, g=4 (256 steps)", scanned(make_planes(19, 4)), x)
    timeit("E: packed + g=4", scanned(make_packed(19, 4)), x)
    timeit("F: 19 planes, g=8 (128 steps)", scanned(make_planes(19, 8)), x)


if __name__ == "__main__":
    main()
