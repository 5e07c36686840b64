"""Block-table row dtype probe: u8 lanes vs int32 lanes (round 4).

build_quad_tables packs big QuadTable rows as int32 lanes (~7% faster
gather, narrower lane footprint); the production BlockTable kept u8
(128 one-byte lanes per row). Measures the gather alone at production
row count/volume, both dtypes, plus the unpack cost.

Run: python tools/exp_blocki32.py
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
ROWS = 1 << 18  # 2048^2 / 16 block rows
QUERIES = 852 * 1024  # compacted headline slot volume


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:9.3f} ms",
          flush=True)


def scanned(fn):
    @jax.jit
    def run(idx):
        def body(carry, _):
            out = fn(jnp.abs(idx + carry) % ROWS)
            dep = jnp.sum(out.astype(jnp.float32)) * 1e-30
            return dep.astype(jnp.int32).reshape(()), out.ravel()[:1]

        _, outs = lax.scan(body, jnp.int32(0), None, length=SCAN_ITERS)
        return outs

    return run


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]} rows={ROWS} queries={QUERIES}",
          flush=True)
    rng = np.random.default_rng(9)
    tab8 = jnp.asarray(rng.integers(0, 256, (ROWS, 128), np.uint8))
    tab32 = jnp.asarray(np.ascontiguousarray(
        np.asarray(tab8)).view(np.int32))
    # Coherent-ish index stream (real uv streams are tile-local).
    idx = jnp.asarray(np.sort(
        rng.integers(0, ROWS, QUERIES)).astype(np.int32))

    timeit("gather u8   (N, 128) rows", scanned(lambda i: tab8[i]), idx)
    timeit("gather i32  (N, 32) rows", scanned(lambda i: tab32[i]), idx)

    def gather_unpack(i):
        q = tab32[i]  # (N, 32) i32
        b = [(q >> (8 * k)) & 0xFF for k in range(4)]
        return jnp.stack(b, -1).reshape(q.shape[0], 128).astype(jnp.uint8)

    timeit("gather i32 + byte unpack to (N, 128)",
           scanned(gather_unpack), idx)


if __name__ == "__main__":
    main()
