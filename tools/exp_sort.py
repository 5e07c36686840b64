"""Sort-cost probes for pair binning: 2-operand (tile, tri) lax.sort vs
single-operand packed (tile<<b | tri) sort. Run: python tools/exp_sort.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bibim_tpu.utils.cache import enable_compilation_cache

SCAN = 4


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / iters / SCAN * 1e3:8.2f} ms",
          flush=True)


def main():
    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    for n_log in (18, 20, 22, 23):
        n = 1 << n_log
        tile = jax.random.randint(key, (n,), 0, 2025, jnp.int32)
        tri = jax.random.randint(key, (n,), 0, 1 << 20, jnp.int32)

        @jax.jit
        def two_op(tile, tri):
            def body(c, _):
                st, sr = lax.sort((tile ^ (c & 1), tri), num_keys=1,
                                  is_stable=True)
                return jnp.sum(st[:1]) & 1, (st, sr)

            _, outs = lax.scan(body, jnp.int32(0), None, length=SCAN)
            return outs

        @jax.jit
        def packed(tile, tri):
            def body(c, _):
                k = ((tile ^ (c & 1)) << 20) | tri
                s = lax.sort(k)
                return jnp.sum(s[:1]) & 1, (s >> 20, s & 0xFFFFF)

            _, outs = lax.scan(body, jnp.int32(0), None, length=SCAN)
            return outs

        @jax.jit
        def packed_unstable2(tile, tri):
            def body(c, _):
                st, sr = lax.sort((tile ^ (c & 1), tri), num_keys=2,
                                  is_stable=False)
                return jnp.sum(st[:1]) & 1, (st, sr)

            _, outs = lax.scan(body, jnp.int32(0), None, length=SCAN)
            return outs

        timeit(f"2-op stable sort   n=2^{n_log}", two_op, tile, tri)
        timeit(f"packed i32 sort    n=2^{n_log}", packed, tile, tri)
        timeit(f"2-key unstable     n=2^{n_log}", packed_unstable2, tile, tri)


if __name__ == "__main__":
    main()
