"""Direct VMEM-bitonic vs lax.sort comparison on the real TPU.

Run: python tools/exp_vmem_sort.py
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
    @jax.jit
    def run(*args):
        def body(carry, _):
            a = tuple(x + (carry * 0).astype(x.dtype) for x in args)
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            dep = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-30
            return dep.astype(jnp.float32).reshape(()), leaves[0].ravel()[:1]

        _, outs = lax.scan(body, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bibim_tpu.ops import sort_pallas as sp

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    for p, nt in [(72804, 2026), (20480, 2026), (262144, 2026),
                  (1048576, 2026)]:
        tile = jnp.asarray(rng.integers(0, nt + 1, p).astype(np.int32))
        tri = jnp.asarray(rng.permutation(p).astype(np.int32))

        def vmem(a, b, nt=nt):
            return sp.sort_pairs(a, b, nt, use_vmem=True)

        def xla(a, b):
            return lax.sort((a, b), num_keys=2, is_stable=False)

        o1 = timeit(f"vmem bitonic sort, n={p}", scanned(vmem), tile, tri)
        o2 = timeit(f"lax.sort 2-key,    n={p}", scanned(xla), tile, tri)
        a = np.asarray(o1[0] if isinstance(o1, (list, tuple)) else o1)
        # correctness spot check on real hardware
        got = jax.jit(lambda a, b, nt=nt: sp.sort_pairs(
            a, b, nt, use_vmem=True))(tile, tri)
        ref = jax.jit(xla)(tile, tri)
        ok = all((np.asarray(g) == np.asarray(r)).all()
                 for g, r in zip(got, ref))
        print(f"  correctness: {'OK' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
