"""Why does the merged-MRAO gather run ~3.4x slower per slot at 4K?

tools/exp_4k.py measured ~19 ns/slot for 3.28M-slot sampling from the
4.19M-row quad table; the same table serves 0.92M slots at ~5.7 ns at
1080p. This isolates gather rate vs query-stream size and content, with
a FULL-output reduction chained into the scan carry (earlier micro
harnesses sliced outputs, which lets XLA dead-code parts of the work —
numbers from those are untrustworthy).

Run: python tools/exp_gather4k.py
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


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3
    print(f"{name:56s} {dt:9.3f} ms", flush=True)
    return dt


def scan8(body):
    @jax.jit
    def run():
        def step(carry, _):
            return body(carry)

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)

    rows = 4194304
    table = jnp.asarray(
        np.random.default_rng(0).integers(-(1 << 31), 1 << 31,
                                          (rows, 4)).astype(np.int32))

    def dep(carry):
        return jnp.minimum(carry.astype(jnp.int32), 0)

    for n in (262144, 917504, 1048576, 2097152, 3276800, 4194304):
        idx = jnp.asarray(
            (np.random.default_rng(1).integers(0, rows, n)).astype(np.int32))

        def body(carry, idx=idx):
            q = table[idx + dep(carry)]
            s = jnp.sum(q, dtype=jnp.int32)
            return (s & 1).astype(jnp.float32) * 1e-30, s

        ms = timeit(f"random gather n={n/1e6:.2f}M", scan8(body))
        print(f"    {ms * 1e6 / n:.2f} ns/slot", flush=True)

    # coherent stream (sorted indices): does coherence still help at 3.3M?
    for n in (917504, 3276800):
        idx = jnp.asarray(np.sort(
            np.random.default_rng(1).integers(0, rows, n)).astype(np.int32))

        def body(carry, idx=idx):
            q = table[idx + dep(carry)]
            s = jnp.sum(q, dtype=jnp.int32)
            return (s & 1).astype(jnp.float32) * 1e-30, s

        ms = timeit(f"sorted gather n={n/1e6:.2f}M", scan8(body))
        print(f"    {ms * 1e6 / n:.2f} ns/slot", flush=True)

    # split one 3.3M gather into 4 sequential 0.82M gathers
    n = 3276800
    idx = jnp.asarray(
        (np.random.default_rng(1).integers(0, rows, n)).astype(np.int32))

    def body_split(carry):
        parts = []
        for i in range(4):
            q = table[idx[i * (n // 4):(i + 1) * (n // 4)] + dep(carry)]
            parts.append(jnp.sum(q, dtype=jnp.int32))
        s = sum(parts)
        return (s & 1).astype(jnp.float32) * 1e-30, s

    ms = timeit("split 4x0.82M gathers (same 3.3M work)", scan8(body_split))
    print(f"    {ms * 1e6 / n:.2f} ns/slot", flush=True)


if __name__ == "__main__":
    main()
