"""PCF gather-layout microbench (VERDICT r4, 4K pcf_visibility lever).

The shadow map packs one 4-f32 row per texel: 2^20 rows at size 1024 —
past the ~2^19 gather plateau. A BLOCK layout (4x4 texel blocks, 5x5
clamp-correct neighborhood, 25 f32 padded to 32 lanes = 128 B rows)
has 2^16 rows at the same total bytes. This measures both layouts'
gather + PCF math at the real 4K query volume, bit-exactness included.

Run: python tools/exp_pcfblock.py
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
SIZE = 1024
QUERIES = 1 << 20  # ~4K shadow-footprint slot volume


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:52s} {(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:9.3f} ms",
          flush=True)
    return out


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    print(f"device: {jax.devices()[0]}  size={SIZE}  queries={QUERIES}",
          flush=True)
    rng = np.random.default_rng(3)
    depth = rng.uniform(0.2, 1.0, (SIZE, SIZE)).astype(np.float32)

    # Current layout: (S*S, 4) quad rows.
    d = depth
    d01 = np.concatenate([d[:, 1:], d[:, -1:]], axis=1)
    d10 = np.concatenate([d[1:], d[-1:]], axis=0)
    d11 = np.concatenate([d10[:, 1:], d10[:, -1:]], axis=1)
    quads = jnp.asarray(
        np.stack([d, d01, d10, d11], -1).reshape(SIZE * SIZE, 4))

    # Block layout: B=4, 5x5 clamp-correct neighborhoods, padded 32.
    B, S = 4, 5
    nb = SIZE // B
    ay = (np.arange(nb) * B)[:, None]
    ax = (np.arange(nb) * B)[None, :]
    taps = [depth[np.clip(ay + j, 0, SIZE - 1)[:, :, None].repeat(nb, 2)[:, :, 0],
                  np.clip(ax + i, 0, SIZE - 1)]
            for j in range(S) for i in range(S)]
    blocks_np = np.stack(taps, -1).reshape(nb * nb, 25)
    blocks_np = np.pad(blocks_np, ((0, 0), (0, 7)))
    blocks = jnp.asarray(blocks_np)
    print(f"quads {quads.shape} {quads.dtype}; blocks {blocks.shape}",
          flush=True)

    fx = rng.uniform(0.0, SIZE - 1.001, QUERIES).astype(np.float32)
    fy = rng.uniform(0.0, SIZE - 1.001, QUERIES).astype(np.float32)
    ref = jnp.asarray(rng.uniform(0.3, 0.9, QUERIES).astype(np.float32))
    fxj, fyj = jnp.asarray(fx), jnp.asarray(fy)

    def pcf_quads(fx, fy, ref):
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, SIZE - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, SIZE - 1)
        q = quads[y0i * SIZE + x0i]

        def lit(tap):
            return (q[:, tap] <= ref).astype(jnp.float32)

        top = lit(0) * (1.0 - tx) + lit(1) * tx
        bot = lit(2) * (1.0 - tx) + lit(3) * tx
        return top * (1.0 - ty) + bot * ty

    def pcf_blocks(fx, fy, ref):
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, SIZE - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, SIZE - 1)
        lx = x0i % B
        ly = y0i % B
        q = blocks[(y0i // B) * nb + (x0i // B)]  # (N, 32)
        qt = q.T  # (32, N) planar

        # Exact one-hot tap selects (adding exact 0.0s), then the
        # oracle's nested blend — bit-identical to pcf_quads.
        def tap(j, i):
            acc = None
            for jj in range(S):
                wj = (ly + j == jj)
                for ii in range(S):
                    w = (wj & (lx + i == ii)).astype(jnp.float32)
                    t = qt[jj * S + ii] * w
                    acc = t if acc is None else acc + t
            return acc

        def lit(j, i):
            return (tap(j, i) <= ref).astype(jnp.float32)

        top = lit(0, 0) * (1.0 - tx) + lit(0, 1) * tx
        bot = lit(1, 0) * (1.0 - tx) + lit(1, 1) * tx
        return top * (1.0 - ty) + bot * ty

    # Bit-exactness first (compiled, on-device).
    va = jax.jit(pcf_quads)(fxj, fyj, ref)
    vb = jax.jit(pcf_blocks)(fxj, fyj, ref)
    eq = bool(jnp.all(va == vb))
    print(f"bit-exact: {eq}", flush=True)
    assert eq

    def scanned(fn):
        @jax.jit
        def run(fx, fy, ref):
            def body(carry, _):
                v = fn(fx + carry, fy, ref)
                dep = jnp.sum(v) * 1e-30
                return dep.astype(jnp.float32).reshape(()), v[:1]

            _, outs = lax.scan(body, jnp.float32(0), None,
                               length=SCAN_ITERS)
            return outs

        return run

    timeit("pcf quad rows   (2^20 x 16 B)", scanned(pcf_quads),
           fxj, fyj, ref)
    timeit("pcf block rows  (2^16 x 128 B)", scanned(pcf_blocks),
           fxj, fyj, ref)


if __name__ == "__main__":
    main()
