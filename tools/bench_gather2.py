"""Round 2 gather probes: block-gather formulations of the material table.

bench_gather.py showed gather cost has (a) a per-row issue floor that
shrinks ~2.4x when the table has fewer rows, and (b) a ~40 GB/s bandwidth
ceiling for fat rows. This sweep simulates the REAL material sample
end-to-end under each packing:

  K-block tables: (4M/K, K*32) uint8 — one gather fetches K consecutive
  quad-rows; the pixel's row is selected with dense VPU math (idx & (K-1)).
  Fewer table rows => faster issue; K times the bytes => bandwidth cost.

Both random and screen-coherent index streams are measured (real frames
are partially coherent; the issue rate may differ).

Run: python tools/bench_gather2.py
"""

from __future__ import annotations

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from bibim_tpu.utils.cache import enable_compilation_cache

QUERIES = 1 << 21
ROWS = 1 << 22  # 2048^2 texels
ROW_U8 = 32  # current quad-row: 4 taps x 8 channels u8
SCAN_ITERS = 8


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=5):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} UNSUPPORTED: {str(e).splitlines()[0][:90]}",
              flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters / SCAN_ITERS
    print(f"{name:52s} {dt * 1e3:9.3f} ms  {dt / QUERIES * 1e9:7.3f} ns/px",
          flush=True)


def scanned(fn):
    @jax.jit
    def run(table, idx):
        def body(carry, _):
            out = fn(table, idx ^ (carry & 1))
            return jnp.sum(out[:1, :1]).astype(jnp.int32) & 1, out

        _, outs = lax.scan(body, jnp.int32(0), None, length=SCAN_ITERS)
        return outs[-1]

    return run


def sample_block(k: int, dtype=jnp.uint8, row_u8: int = ROW_U8):
    """Gather (ROWS/k, k*row) table; select the idx%k sub-row densely."""
    width = k * row_u8

    def fn(table, idx):
        blk = table[idx >> (k.bit_length() - 1)]  # (N, k*row) u8
        q = blk.astype(jnp.float32) * (1.0 / 255.0)
        if k == 1:
            sel = q
        else:
            sub = (idx & (k - 1))[:, None]
            q = q.reshape(-1, k, row_u8)
            oh = (
                lax.broadcasted_iota(jnp.int32, (1, k, 1), 1) == sub[:, :, None]
            )
            sel = jnp.sum(jnp.where(oh, q, 0.0), axis=1)
        # bilinear blend of 4 taps x 8 channels (the real follow-up math)
        w = sel[:, :1]
        return (
            sel[:, 0:8] * w
            + sel[:, 8:16] * (1 - w)
            + sel[:, 16:24] * w
            + sel[:, 24:32] * (1 - w)
        )

    return fn


def main():
    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    idx_rand = jax.random.randint(key, (QUERIES,), 0, ROWS, jnp.int32)
    # Coherent stream: screen-row-major walk over a 2048-wide texture at
    # ~1 texel/px with jitter — the ground-plane-like access pattern.
    base = (jnp.arange(QUERIES, dtype=jnp.int32) * 2) % ROWS
    idx_coh = (base + jax.random.randint(key, (QUERIES,), 0, 3)) % ROWS

    for k in (1, 2, 4, 8, 16):
        rows = ROWS // k
        tab = jax.random.randint(
            key, (rows, k * ROW_U8), 0, 255, jnp.int32
        ).astype(jnp.uint8)
        fn = scanned(sample_block(k))
        lg = int(np.log2(rows))
        timeit(f"u8 block k={k:2d} table=2^{lg}x{k * ROW_U8}  random", fn,
               tab, idx_rand)
        timeit(f"u8 block k={k:2d} table=2^{lg}x{k * ROW_U8}  coherent", fn,
               tab, idx_coh)

    # int32-packed variant of k=1 (8 lanes instead of 32)
    tab32 = jax.random.randint(key, (ROWS, 8), -(2 ** 31), 2 ** 31 - 1,
                               jnp.int32)

    def fn_i32(table, idx):
        blk = table[idx]  # (N, 8) i32 = 4 x u8 packed
        b0 = (blk & 0xFF).astype(jnp.float32)
        b1 = ((blk >> 8) & 0xFF).astype(jnp.float32)
        b2 = ((blk >> 16) & 0xFF).astype(jnp.float32)
        b3 = ((blk >> 24) & 0xFF).astype(jnp.float32)
        return (b0 + b1 * 0.5 + b2 * 0.25 + b3 * 0.125) * (1.0 / 255.0)

    timeit("i32-packed k=1 table=2^22x8i32  random", scanned(fn_i32),
           tab32, idx_rand)
    timeit("i32-packed k=1 table=2^22x8i32  coherent", scanned(fn_i32),
           tab32, idx_coh)

    # current formulation baseline: (4M, 32)u8 plain
    tab_cur = jax.random.randint(key, (ROWS, ROW_U8), 0, 255,
                                 jnp.int32).astype(jnp.uint8)
    timeit("current  (2^22x32u8)  random", scanned(sample_block(1)),
           tab_cur, idx_rand)
    timeit("current  (2^22x32u8)  coherent", scanned(sample_block(1)),
           tab_cur, idx_coh)

    # fp8-style half-width: (4M, 16)u8 (would need channel packing)
    tab16 = jax.random.randint(key, (ROWS, 16), 0, 255,
                               jnp.int32).astype(jnp.uint8)

    def fn16(table, idx):
        q = table[idx].astype(jnp.float32) * (1.0 / 255.0)
        return q[:, 0:8] + q[:, 8:16]

    timeit("half-row (2^22x16u8)  random", scanned(fn16), tab16, idx_rand)
    timeit("half-row (2^22x16u8)  coherent", scanned(fn16), tab16, idx_coh)


if __name__ == "__main__":
    main()
