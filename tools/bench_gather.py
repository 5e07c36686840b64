"""Microbenchmarks for row-gather strategies on the real TPU.

The fused frame's one remaining pixel-rate cost is the material-sample
gather (~8 ns/row measured via XLA gather => ~16 ms at 1080p). This
harness probes every alternative the hardware offers so the sampling
design is grounded in measurements, not folklore:

  * XLA gather vs table size (does HBM vs VMEM residency matter?)
  * XLA gather vs row width (is the cost per row or per byte?)
  * Pallas in-kernel dynamic-slice loop from a VMEM-resident table
  * Pallas per-row DMA gather (descriptor issue rate)
  * one-hot MXU select (the known-fast small-table path), for scale

Run: python tools/bench_gather.py [which ...]
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

QUERIES = 1 << 21  # ~2M, one 1080p frame's pixel count
SCAN_ITERS = 8  # amortize the ~2.5 ms tunnel dispatch


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=5, rows=QUERIES):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:  # noqa: BLE001 - report unsupported paths
        msg = str(e).split("\n")[0][:110]
        print(f"{name:46s} UNSUPPORTED: {msg}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters / SCAN_ITERS
    print(
        f"{name:46s} {dt * 1e3:9.3f} ms   {dt / rows * 1e9:7.3f} ns/row",
        flush=True,
    )


def scanned(gather_one):
    """Run gather SCAN_ITERS times inside one jit with a data dependency so
    XLA cannot hoist or dedupe; dispatch overhead amortizes away."""

    @jax.jit
    def run(table, idx):
        def body(carry, _):
            # xor with a tiny carry-dependent value keeps indices live.
            out = gather_one(table, idx ^ (carry & 1))
            return jnp.sum(out[:1]).astype(jnp.int32) & 1, out

        carry, outs = lax.scan(body, jnp.int32(0), None, length=SCAN_ITERS)
        return outs[-1]

    return run


# --- XLA gather variants ----------------------------------------------------


def xla_take(table, idx):
    return jnp.take(table, idx, axis=0)


# --- Pallas: dynamic-slice loop over a VMEM table ---------------------------


def pallas_vmem_loop(table_rows, row_w, queries):
    """Gather queries rows from a VMEM-resident table with an in-kernel
    fori loop of per-row dynamic slices (8 rows per iteration to fill
    sublanes)."""

    def kernel(idx_ref, tab_ref, out_ref):
        def body(i, _):
            def one(j):
                r = idx_ref[0, i * 8 + j]
                out_ref[pl.ds(i * 8 + j, 1), :] = tab_ref[pl.ds(r, 1), :]

            for j in range(8):
                one(j)
            return 0

        lax.fori_loop(0, queries // 8, body, 0)

    @jax.jit
    def run(table, idx):
        def body(carry, _):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((queries, row_w), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx ^ (carry & 1), table)
            return jnp.sum(out[:1, :1]).astype(jnp.int32) & 1, out

        _, outs = lax.scan(body, jnp.int32(0), None, length=SCAN_ITERS)
        return outs[-1]

    return run


# --- Pallas: jnp.take inside the kernel --------------------------------------


def pallas_take(table_rows, row_w, queries):
    def kernel(idx_ref, tab_ref, out_ref):
        out_ref[:, :] = jnp.take(tab_ref[:, :], idx_ref[:, 0], axis=0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((queries, row_w), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx[:, None], table)

    return run


def pallas_lane_gather(queries):
    """Per-lane gather: out[s, l] = table[idx[s, l], l] via
    jnp.take_along_axis on the sublane dim of a (R, 128) VMEM table."""
    rows = 512

    def kernel(idx_ref, tab_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(
            tab_ref[:, :], idx_ref[: queries // 128, :], axis=0
        )

    @jax.jit
    def run(table, idx):
        idx2 = (idx % rows).reshape(-1, 128)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((queries // 128, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx2, table)

    return run


# --- Pallas: per-row DMA gather from HBM -------------------------------------


def pallas_dma_gather(row_w, queries, outstanding=16):
    def kernel(idx_ref, tab_ref, out_ref, scratch, sems):
        n = queries

        def dma(i, slot):
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(idx_ref[0, i], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        for i in range(outstanding):
            dma(i, i).start()

        def body(i, _):
            slot = lax.rem(i, outstanding)
            dma(i, slot).wait()
            out_ref[pl.ds(i, 1), :] = scratch[pl.ds(slot, 1), :]

            @pl.when(i + outstanding < n)
            def _():
                dma(i + outstanding, slot).start()

            return 0

        lax.fori_loop(0, n, body, 0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((queries, row_w), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((outstanding, row_w), jnp.float32),
                pltpu.SemaphoreType.DMA((outstanding,)),
            ],
        )(idx[None, :], table)

    return run


def main():
    enable_compilation_cache()
    which = set(sys.argv[1:])
    dev = jax.devices()[0]
    print(f"device: {dev}")
    key = jax.random.PRNGKey(0)

    def pick(name):
        return not which or any(w in name for w in which)

    # 1. XLA gather vs table size (row width 4 f32 = 16 B)
    for rows_log2 in (10, 13, 16, 19, 22):
        rows = 1 << rows_log2
        name = f"xla_take  table=2^{rows_log2}x4f32"
        if not pick(name):
            continue
        table = jax.random.normal(key, (rows, 4), jnp.float32)
        idx = jax.random.randint(key, (QUERIES,), 0, rows, jnp.int32)
        timeit(name, scanned(xla_take), table, idx)

    # 2. XLA gather vs row width (table 2^22 rows)
    for w in (1, 8, 24, 64, 128):
        name = f"xla_take  rowwidth={w}f32 table=2^22"
        if not pick(name):
            continue
        table = jax.random.normal(key, (1 << 22, w), jnp.float32)
        idx = jax.random.randint(key, (QUERIES,), 0, 1 << 22, jnp.int32)
        timeit(name, scanned(xla_take), table, idx)

    # 2b. fewer queries (does cost scale with queries?)
    for qlog in (18, 19, 20):
        q = 1 << qlog
        name = f"xla_take  queries=2^{qlog} table=2^22x4"
        if not pick(name):
            continue
        table = jax.random.normal(key, (1 << 22, 4), jnp.float32)
        idx = jax.random.randint(key, (q,), 0, 1 << 22, jnp.int32)
        timeit(name, scanned(xla_take), table, idx, rows=q)

    # 3. sorted indices hint
    name = "xla_take  sorted-idx table=2^22x4"
    if pick(name):
        table = jax.random.normal(key, (1 << 22, 4), jnp.float32)
        idx = jnp.sort(
            jax.random.randint(key, (QUERIES,), 0, 1 << 22, jnp.int32)
        )
        timeit(name, scanned(xla_take), table, idx)

    # 4. Pallas VMEM dynamic-slice loop (table must fit VMEM)
    name = "pallas_vmem_loop table=2^16x8f32"
    if pick(name):
        q = 1 << 16  # smaller query count; extrapolate per-row
        table = jax.random.normal(key, (1 << 16, 8), jnp.float32)
        idx = jax.random.randint(key, (q,), 0, 1 << 16, jnp.int32)
        timeit(name, pallas_vmem_loop(1 << 16, 8, q), table, idx, rows=q)

    # 5. Pallas jnp.take in kernel
    name = "pallas_take table=2^13x8f32"
    if pick(name):
        q = 1 << 16
        table = jax.random.normal(key, (1 << 13, 8), jnp.float32)
        idx = jax.random.randint(key, (q,), 0, 1 << 13, jnp.int32)
        timeit(
            name,
            lambda t, i: scanned(
                lambda tt, ii: pallas_take(1 << 13, 8, q)(tt, ii)
            )(t, i),
            table,
            idx,
            rows=q,
        )

    # 5b. Pallas per-lane take_along_axis
    name = "pallas_lane_gather table=512x128"
    if pick(name):
        q = 1 << 20
        table = jax.random.normal(key, (512, 128), jnp.float32)
        idx = jax.random.randint(key, (q,), 0, 512, jnp.int32)
        timeit(
            name,
            lambda t, i: scanned(
                lambda tt, ii: pallas_lane_gather(q)(tt, ii % (1 << 20))
            )(t, i),
            table,
            idx,
            rows=q,
        )

    # 6. Pallas DMA-gather (issue-rate probe; small query count)
    name = "pallas_dma_gather rows=2^14x128f32"
    if pick(name):
        q = 1 << 14
        table = jax.random.normal(key, (1 << 22, 128), jnp.float32)
        idx = jax.random.randint(key, (q,), 0, 1 << 22, jnp.int32)
        run = pallas_dma_gather(128, q)

        @jax.jit
        def rep(t, i):
            def body(c, _):
                out = run(t, i ^ (c & 1))
                return jnp.sum(out[:1, :1]).astype(jnp.int32) & 1, out

            _, outs = lax.scan(body, jnp.int32(0), None, length=SCAN_ITERS)
            return outs[-1]

        timeit(name, rep, table, idx, rows=q)


if __name__ == "__main__":
    main()
