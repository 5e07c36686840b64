"""In-VMEM bitonic sort for the binning pair list.

``lax.sort`` on TPU runs each bitonic round as an HBM round-trip, so at
binning sizes the cost is dominated by a large FIXED term (~0.7 ms at
20k-131k elements — tools/exp_bin.py: 20.5k sorts in 0.80 ms, 72.8k in
1.14 ms; shrinking the input barely helps). The whole pair list is well
under VMEM (131k × 4 B = 512 KB), so this kernel runs the ENTIRE
compare-exchange network on one resident array: ~N/1024 · 8 vector ops
per stage, no HBM traffic between stages (~0.2 ms at 131k).

Scope: sorts PACKED int32 keys ascending. bin_pairs packs
(tile, triangle) into one non-negative int32 (tile·2^tri_bits + tri)
when the bits fit — pairs are unique, so the packed ascending order is
exactly ``lax.sort((tile, tri), num_keys=2)``'s. Callers fall back to
``lax.sort`` when the key doesn't fit int32 or N exceeds the VMEM cap.

Network layout: the value lives as (R, 128) int32 (row-major element
order). Stages with stride ≥ 128 are leading-axis reshapes
(layout-free); stages with stride < 128 pair lanes via two cyclic lane
rolls + a select (pltpu.roll), so no transposes are ever needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest element count the kernel is USED for: measured on v5e
# (tools/exp_vmem_sort.py) the in-VMEM network wins below ~2^17
# (72.8k: 0.85 vs 1.26 ms) and loses above (262k: 1.12 vs 0.85;
# 1M: 3.5 vs 1.7) — each dynamic-stride stage costs two full-array roll
# copies, so cost grows ~N·log²N while lax.sort's HBM rounds amortize.
MAX_VMEM_SORT = 1 << 17
_LANES = 128
_PAD_KEY = (1 << 31) - 1  # sorts after every real key (keys are < 2^30)


def _bitonic_kernel(x_ref, out_ref, *, n_log2):
    """Whole bitonic network as two nested fori_loops with DYNAMIC
    strides (pltpu.roll takes a traced shift; direction masks are shifts
    of a static index grid) — a fully unrolled network at 131k+ elements
    has ~170 stages and OOM'd the AOT compiler.

    Stage (k_exp, j_exp): compare-exchange partner(i) = i XOR 2^j_exp,
    ascending iff bit k_exp of i is 0. The partner value arrives via two
    cyclic rolls (one per XOR direction) along lanes (j < 128) or
    sublanes (j ≥ 128) and a lane/row-parity select."""
    x = x_ref[...]
    r, lanes = x.shape
    i_grid = (
        lax.broadcasted_iota(jnp.int32, (r, lanes), 0) * lanes
        + lax.broadcasted_iota(jnp.int32, (r, lanes), 1)
    )

    def exchange(x, k_exp, j, fwd, bwd):
        is_lo = (i_grid & j) == 0
        partner = jnp.where(is_lo, fwd, bwd)
        asc = ((i_grid >> k_exp) & 1) == 0
        mn = jnp.minimum(x, partner)
        mx = jnp.maximum(x, partner)
        # The lo slot of an ascending pair keeps the min.
        return jnp.where(asc == is_lo, mn, mx)

    def outer(k_exp, x):
        def sub_body(i, x):  # j_exp = k_exp-1-i ≥ 7 (sublane strides)
            j_sub = jnp.int32(1) << (k_exp - 8 - i)
            fwd = pltpu.roll(x, r - j_sub, 0)
            bwd = pltpu.roll(x, j_sub, 0)
            return exchange(x, k_exp, j_sub * lanes, fwd, bwd)

        x = lax.fori_loop(0, jnp.maximum(k_exp - 7, 0), sub_body, x)

        def lane_body(i, x):  # j_exp from min(k_exp-1, 6) down to 0
            j = jnp.int32(1) << (jnp.minimum(k_exp - 1, 6) - i)
            fwd = pltpu.roll(x, lanes - j, 1)
            bwd = pltpu.roll(x, j, 1)
            return exchange(x, k_exp, j, fwd, bwd)

        return lax.fori_loop(0, jnp.minimum(k_exp, 7), lane_body, x)

    out_ref[...] = lax.fori_loop(1, n_log2 + 1, outer, x)


def sort_keys_vmem(keys: jnp.ndarray, interpret: bool = False):
    """Ascending sort of (P,) non-negative int32 keys, entirely in VMEM.

    P is padded to a power of two ≥ 1024 with sentinel keys that sort to
    the tail; the result is sliced back to P."""
    (p,) = keys.shape
    n = max(1024, 1 << (p - 1).bit_length())
    assert n <= MAX_VMEM_SORT, "caller must fall back to lax.sort"
    if n != p:
        keys = jnp.pad(keys, (0, n - p), constant_values=_PAD_KEY)
    r = n // _LANES
    x = keys.reshape(r, _LANES)
    out = pl.pallas_call(
        functools.partial(_bitonic_kernel, n_log2=n.bit_length() - 1),
        grid=(1,),
        in_specs=[pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, _LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x)
    return out.reshape(n)[:p]


def zorder_bits(nt: int, t: int, max_bits: int = 16) -> int:
    """Depth-bucket bits available for the early-z pair sort key
    (tile | inv_bucket | tri packed into 31 bits). 0 = doesn't fit
    (callers fall back to a multi-operand lax.sort with the full
    ``max_bits`` bucket)."""
    tile_bits = int(nt).bit_length()
    tri_bits = max(int(t - 1).bit_length(), 1)
    return max(0, min(max_bits, 31 - tile_bits - tri_bits))


def zbucket(zub: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Monotone depth bucket of a [0, 1] f32 depth bound: the f32 bit
    pattern is a piecewise-linear log2, so ``bits >> (30 − b)`` is an
    exponent ladder with 2^(b−8) steps per octave — resolution where the
    near field (reversed-Z: large z) lives. The kernel's remaining-work
    bound reconstructs the bucket's upper value with the same shift."""
    zb = lax.bitcast_convert_type(jnp.maximum(zub, 0.0), jnp.int32)
    return zb >> (30 - bits)


def sort_pairs_z(flat_tile: jnp.ndarray, zub_of_pair: jnp.ndarray,
                 tri_of_pair: jnp.ndarray, nt: int, t_count: int,
                 bits: int, interpret: bool = False):
    """Early-z pair sort: ascending (tile, DESCENDING depth bucket,
    tri). Within a bucket, draw order (tri ascending) is preserved —
    bit-equal masked-z ties between same-bucket candidates therefore
    keep their draw-order scan position, and the kernel's explicit
    draw-order tie carry covers cross-bucket ties, so results stay exact
    under any bucket resolution.

    ``bits`` > 0: single packed int32 key (VMEM kernel when it fits,
    1-key lax.sort otherwise). ``bits`` == 0: 3-operand unstable
    lax.sort with a full 16-bit bucket (big instanced scenes — already
    past the VMEM cap anyway)."""
    p = flat_tile.shape[0]
    if bits <= 0:
        inv = (1 << 16) - 1 - zbucket(zub_of_pair, 16)
        sorted_tile, _, sorted_tri = lax.sort(
            (flat_tile, inv, tri_of_pair), num_keys=3, is_stable=False)
        return sorted_tile, sorted_tri
    tri_bits = max(int(t_count - 1).bit_length(), 1)
    inv = (1 << bits) - 1 - zbucket(zub_of_pair, bits)
    packed = (((flat_tile << bits) | inv) << tri_bits) | tri_of_pair
    use_vmem = (
        jax.default_backend() == "tpu"
        and max(1024, 1 << (p - 1).bit_length()) <= MAX_VMEM_SORT
        and p >= 4096
    )
    if use_vmem:
        sorted_packed = sort_keys_vmem(packed, interpret=interpret)
    else:
        sorted_packed = lax.sort(packed, is_stable=False)
    return (sorted_packed >> (bits + tri_bits),
            sorted_packed & ((1 << tri_bits) - 1))


def pack_bits(nt: int, t: int) -> int | None:
    """Bits to pack (tile ∈ [0, nt], tri ∈ [0, t)) into a non-negative
    int32 key, or None if it doesn't fit. 31 bits are usable: real keys
    may only reach the padding sentinel when tile == nt (dead slots that
    sort to the tail beyond every searchsorted boundary anyway)."""
    tile_bits = int(nt).bit_length()  # sentinel value nt must fit
    tri_bits = max(int(t - 1).bit_length(), 1)
    if tile_bits + tri_bits > 31:
        return None
    return tri_bits


def sort_pairs(flat_tile: jnp.ndarray, tri_of_pair: jnp.ndarray, nt: int,
               t_count: int | None = None, use_vmem: bool | None = None,
               interpret: bool = False):
    """Drop-in for ``lax.sort((flat_tile, tri_of_pair), num_keys=2,
    is_stable=False)`` over unique (tile, tri) pairs.

    On TPU, when the packed key fits int32 and the list fits VMEM, runs
    the single-block bitonic kernel (the XLA sort's per-round HBM
    latency dominates at binning sizes); otherwise falls back to
    ``lax.sort``. Unique pairs make both orders identical."""
    p = flat_tile.shape[0]
    # Triangle ids are < T ≤ P (every triangle expands ≥ 1 pair slot), so
    # P bounds the tri field when the exact triangle count isn't given.
    tri_bits = pack_bits(nt, t_count if t_count is not None else p)
    if use_vmem is None:
        use_vmem = (
            jax.default_backend() == "tpu"
            and tri_bits is not None
            and max(1024, 1 << (p - 1).bit_length()) <= MAX_VMEM_SORT
            and p >= 4096  # tiny lists aren't worth a kernel launch
        )
    if not use_vmem or tri_bits is None:
        if tri_bits is not None and jax.default_backend() == "tpu":
            # Past the VMEM cap but still int32-packable (config 4's
            # 315k slots): a 1-key packed lax.sort is ~0.2 ms faster
            # than the 2-key unstable sort (tools/exp_bin64.py:
            # 0.95 vs 1.18 standalone).
            packed = (flat_tile << tri_bits) | tri_of_pair
            sorted_packed = lax.sort(packed, is_stable=False)
            return (sorted_packed >> tri_bits,
                    sorted_packed & ((1 << tri_bits) - 1))
        return lax.sort((flat_tile, tri_of_pair), num_keys=2,
                        is_stable=False)
    packed = (flat_tile << tri_bits) | tri_of_pair
    sorted_packed = sort_keys_vmem(packed, interpret=interpret)
    return sorted_packed >> tri_bits, sorted_packed & ((1 << tri_bits) - 1)
