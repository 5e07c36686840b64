"""Exact f32 → f16 (RNE) → f32 round trip in integer/VPU ops.

The deferred pipeline emulates the reference's RGBA16F attachments
(/root/reference/src/render.h:93-94) by round-tripping G-buffer planes
through fp16 (`framegraph._q16`). Mosaic has no f16 converts, so fusing
that quantization into a Pallas kernel needs the rounding implemented in
integer math. This is the standard float→half algorithm (mantissa RNE
via add-and-mask; subnormals via a magic-constant FP add) expressed in
jnp so it runs identically under XLA, Mosaic, and Pallas interpret mode.

Bit-exact vs ``x.astype(float16).astype(float32)`` for every finite f32
including subnormal halves and overflow-to-inf (pinned by
tests/test_f16.py over randomized + adversarial boundary inputs). NaNs
canonicalize to the quiet NaN 0x7FC00000 (sign preserved).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _bitcast(x, dtype):
    return lax.bitcast_convert_type(x, dtype)

# Plain Python ints: jnp folds them as literals, so a Pallas kernel using
# f16_round_trip does not capture traced constants.
_SIGN = -0x80000000
_MAG = 0x7FFFFFFF
_MIN_NORM16 = 0x38800000  # f32 bits of 2^-14
_INF32 = 0x7F800000
_QNAN32 = 0x7FC00000
# Values >= 2^16 after rounding overflow f16 → inf (65520 ties to even
# = inf; the add-and-mask rounding carries 65520.. into this range).
_OVER = 0x47800000


def f16_round_trip(x: jnp.ndarray) -> jnp.ndarray:
    """f32 array → the f32 value of its nearest (RNE) f16."""
    bits = _bitcast(x, jnp.int32)
    sign = bits & _SIGN
    mag = bits & _MAG

    # Normal halves: round the 23-bit mantissa to 10 bits (RNE); the add
    # carries into the exponent correctly at binade boundaries.
    rounded = (mag + 0xFFF + ((mag >> 13) & 1)) & ~0x1FFF

    # Subnormal halves (|x| < 2^-14): quantize to multiples of 2^-24 via
    # a magic add — ulp(0.75) is exactly 2^-24 and 0 <= |x| < 2^-14 keeps
    # the sum's exponent fixed, so the FP add performs the RNE rounding
    # and the subtraction is exact (Sterbenz).
    ax = _bitcast(mag, jnp.float32)
    sub = (ax + 0.75) - 0.75
    sub_bits = _bitcast(sub, jnp.int32)

    out_mag = jnp.where(mag < _MIN_NORM16, sub_bits, rounded)
    out_mag = jnp.where(
        (mag < _MIN_NORM16) | (rounded < _OVER), out_mag, _INF32
    )
    out_mag = jnp.where(mag > _INF32, _QNAN32, out_mag)
    return _bitcast(sign | out_mag, jnp.float32)
