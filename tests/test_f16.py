"""f16_round_trip must be bit-exact vs astype(float16).astype(float32)."""

import jax.numpy as jnp
import numpy as np

from bibim_tpu.ops.f16 import f16_round_trip


def _oracle(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16).astype(np.float32)


def _check(x: np.ndarray):
    want = _oracle(x)
    got = np.asarray(f16_round_trip(jnp.asarray(x)))
    mism = want != got
    # NaNs compare unequal to themselves; treat NaN==NaN as match.
    mism &= ~(np.isnan(want) & np.isnan(got))
    assert not mism.any(), (
        f"{mism.sum()} mismatches, e.g. {x[mism][:5]} -> "
        f"{got[mism][:5]} want {want[mism][:5]}"
    )


class TestF16RoundTrip:
    def test_random_full_range(self):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2**32, size=1 << 20, dtype=np.uint32)
        x = bits.view(np.float32)
        x = np.where(np.isfinite(x), x, 0.0).astype(np.float32)
        _check(x)

    def test_random_unit_range(self):
        rng = np.random.default_rng(1)
        _check(rng.uniform(-2, 2, 1 << 18).astype(np.float32))

    def test_boundaries(self):
        cases = np.array(
            [
                0.0, -0.0, 1.0, -1.0,
                65504.0, 65519.996, 65520.0, 65521.0, 1e6, -1e6,
                2.0**-14, np.nextafter(np.float32(2.0**-14), 0.0),
                2.0**-24, 2.0**-25, np.nextafter(np.float32(2.0**-25), 1.0),
                2.0**-25 * 3, 1e-40, -1e-40, 5e-8,
                np.inf, -np.inf,
                # exact rounding ties around 10-bit mantissas
                1.0 + 2.0**-11, 1.0 + 2.0**-11 + 2.0**-12,
                1.0 + 3 * 2.0**-11,
            ],
            dtype=np.float32,
        )
        _check(cases)

    def test_ties_to_even_dense(self):
        # Every value representable with 12 mantissa bits in [1, 2): the
        # RNE ties land exactly on the half-ulp grid.
        m = np.arange(1 << 12, dtype=np.uint32) << 11
        bits = (np.uint32(0x3F800000) | m).astype(np.uint32)
        _check(bits.view(np.float32))

    def test_subnormal_dense(self):
        # All multiples of 2^-26 below 2^-14 exercise the magic-add path.
        x = (np.arange(1 << 12, dtype=np.float64) * 2.0**-26).astype(
            np.float32
        )
        _check(x)
        _check(-x)

    def test_nan_is_nan(self):
        out = np.asarray(f16_round_trip(jnp.asarray([np.nan], jnp.float32)))
        assert np.isnan(out).all()
