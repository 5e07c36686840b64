"""Testing utilities: NumPy oracle renderer + golden-image helpers."""

from bibim_tpu.testing.oracle import oracle_rasterize, oracle_shade_pbr

__all__ = ["oracle_rasterize", "oracle_shade_pbr"]
