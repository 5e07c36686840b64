"""Golden-image regression tests (SURVEY §4 strategy): full frames on the
pinned configs must match the committed PNGs within a tight tolerance.

Tolerance exists for cross-platform fp noise only (different XLA fusions may
round differently); any visible rendering change trips these. Regenerate
deliberately with tools/make_goldens.py and review the image diff."""

import os

import numpy as np
import pytest
from PIL import Image

from tests.golden_configs import golden_cases

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

_CASES = golden_cases()


@pytest.mark.parametrize("name", sorted(_CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.fail(f"golden missing: {path} — run tools/make_goldens.py")
    want = np.asarray(Image.open(path)).astype(np.int32)
    got = np.asarray(_CASES[name]()).astype(np.int32)
    assert got.shape == want.shape
    diff = np.abs(got - want)
    # ≤2 LSB anywhere, and at most 0.1% of pixels differ at all.
    assert diff.max() <= 2, f"max LSB diff {diff.max()}"
    frac = (diff > 0).any(axis=-1).mean()
    assert frac <= 1e-3, f"{frac:.2%} pixels differ"
