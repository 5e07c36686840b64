"""Generate golden images for tests/test_goldens.py.

Runs on the CPU backend (the deterministic XLA fallback path — same one CI
uses), renders the pinned configs at small sizes, and writes PNGs under
tests/goldens/. Regenerate ONLY when an intentional rendering change is
made; the diff should be reviewed visually.

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from PIL import Image  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


def main():
    from tests.golden_configs import golden_cases  # noqa: E402

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, render in golden_cases().items():
        img = np.asarray(render())
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        Image.fromarray(img).save(path)
        print(f"wrote {path} {img.shape}")


if __name__ == "__main__":
    main()
