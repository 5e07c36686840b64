"""Image decode + mip pyramids.

Replaces stb_image (resource.cpp runImageLoadTask: stbi_load to RGBA8) with
PIL. The reference creates every texture as RGBA8_UNORM with **no mipmaps**
(mipLevels=1, resource.cpp:191); we keep level 0 byte-identical to that and
additionally build a box-filtered mip pyramid so the sampler can do proper
minification (an intentional quality upgrade; level 0 sampling still matches).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
from PIL import Image


def load_image_rgba8(path: str | os.PathLike) -> np.ndarray:
    """Decode any PNG/JPG to (H, W, 4) uint8, like stbi_load(..., STBI_rgb_alpha).

    16-bit grayscale PNGs (several reference PBR maps) are narrowed to 8 bits
    the way stb_image does: value >> 8.
    """
    im = Image.open(path)
    if im.mode in ("I;16", "I;16B", "I"):
        arr16 = np.asarray(im, dtype=np.uint32)
        gray = (arr16 >> 8).astype(np.uint8)
        rgba = np.dstack([gray, gray, gray, np.full_like(gray, 255)])
        return np.ascontiguousarray(rgba)
    if im.mode != "RGBA":
        im = im.convert("RGBA")
    return np.asarray(im, dtype=np.uint8).copy()


def build_mip_pyramid(level0: np.ndarray, max_levels: int | None = None) -> list[np.ndarray]:
    """2×2 box-filtered mip chain from an (H, W, C) uint8 or float image.

    Stops at 1×1 (or after ``max_levels``). Non-power-of-two edges floor-divide
    like GPU mip chains; odd rows/cols drop the trailing texel.
    """
    levels = [level0]
    cur = level0.astype(np.float32)
    while min(cur.shape[0], cur.shape[1]) > 1:
        if max_levels is not None and len(levels) >= max_levels:
            break
        h, w = (cur.shape[0] // 2) * 2, (cur.shape[1] // 2) * 2
        ds = cur[:h, :w].reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3))
        cur = ds
        if level0.dtype == np.uint8:
            levels.append(np.clip(ds + 0.5, 0, 255).astype(np.uint8))
        else:
            levels.append(ds.astype(level0.dtype))
    return levels


def save_png(path: str | os.PathLike, rgba_or_rgb: np.ndarray) -> None:
    """Write an (H, W, 3|4) uint8 array as PNG (host output path).

    Prefers the native libpng writer (low compression level — the
    swapchain-present analog for the interactive loop); falls back to
    PIL when the native library isn't built."""
    arr = np.asarray(rgba_or_rgb)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    try:
        from bibim_tpu import native

        if arr.ndim == 3 and native.write_png(str(path), arr):
            return
    except Exception:  # noqa: BLE001 - native lib optional
        pass
    Image.fromarray(arr).save(path)
