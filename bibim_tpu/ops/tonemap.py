"""Tone mapping + output encode.

- Exposure map: ``1 − exp(−hdr·exposure)`` when enabled, else passthrough
  (hdr_tone_mapping.frag:9-17). The toggle is a traced value so flipping the
  GUI checkbox does not recompile.
- sRGB OETF: the reference's swapchain is an SRGB format (render.cpp:242-254),
  so the hardware encodes the tonemapped linear values on store; we apply the
  same transfer function before writing PNG/display bytes.
"""

from __future__ import annotations

import jax.numpy as jnp


def tone_map(hdr: jnp.ndarray, enable, exposure) -> jnp.ndarray:
    mapped = 1.0 - jnp.exp(-hdr * exposure)
    enable = jnp.asarray(enable)
    return jnp.where(enable != 0, mapped, hdr)


def srgb_encode(linear: jnp.ndarray) -> jnp.ndarray:
    l = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(
        l <= 0.0031308, l * 12.92, 1.055 * jnp.power(l, 1.0 / 2.4) - 0.055
    )


def to_u8(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
