"""Light data model.

Parity: ``Light`` struct (render.h:310-318 / standard_sets.glsl) — pos, type
(0=point, 1=spot, 2=directional), dir, intensity, color, innerCutOff,
outerCutOff — stored struct-of-arrays so the shading kernel's light loop is
pure vector math. Hard cap MAX_NUM_LIGHTS=100 (render.h:320).
"""

from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

MAX_NUM_LIGHTS = 100


class LightType(IntEnum):
    # standard_sets.glsl: 0 = point, 1 = spot, 2 = directional.
    # (The C++ LightType enum in render.h orders Point/Spot/Directional the
    # same way; scene.cpp assigns via that enum.)
    POINT = 0
    SPOT = 1
    DIRECTIONAL = 2


class Lights(NamedTuple):
    """Struct-of-arrays over L lights. All (L, ...) float32 / int32."""

    pos: jnp.ndarray  # (L,3)
    type: jnp.ndarray  # (L,) int32
    dir: jnp.ndarray  # (L,3)
    intensity: jnp.ndarray  # (L,)
    color: jnp.ndarray  # (L,3)
    inner_cutoff: jnp.ndarray  # (L,) radians (compared against a cosine —
    outer_cutoff: jnp.ndarray  # (L,)          reference quirk, brdf.frag:40-42)

    @property
    def num_lights(self) -> int:
        return int(self.pos.shape[0])


def make_lights(entries: list[dict]) -> Lights:
    """Build a Lights SoA from dicts with keys matching the Light struct.

    Missing fields default to zero, exactly like the reference's
    zero-initialized Light structs (scene.cpp:19-36 sets only some fields).
    """
    n = len(entries)

    def col(key, width, default=0.0):
        out = np.zeros((n, width) if width > 1 else (n,), np.float32)
        for i, e in enumerate(entries):
            if key in e:
                out[i] = np.asarray(e[key], np.float32)
        return out

    types = np.asarray(
        [int(e.get("type", LightType.POINT)) for e in entries], np.int32
    )
    return Lights(
        pos=jnp.asarray(col("pos", 3)),
        type=jnp.asarray(types),
        dir=jnp.asarray(col("dir", 3)),
        intensity=jnp.asarray(col("intensity", 1)),
        color=jnp.asarray(col("color", 3)),
        inner_cutoff=jnp.asarray(col("inner_cutoff", 1)),
        outer_cutoff=jnp.asarray(col("outer_cutoff", 1)),
    )
