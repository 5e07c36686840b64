"""Headline benchmark: 1080p ShaderBall PBR frame on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms/frame", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); the driver-set north star
is < 4 ms/frame (> 500 shaded Mpix/s) at 1080p, so vs_baseline = 4ms / ours
(>1 means beating the target).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT = 1920, 1080
TARGET_MS = 4.0
WARMUP = 3
ITERS = 20


def main() -> None:
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.assets.materials import create_pbr_material_set
    from bibim_tpu.pipeline import (
        FrameParams,
        RenderSettings,
        ViewBlock,
        material_textures_from_set,
        render_frame,
    )
    from bibim_tpu.pipeline.framegraph import make_overlay_resources
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera()
    settings = RenderSettings(width=WIDTH, height=HEIGHT)
    mats = material_textures_from_set(
        create_pbr_material_set(), scene.selected_material
    )
    overlay = make_overlay_resources()
    view_block = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    frame_params = FrameParams(
        enable_tone_mapping=jnp.int32(1), exposure=jnp.float32(1.0)
    )
    data = scene.scene_data()

    def step():
        return render_frame(data, view_block, frame_params, mats, overlay, settings)[
            "image"
        ]

    def sync(img):
        # On tunnel-attached devices block_until_ready may not actually wait;
        # a tiny dependent readback forces real completion.
        return np.asarray(img[:1, :1, :1])

    for _ in range(WARMUP):
        sync(step())

    # Amortize the sync round-trip over a batch of frames.
    samples = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            img = step()
        sync(img)
        samples.append((time.perf_counter() - t0) / ITERS * 1e3)

    ms = float(np.median(samples))
    print(
        json.dumps(
            {
                "metric": "shaderball_pbr_1080p_frame",
                "value": round(ms, 3),
                "unit": "ms/frame",
                "vs_baseline": round(TARGET_MS / ms, 3),
                "mpix_per_s": round(WIDTH * HEIGHT / ms / 1e3, 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
