"""Screen-space triangle-size census for the bench cameras.

If most binned pairs come from sub-(8x16)-px triangles, a fine-tile
raster pass (one 128-lane vector per coverage eval instead of eight)
would cut the kernel's per-candidate cost ~8x on those pairs. This
census says how much of each config's pair list that could cover.

Pure host/CPU math (triangle setup twin). Run:
  JAX_PLATFORMS=cpu python tools/exp_trisize.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def census(name, width, height, scene, cam_pos=None):
    import jax.numpy as jnp

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import ViewBlock
    from bibim_tpu.scene import FreeLookCamera
    from bibim_tpu.scene.culling import cull_scene_instances

    cam = (FreeLookCamera(pos=np.asarray(cam_pos, np.float32))
           if cam_pos is not None else FreeLookCamera())
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, width / height, 0.1, 1000.0)
    data = scene.scene_data()
    data = cull_scene_instances(data, np.asarray(cam.get_view_matrix()),
                                np.asarray(proj))
    psoup = assemble_scene_planar(data.batches, view, proj, None)
    setup = triangle_setup_planar(psoup.clip, width, height)
    valid = np.asarray(setup.valid)
    bb = np.asarray(setup.bbox)  # planar: (4, T)
    x0 = bb[0][valid]
    y0 = bb[1][valid]
    x1 = bb[2][valid]
    y1 = bb[3][valid]
    w = np.maximum(x1 - x0 + 1, 0).astype(np.int64)
    h = np.maximum(y1 - y0 + 1, 0).astype(np.int64)
    # tiles spanned (8x128 grid) — proxy for pair count per triangle
    tx0, tx1 = x0 // 128, x1 // 128
    ty0, ty1 = y0 // 8, y1 // 8
    ntile = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    pairs = ntile.sum()
    print(f"{name}: {valid.sum()} valid tris, {pairs} tile pairs")
    for bw, bh in ((2, 2), (4, 4), (16, 8), (32, 8), (128, 8)):
        m = (w <= bw) & (h <= bh)
        print(f"  bbox<= {bw:3d}x{bh}: tris {m.mean():.3f}  "
              f"pairs {ntile[m].sum() / max(pairs, 1):.3f}")
    one = ntile == 1
    print(f"  single-tile tris {one.mean():.3f}, their pairs "
          f"{ntile[one].sum() / max(pairs, 1):.3f}")


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bibim_tpu.scene import ShaderBallScene

    census("config3 headline 1080p", 1920, 1080, ShaderBallScene())
    census("config4 x64 1080p", 1920, 1080,
           ShaderBallScene(num_instances=64), cam_pos=[8.0, 6.0, -14.0])
    census("config5 4K", 3840, 2160, ShaderBallScene())


if __name__ == "__main__":
    main()
