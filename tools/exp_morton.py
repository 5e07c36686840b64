"""Does a Morton(Z-order)-permuted material table gather faster on the
real frame's uv distribution? (Gathers measured 6-11 ns/row depending on
locality; Morton co-locates 2D texel neighborhoods in HBM.)
Run: python tools/exp_morton.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

WIDTH, HEIGHT = 1920, 1080
SCAN = 8


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    print(f"{name:40s} {(time.perf_counter() - t0) / iters / SCAN * 1e3:8.3f} ms",
          flush=True)


def part1by1(x):
    """Interleave 16-bit x with zeros (standard Morton spread)."""
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene

    scene = ShaderBallScene()
    cam = FreeLookCamera(pos=np.zeros(3, np.float32))
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    data = scene.scene_data()

    @jax.jit
    def get_uv(batches):
        psoup = assemble_scene_planar(batches, view, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        rec = fused.build_record_table_planar(setup, psoup)
        px, _, _ = fused.raster_fused_pallas(rec, setup, WIDTH, HEIGHT,
                                             max_candidates=320, span_cap=16)
        return px.uv[0], px.uv[1]

    u, v = get_uv(data.batches)
    h = w = 2048
    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (h * w, 4), -(2 ** 31), 2 ** 31 - 1,
                               jnp.int32)

    def footprint(u, v):
        fx = u.reshape(-1) * w - 0.5
        fy = v.reshape(-1) * h - 0.5
        x0i = jnp.remainder(jnp.floor(fx).astype(jnp.int32), w)
        y0i = jnp.remainder(jnp.floor(fy).astype(jnp.int32), h)
        return x0i, y0i

    def scanned(fn):
        @jax.jit
        def run(table, u, v):
            def body(c, _):
                out = fn(table, u + c * 1e-7, v)
                return jnp.sum(out[:1, :1]) * 1e-30, out

            _, outs = lax.scan(body, jnp.float32(0), None, length=SCAN)
            return outs[-1]

        return run

    def rowmajor(table, u, v):
        x0i, y0i = footprint(u, v)
        return table[y0i * w + x0i].astype(jnp.float32)

    def morton(table, u, v):
        x0i, y0i = footprint(u, v)
        return table[(part1by1(y0i) << 1) | part1by1(x0i)].astype(jnp.float32)

    def tiled64(table, u, v):
        # 64x64 texel tiles: idx = (tile_id << 12) | intra
        x0i, y0i = footprint(u, v)
        tid = (y0i >> 6) * (w >> 6) + (x0i >> 6)
        intra = ((y0i & 63) << 6) | (x0i & 63)
        return table[(tid << 12) | intra].astype(jnp.float32)

    timeit("row-major  (4 i32)", scanned(rowmajor), table, u, v)
    timeit("morton     (4 i32)", scanned(morton), table, u, v)
    timeit("64x64 tiled(4 i32)", scanned(tiled64), table, u, v)


if __name__ == "__main__":
    main()
