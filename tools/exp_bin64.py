"""Internal split of config-4's 3.08 ms bin_pairs stage.

bin_pairs at x64 sorts 315k slots (lax.sort fallback past the 2^17
in-VMEM cap) and runs TWO lax.top_k compactions over the 156k triangle
axis (mid-class ids, overflow ids). This measures each term standalone
(sustained scan) to pick the lever.

Run: python tools/exp_bin64.py [n_instances]
"""

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
SCAN_ITERS = 8


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(name, fn, iters=4):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    print(f"{name:52s} "
          f"{(time.perf_counter() - t0) / iters / SCAN_ITERS * 1e3:8.2f} ms",
          flush=True)
    return out


def scan8(body):
    @jax.jit
    def run():
        def step(carry, _):
            return body(carry)

        _, outs = lax.scan(step, jnp.float32(0), None, length=SCAN_ITERS)
        return outs

    return run


def dep_f(x):
    return (jnp.sum(x.astype(jnp.float32)) * 1e-30).astype(jnp.float32)


def main():
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    print(f"device: {jax.devices()[0]}, instances: {n_inst}", flush=True)
    scene = ShaderBallScene(num_instances=n_inst)
    cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    view = jnp.asarray(cam.get_view_matrix())
    proj = m3.perspective(60.0, WIDTH / HEIGHT, 0.1, 1000.0)
    vb = ViewBlock(view=view, proj=proj, view_pos=jnp.asarray(cam.pos),
                   enable_normal_map=jnp.int32(0))
    data = scene.scene_data()
    data = cull_scene_instances(data, np.asarray(view), np.asarray(proj))
    s, _ = autotune_settings(
        data, vb, RenderSettings(width=WIDTH, height=HEIGHT,
                                 outputs="image"),
        margin=1.05,
    )

    def geom(view_m):
        psoup = assemble_scene_planar(data.batches, view_m, proj, None)
        setup = triangle_setup_planar(psoup.clip, WIDTH, HEIGHT)
        return setup

    setup = jax.jit(geom)(view)
    bx0, by0, bx1, by1 = setup.bbox
    valid = setup.valid
    t = int(valid.shape[0])
    tiles_x = -(-WIDTH // 128)
    nt = tiles_x * (-(-HEIGHT // 8))
    print(f"T={t}, nt={nt}, span_cap={s.span_cap}, "
          f"mid_cap={s.span_mid_cap}", flush=True)

    tx0 = bx0 // 128
    ty0 = by0 // 8
    span_w = bx1 // 128 - tx0 + 1
    area = span_w * (by1 // 8 - ty0 + 1)
    small = valid & (area <= s.span_cap)
    mid = small & (area > fused.SPAN_DENSE)
    big = valid & (area > s.span_cap)
    print(f"valid={int(valid.sum())}, mid={int(mid.sum())}, "
          f"big={int(big.sum())}", flush=True)

    # (a) the two top_k compactions, standalone
    def topk_body(carry):
        negm = jnp.where(mid, -jnp.arange(t, dtype=jnp.int32) - carry.astype(jnp.int32),
                         jnp.int32(-(1 << 30)))
        topm, _ = lax.top_k(negm, s.span_mid_cap)
        neg = jnp.where(big, -jnp.arange(t, dtype=jnp.int32),
                        jnp.int32(-(1 << 30)))
        top, _ = lax.top_k(neg, 64)
        return (dep_f(topm) + dep_f(top)).astype(jnp.float32), topm[:1]

    timeit("two top_k compactions (mid+big)", scan8(topk_body))

    # (b) dense+mid expansion only (uses a fixed fake mid list)
    mid_ids = jnp.arange(s.span_mid_cap, dtype=jnp.int32)

    def expand_body(carry):
        kd = jnp.arange(fused.SPAN_DENSE, dtype=jnp.int32)
        dxd = kd[None, :] % span_w[:, None]
        dyd = kd[None, :] // span_w[:, None]
        tile_d = ((ty0[:, None] + dyd) * tiles_x + (tx0[:, None] + dxd)
                  + carry.astype(jnp.int32))
        dense = small & (area <= fused.SPAN_DENSE)
        live_d = dense[:, None] & (kd[None, :] < area[:, None])
        tile_d = jnp.where(live_d, tile_d, nt)
        msel = mid_ids
        km = jnp.arange(s.span_cap, dtype=jnp.int32)
        span_w_m = span_w[msel]
        dxm = km[None, :] % span_w_m[:, None]
        dym = km[None, :] // span_w_m[:, None]
        tile_m = ((ty0[msel][:, None] + dym) * tiles_x
                  + (tx0[msel][:, None] + dxm))
        flat = jnp.concatenate([tile_d.reshape(-1), tile_m.reshape(-1)])
        return dep_f(flat), flat[:1]

    timeit("dense+mid expansion (elementwise)", scan8(expand_body))

    # (c) the pair sort alone at the real size/content
    kd = jnp.arange(fused.SPAN_DENSE, dtype=jnp.int32)
    tile_d = ((ty0[:, None] + kd[None, :] % span_w[:, None] // 1) * tiles_x)
    flat_tile = jnp.where(
        (small & (area <= fused.SPAN_DENSE))[:, None]
        & (kd[None, :] < area[:, None]),
        (ty0[:, None]) * tiles_x + tx0[:, None], nt,
    )
    flat_tile = jnp.concatenate(
        [flat_tile.reshape(-1),
         jnp.full((s.span_mid_cap * s.span_cap,), nt, jnp.int32)])
    tri_flat = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[:, None], (t, fused.SPAN_DENSE)
    ).reshape(-1)
    tri_flat = jnp.concatenate(
        [tri_flat, jnp.zeros((s.span_mid_cap * s.span_cap,), jnp.int32)])
    print(f"sort size: {flat_tile.shape[0]}", flush=True)

    def sort2_body(carry):
        st, sr = lax.sort((flat_tile + carry.astype(jnp.int32), tri_flat),
                          num_keys=2, is_stable=False)
        return dep_f(st) + dep_f(sr), st[:1]

    timeit("lax.sort 2-key unstable (315k)", scan8(sort2_body))

    tri_bits = 18

    def sort1_body(carry):
        packed = ((flat_tile + carry.astype(jnp.int32)) << tri_bits) | tri_flat
        sp = lax.sort(packed, is_stable=False)
        return dep_f(sp), sp[:1]

    timeit("lax.sort 1-key packed int32 (315k)", scan8(sort1_body))

    # (d) searchsorted boundaries
    st, _ = lax.sort((flat_tile, tri_flat), num_keys=2, is_stable=False)

    def ss_body(carry):
        b = jnp.searchsorted(
            st + carry.astype(jnp.int32),
            jnp.arange(nt + 1, dtype=jnp.int32)).astype(jnp.int32)
        return dep_f(b), b[:1]

    timeit("searchsorted boundaries (nt+1)", scan8(ss_body))

    # (e) full bin_pairs (control)
    oc = ((s.overflow_cap + 7) // 8) * 8

    def bin_body(carry):
        sorted_tri, starts, counts, big_ids, n_big, diag, ty, tx = (
            fused.bin_pairs(
                setup, WIDTH, HEIGHT, 8, 128, s.span_cap, oc,
                s.max_candidates * s.raster_passes,
                pair_budget=s.pair_budget, span_mid_cap=s.span_mid_cap,
            )
        )
        dep = (dep_f(sorted_tri) + dep_f(counts)
               + carry * jnp.float32(1e-30))
        return dep.astype(jnp.float32), counts[:1]

    timeit("full bin_pairs (control)", scan8(bin_body))


if __name__ == "__main__":
    main()
