"""Early-z opportunity probe (VERDICT r4 raster lever).

If per-tile candidates were processed in descending conservative-zmax
order (reversed-Z: near first) with an explicit draw-order tie carry,
the coverage loop could BREAK once every pixel's current winner key
provably beats all remaining candidates. This probe measures the
ceiling: for each tile, how many 8-row chunks hold only candidates whose
zmax (bucket-quantized upper bound) is strictly below the tile's FINAL
minimum covered depth — skippable iff the tile ends fully covered
(uncovered pixels pin the running min-key at clear=0 forever).

Optimistic vs the running-min reality, pessimistic vs a finer bucket
scheme. Reports chunk fractions for the headline and x64 configs.

Run: python tools/exp_earlyz.py [--x64]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 8


def probe(n_instances: int, bucket_bits: int = 16):
    from bibim_tpu import math3d as m3
    from bibim_tpu.ops import fused
    from bibim_tpu.ops.geometry import assemble_scene_planar
    from bibim_tpu.ops.raster import triangle_setup_planar
    from bibim_tpu.pipeline import RenderSettings, ViewBlock
    from bibim_tpu.pipeline.autotune import autotune_settings
    from bibim_tpu.scene import FreeLookCamera, ShaderBallScene
    from bibim_tpu.scene.culling import cull_scene_instances

    w, h = 1920, 1080
    scene = ShaderBallScene(num_instances=n_instances)
    if n_instances > 1:
        cam = FreeLookCamera(pos=np.array([8.0, 6.0, -14.0], np.float32))
    else:
        cam = FreeLookCamera()
    data = scene.scene_data()
    vb = ViewBlock(
        view=jnp.asarray(cam.get_view_matrix()),
        proj=m3.perspective(60.0, w / h, 0.1, 1000.0),
        view_pos=jnp.asarray(cam.pos),
        enable_normal_map=jnp.int32(0),
    )
    if n_instances > 1:
        data = cull_scene_instances(
            data, np.asarray(cam.get_view_matrix()),
            np.asarray(m3.perspective(60.0, w / h, 0.1, 1000.0)))
    base = RenderSettings(width=w, height=h, outputs="image",
                          show_gizmo=False, show_lights=False)
    s, _ = autotune_settings(data, vb, base, margin=1.05)

    @jax.jit
    def run():
        from bibim_tpu.pipeline.framegraph import _assemble_and_raster

        psoup = assemble_scene_planar(data.batches, vb.view, vb.proj, None)
        setup = triangle_setup_planar(psoup.clip, w, h)
        # Per-triangle conservative zmax over valid corners (z = zn/wn at
        # the corners; any w<=0 corner -> 1.0, never skipped).
        zs, ws = [], []
        for k in range(3):
            cx = psoup.clip[k]
            zs.append(cx[2])
            ws.append(cx[3])
        zmax = None
        anybad = None
        for z, wc in zip(zs, ws):
            zz = jnp.where(wc > 0, z / jnp.maximum(wc, 1e-30), 1.0)
            bad = wc <= 0
            zmax = zz if zmax is None else jnp.maximum(zmax, zz)
            anybad = bad if anybad is None else (anybad | bad)
        zmax = jnp.clip(jnp.where(anybad, 1.0, zmax), 0.0, 1.0)

        (tri, starts, counts, big_ids, n_big, diag, ty, tx) = \
            fused.bin_pairs(
                setup, w, h, s.tile_h, s.tile_w, span_cap=s.span_cap,
                overflow_cap=s.overflow_cap,
                max_candidates=s.max_candidates * s.raster_passes,
                pair_budget=s.pair_budget, span_mid_cap=s.span_mid_cap,
            )
        px, zkey, _ = _assemble_and_raster(data, vb, s)[:3]
        return tri, starts, counts, zmax, px.tri_id, zkey

    tri, starts, counts, zmax, tri_id, zkey = map(np.asarray,
                                                 jax.device_get(run()))
    nt = starts.shape[0]
    covered = tri_id >= 0
    full_cover = covered.all(axis=1)
    tile_min = np.where(full_cover, zkey.min(axis=1), -1)

    # Bucketized zub per candidate, exponent-ladder scheme (f32 bits >>
    # shift, clipped to the top 2^bits values below the frame max).
    zb = np.clip(zmax, 1e-30, 1.0).astype(np.float32).view(np.int32)
    total = 0
    skippable = 0
    tiles_gain = 0
    for t in range(nt):
        c = int(counts[t])
        if c == 0:
            continue
        zt = zmax[tri[starts[t]: starts[t] + c]]
        zt = np.sort(zt)[::-1]
        nch = -(-c // CHUNK)
        total += nch
        if tile_min[t] < 0:
            continue
        # chunk upper bound = max z in chunk (exact); quantize up to
        # bucket_bits resolution of the frame range
        fmin = float(tile_min[t].view(np.float32)) if hasattr(
            tile_min[t], "view") else np.int32(tile_min[t]).view(np.float32)
        skip = 0
        for ci in range(nch):
            rows = zt[ci * CHUNK:(ci + 1) * CHUNK]
            if rows.max() < fmin:
                skip += 1
        skippable += skip
        if skip:
            tiles_gain += 1
    print(f"instances={n_instances}: tiles={nt} fully_covered="
          f"{int(full_cover.sum())} chunks total={total} "
          f"skippable={skippable} ({100.0 * skippable / max(total, 1):.1f}%)"
          f" tiles_with_gain={tiles_gain}", flush=True)


def main():
    from bibim_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    probe(1)
    if "--x64" in sys.argv or True:
        probe(64)


if __name__ == "__main__":
    main()
