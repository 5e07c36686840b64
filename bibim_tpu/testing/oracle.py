"""NumPy oracle: a scalar-loop software rasterizer + shader.

The deliberately-simple, obviously-correct implementation of the exact same
conventions as ops/raster.py (reversed-Z GREATER_OR_EQUAL, CW front faces in
y-down screen space, +0.5 pixel centers, perspective-correct barycentrics).
Used as the "fake backend" for pixel-level validation of the XLA/Pallas
paths (SURVEY.md §4 test strategy). O(T·bbox) per frame — tests use tiny
images.
"""

from __future__ import annotations

import numpy as np


def oracle_rasterize(clip: np.ndarray, tris: np.ndarray, width: int, height: int):
    """Returns (tri_id (H,W) int32, bary (H,W,2), depth (H,W))."""
    clip = np.asarray(clip, np.float64)
    tri_id = np.full((height, width), -1, np.int32)
    bary = np.zeros((height, width, 2), np.float64)
    depth = np.zeros((height, width), np.float64)

    for t_idx, (i0, i1, i2) in enumerate(np.asarray(tris)):
        v = clip[[i0, i1, i2]]
        w = v[:, 3]
        # Homogeneous (clipless) setup, same math as ops/raster.py.
        xh = (v[:, 0] * 0.5 + w * 0.5) * width
        yh = (v[:, 1] * 0.5 + w * 0.5) * height
        ea = np.array(
            [yh[1] * w[2] - yh[2] * w[1], yh[2] * w[0] - yh[0] * w[2], yh[0] * w[1] - yh[1] * w[0]]
        )
        eb = np.array(
            [xh[2] * w[1] - xh[1] * w[2], xh[0] * w[2] - xh[2] * w[0], xh[1] * w[0] - xh[0] * w[1]]
        )
        ec = np.array(
            [xh[1] * yh[2] - xh[2] * yh[1], xh[2] * yh[0] - xh[0] * yh[2], xh[0] * yh[1] - xh[1] * yh[0]]
        )
        det = float(ec @ w)
        if det <= 0:  # back-face / degenerate
            continue
        if np.all(w > 1e-6):
            xs, ys = xh / w, yh / w
            x0 = max(int(np.floor(xs.min())), 0)
            x1 = min(int(np.ceil(xs.max())), width - 1)
            y0 = max(int(np.floor(ys.min())), 0)
            y1 = min(int(np.ceil(ys.max())), height - 1)
        else:  # external triangle: conservative full screen
            x0, x1, y0, y1 = 0, width - 1, 0, height - 1
        az, bz, cz = ea @ v[:, 2], eb @ v[:, 2], ec @ v[:, 2]
        aw, bw, cw = ea @ w, eb @ w, ec @ w
        for py in range(y0, y1 + 1):
            for px in range(x0, x1 + 1):
                cx, cy = px + 0.5, py + 0.5
                e = ea * cx + eb * cy + ec
                if np.any(e < 0):
                    continue
                wn = aw * cx + bw * cy + cw
                zn = az * cx + bz * cy + cz
                if wn <= 0 or zn < 0 or zn > wn:
                    continue
                zp = zn / wn
                if zp < depth[py, px]:
                    continue
                b = e / e.sum()
                tri_id[py, px] = t_idx
                bary[py, px] = b[:2]
                depth[py, px] = zp
    return tri_id, bary, depth


def oracle_shade_pbr(pos, normal, albedo, metallic, roughness, ao, lights, view_pos):
    """Scalar-formula port of brdf.frag for a batch of sample points.

    ``lights`` is a list of dicts: type (0/1/2), pos, dir, color, intensity,
    inner_cutoff, outer_cutoff.
    """
    pos = np.asarray(pos, np.float64)
    n = normal / np.linalg.norm(normal, axis=-1, keepdims=True)
    v = view_pos - pos
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    f0 = 0.04 * (1 - metallic) + albedo * metallic
    pi = np.pi

    lo = np.zeros_like(albedo)
    for light in lights:
        ltype = int(light.get("type", 0))
        if ltype == 2:
            d = np.asarray(light["dir"], np.float64)
            l_vec = -d / np.linalg.norm(d)
            l_vec = np.broadcast_to(l_vec, pos.shape)
            att = np.ones(pos.shape[:-1] + (1,))
        else:
            to_l = np.asarray(light["pos"], np.float64) - pos
            dist = np.linalg.norm(to_l, axis=-1, keepdims=True)
            l_vec = to_l / dist
            att = 1.0 / (dist * dist)
            if ltype == 1:
                d = np.asarray(light["dir"], np.float64)
                theta = np.sum(l_vec * (-d / np.linalg.norm(d)), -1, keepdims=True)
                eps = light["inner_cutoff"] - light["outer_cutoff"]
                att = att * np.clip((theta - light["outer_cutoff"]) / eps, 0, 1)

        h = l_vec + v
        h /= np.linalg.norm(h, axis=-1, keepdims=True)
        ndh = np.maximum(np.sum(n * h, -1, keepdims=True), 0)
        a2 = roughness**4
        dist_ggx = a2 / (pi * (ndh * ndh * (a2 - 1) + 1) ** 2)
        hdv = np.maximum(np.sum(h * v, -1, keepdims=True), 0)
        fres = f0 + (1 - f0) * (1 - hdv) ** 5
        k = (roughness + 1) ** 2 / 8
        ndv = np.maximum(np.sum(n * v, -1, keepdims=True), 0)
        ndl = np.maximum(np.sum(n * l_vec, -1, keepdims=True), 0)
        g = (ndv / (ndv * (1 - k) + k)) * (ndl / (ndl * (1 - k) + k))
        radiance = att * np.asarray(light["color"]) * light["intensity"]
        spec = dist_ggx * fres * g / np.maximum(4 * ndv * ndl, 0.001)
        kd = (1 - fres) * (1 - metallic)
        lo = lo + (kd * albedo / pi + spec) * radiance * ndl

    return 0.03 * albedo * ao + lo
