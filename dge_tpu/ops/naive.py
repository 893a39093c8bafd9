"""Naive per-pixel reference rasterizer (test oracle).

Implements the exact sequential semantics of renderCUDA
(cuda_rasterizer/forward.cu:261-379) in slow numpy: per pixel, walk all
visible Gaussians in depth order, apply the skip/early-exit rules, composite.
Only for small scenes/images in unit tests — never in the hot path.
"""

from __future__ import annotations

import numpy as np

from dge_tpu.ops import projection


def render_naive(scene, cam, bg=None, tile_px: int = 32) -> dict:
    bg = np.zeros(3, np.float32) if bg is None else np.asarray(bg, np.float32)
    prep = projection.preprocess(
        scene.xyz,
        scene.get_scaling,
        scene.get_rotation,
        scene.get_opacity,
        scene.get_features,
        scene.alive,
        cam,
        scene.active_sh_degree,
        scene.max_sh_degree,
    )
    mean2d = np.asarray(prep.mean2d)
    depth = np.asarray(prep.depth)
    conic = np.asarray(prep.conic)
    rgb = np.asarray(prep.rgb)
    op = np.asarray(prep.opacity)
    vis = np.asarray(prep.visible)
    rad = np.asarray(prep.radius)

    order = np.argsort(np.where(vis, depth, np.inf), kind="stable")
    h, w = cam.height, cam.width
    color = np.zeros((h, w, 3), np.float32)
    dimg = np.zeros((h, w), np.float32)
    timg = np.ones((h, w), np.float32)

    tiles_x = -(-w // tile_px)
    tiles_y = -(-h // tile_px)

    def rect(i):
        x0 = min(max(int(np.floor((mean2d[i, 0] - rad[i]) / tile_px)), 0), tiles_x)
        y0 = min(max(int(np.floor((mean2d[i, 1] - rad[i]) / tile_px)), 0), tiles_y)
        x1 = min(
            max(int((mean2d[i, 0] + rad[i] + tile_px - 1) // tile_px), 0), tiles_x
        )
        y1 = min(
            max(int((mean2d[i, 1] + rad[i] + tile_px - 1) // tile_px), 0), tiles_y
        )
        return x0, x1, y0, y1

    ids = [i for i in order if vis[i]]
    rects = {i: rect(i) for i in ids}
    for y in range(h):
        for x in range(w):
            tx, ty = x // tile_px, y // tile_px
            t = 1.0
            c = np.zeros(3, np.float32)
            d = 0.0
            for i in ids:
                x0, x1, y0, y1 = rects[i]
                # visited only if the Gaussian's tile rect covers this tile
                # (getRect, auxiliary.h:45-56)
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                dx = mean2d[i, 0] - x
                dy = mean2d[i, 1] - y
                power = (
                    -0.5 * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy)
                    - conic[i, 1] * dx * dy
                )
                if power > 0.0:
                    continue
                alpha = min(0.99, op[i] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_t = t * (1 - alpha)
                if test_t < 1e-4:
                    break
                c += rgb[i] * alpha * t
                d += depth[i] * alpha * t
                t = test_t
            color[y, x] = c + t * bg
            dimg[y, x] = d
            timg[y, x] = t
    return {"color": color, "depth": dimg, "final_T": timg}
