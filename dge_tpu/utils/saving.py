"""Artifact saving: image grids, sequences, videos, JSON.

Reference analog: SaverMixin (threestudio/utils/saving.py, 653 LoC) — the
subset the DGE pipeline actually exercises (rgb grids, image sequences ->
mp4/gif, json dumps), as plain functions instead of a mixin.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return img


def save_image(path: str, img: np.ndarray) -> str:
    """img: [H, W, 3] float [0,1] or uint8."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, _to_u8(img))
    return path


def load_image(path: str, size: Optional[tuple] = None) -> np.ndarray:
    """Returns [H, W, 3] float32 in [0, 1]."""
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img[..., :3].astype(np.float32) / 255.0
    if size is not None:
        import cv2

        img = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_AREA)
    return img


def save_image_grid(path: str, imgs: Sequence[np.ndarray], cols: int = 4) -> str:
    """Tile images into a grid (SaverMixin save_image_grid analog)."""
    imgs = [_to_u8(i) for i in imgs]
    h, w = imgs[0].shape[:2]
    cols = min(cols, len(imgs))
    rows = -(-len(imgs) // cols)
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    return save_image(path, grid)


def save_video(path: str, frames: Sequence[np.ndarray], fps: int = 30) -> str:
    """Image sequence -> mp4/gif (save_img_sequence, saving.py:396-433)."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = [_to_u8(f) for f in frames]
    if path.endswith(".gif"):
        imageio.mimsave(path, frames, duration=1.0 / fps)
    else:
        try:
            imageio.mimsave(path, frames, fps=fps)
        except Exception:
            # ffmpeg-less environments: fall back to gif next to the mp4 path
            alt = os.path.splitext(path)[0] + ".gif"
            imageio.mimsave(alt, frames, duration=1.0 / fps)
            return alt
    return path


def save_json(path: str, obj) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, default=float)
    return path
