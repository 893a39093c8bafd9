"""Text-prompted segmentation backends for local editing.

Reference analog: LangSAMTextSegmentor (threestudio/utils/sam.py:14-63) —
wraps lang-segment-anything (SAM 2.1) with a full-mask fallback on failure.
SAM-scale weights are not shippable here, so the behavior contract
(per-view [H, W] float mask in {0, 1} for a text prompt) is provided by
pluggable backends:

- ``precomputed``: reads mask PNGs from a directory (one per view id) — the
  recommended path for reproducing reference local-edit runs
- ``torch_sam``: uses lang_sam / segment-anything if importable (gated)
- fallback: full-image mask, mirroring the reference's failure behavior
  (sam.py:31-63)
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def full_mask_segmentor(image: np.ndarray, prompt: str) -> np.ndarray:
    """Reference fallback: everything is editable (sam.py:31-63)."""
    return np.ones(image.shape[:2], np.float32)


def precomputed_segmentor(mask_dir: str) -> Callable:
    """Masks from ``<mask_dir>/<view_id:04d>.png`` (grayscale, >127 = in)."""
    state = {"next_id": 0}

    def seg(image: np.ndarray, prompt: str, view_id: Optional[int] = None):
        vid = state["next_id"] if view_id is None else view_id
        if view_id is None:
            state["next_id"] += 1
        path = os.path.join(mask_dir, f"{vid:04d}.png")
        if not os.path.exists(path):
            return full_mask_segmentor(image, prompt)
        import imageio.v2 as imageio

        m = np.asarray(imageio.imread(path))
        if m.ndim == 3:
            m = m[..., 0]
        if m.shape != image.shape[:2]:
            import cv2

            m = cv2.resize(
                m.astype(np.float32),
                (image.shape[1], image.shape[0]),
                interpolation=cv2.INTER_NEAREST,
            )
        return (m > 127).astype(np.float32)

    return seg


def torch_sam_segmentor() -> Callable:
    """lang_sam-backed segmentor when the package + weights exist locally;
    mirrors LangSAMTextSegmentor's predict + fallback (sam.py:22-63)."""
    try:
        from lang_sam import LangSAM  # type: ignore

        model = LangSAM()
    except Exception:
        return full_mask_segmentor

    def seg(image: np.ndarray, prompt: str):
        try:
            from PIL import Image

            pil = Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
            out = model.predict([pil], [prompt])
            masks = out[0]["masks"]
            if len(masks) == 0:
                return full_mask_segmentor(image, prompt)
            return np.asarray(masks[0]).astype(np.float32)
        except Exception:
            return full_mask_segmentor(image, prompt)

    return seg


def build_segmentor(kind: str = "fallback", mask_dir: str = "") -> Callable:
    if kind == "precomputed":
        return precomputed_segmentor(mask_dir)
    if kind == "torch_sam":
        return torch_sam_segmentor()
    return full_mask_segmentor
