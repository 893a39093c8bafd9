"""Quality metrics: PSNR / SSIM / LPIPS evaluation over render dirs.

Reference analog: gaussiansplatting/metrics.py:36-93 (per-view + scene-mean
PSNR/SSIM/LPIPS written to results.json) and utils/clip_metrics.py
(CLIP similarity / directional similarity for edit quality).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from dge_tpu.ops import losses as L
from dge_tpu.utils import saving


def evaluate_pair_dirs(
    renders_dir: str,
    gt_dir: str,
    perceptual_fn: Optional[Callable] = None,
) -> Dict:
    """Compare same-named images in two directories (metrics.py semantics).
    Returns {psnr, ssim, lpips, per_view}."""
    names = sorted(
        f for f in os.listdir(renders_dir) if f.lower().endswith((".png", ".jpg"))
    )
    per_view = {}
    psnrs, ssims, lpips_vals = [], [], []
    for name in names:
        a = jnp.asarray(saving.load_image(os.path.join(renders_dir, name)))
        b = jnp.asarray(saving.load_image(os.path.join(gt_dir, name)))
        p = float(L.psnr(a, b))
        s = float(L.ssim(a, b))
        entry = {"psnr": p, "ssim": s}
        psnrs.append(p)
        ssims.append(s)
        if perceptual_fn is not None:
            lp = float(perceptual_fn(a, b))
            entry["lpips"] = lp
            lpips_vals.append(lp)
        per_view[name] = entry
    out = {
        "psnr": float(np.mean(psnrs)) if psnrs else None,
        "ssim": float(np.mean(ssims)) if ssims else None,
        "per_view": per_view,
    }
    if lpips_vals:
        out["lpips"] = float(np.mean(lpips_vals))
    return out


def clip_similarity(
    image_feats: np.ndarray, text_feats: np.ndarray
) -> np.ndarray:
    """Cosine similarity between normalized CLIP features
    (clip_metrics.py:33-50). Feature extraction is supplied by the caller
    (requires CLIP vision weights)."""
    a = image_feats / np.linalg.norm(image_feats, axis=-1, keepdims=True)
    b = text_feats / np.linalg.norm(text_feats, axis=-1, keepdims=True)
    return (a * b).sum(-1)


def clip_directional_similarity(
    img_feats_src, img_feats_edit, text_feats_src, text_feats_edit
) -> np.ndarray:
    """Directional CLIP similarity: edit direction in image space vs text
    space (clip_metrics.py)."""
    di = img_feats_edit - img_feats_src
    dt = text_feats_edit - text_feats_src
    di = di / (np.linalg.norm(di, axis=-1, keepdims=True) + 1e-8)
    dt = dt / (np.linalg.norm(dt, axis=-1, keepdims=True) + 1e-8)
    return (di * dt).sum(-1)
