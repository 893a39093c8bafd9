"""Scene-editing utilities on GaussianScene: mask growth, concatenation,
localized views, anchors.

Reference analogs (GaussianEditor inheritance inside GaussianModel):
- get_near_gaussians_by_mask — grow the editable mask to nearby Gaussians
  via bbox + KNN (gaussian_model.py:865-898)
- concat_gaussians (gaussian_model.py:900-923)
- localize property views slicing rendering to the masked subset
  (gaussian_model.py:217-268)
- anchor state + per-generation anchor loss (gaussian_model.py:126-184;
  configured but not added to DGE's training loss — provided here for
  parity and available to custom loops)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dge_tpu.scene.gaussians import GaussianScene, from_arrays

MAX_ANCHOR_WEIGHT = 10.0  # gaussian_model.py:38


def grow_mask_to_neighbors(
    scene: GaussianScene,
    mask: jnp.ndarray,
    dist_thresh: float = 0.1,
) -> jnp.ndarray:
    """Extend a per-Gaussian bool mask to nearby Gaussians: candidates inside
    the masked set's 3-97% quantile bbox scaled by 1.3 whose nearest masked
    neighbor is within ``dist_thresh`` (get_near_gaussians_by_mask,
    gaussian_model.py:865-898). Returns the combined grown mask. Host-side
    KDTree (editing-time only)."""
    from scipy.spatial import cKDTree

    xyz = np.asarray(scene.xyz)
    alive = np.asarray(scene.alive)
    m = np.asarray(mask) & alive
    if not m.any():
        return jnp.asarray(m)
    sel = xyz[m]
    lo = np.quantile(sel, 0.03, axis=0)
    hi = np.quantile(sel, 0.97, axis=0)
    mid = (lo + hi) / 2
    half = (hi - lo) * 1.3 / 2
    lo, hi = mid - half, mid + half
    cand = np.where(alive & ~m & np.all((xyz >= lo) & (xyz <= hi), axis=1))[0]
    if len(cand):
        tree = cKDTree(sel)
        d, _ = tree.query(xyz[cand], k=1)
        m = m.copy()
        m[cand[d <= dist_thresh]] = True
    return jnp.asarray(m)


def localized(scene: GaussianScene, mask: Optional[jnp.ndarray] = None) -> GaussianScene:
    """A view of the scene rendering only the masked subset: dead-alive
    everything outside the mask (the reference's ``localize`` property
    slicing, gaussian_model.py:217-268, done here by alive-masking — static
    shapes, no slicing)."""
    m = (scene.grad_mask > 0) if mask is None else mask
    return scene.replace(alive=scene.alive & m)


def concat_scenes(a: GaussianScene, b: GaussianScene) -> GaussianScene:
    """Concatenate two scenes' alive Gaussians (concat_gaussians,
    gaussian_model.py:900-923). SH degrees must match."""
    assert a.max_sh_degree == b.max_sh_degree
    am = np.asarray(a.alive)
    bm = np.asarray(b.alive)

    def cat(x, y):
        return np.concatenate([np.asarray(x)[am], np.asarray(y)[bm]], axis=0)

    return from_arrays(
        cat(a.xyz, b.xyz),
        cat(a.features_dc, b.features_dc),
        cat(a.features_rest, b.features_rest),
        cat(a.opacity, b.opacity),
        cat(a.scaling, b.scaling),
        cat(a.rotation, b.rotation),
        max_sh_degree=a.max_sh_degree,
        active_sh_degree=int(a.active_sh_degree),
    )


def anchor_snapshot(scene: GaussianScene):
    """Capture anchor state (update_anchor analog)."""
    return {
        "xyz": scene.xyz,
        "features_dc": scene.features_dc,
        "opacity": scene.opacity,
        "scaling": scene.scaling,
        "generation": scene.generation,
        "alive": scene.alive,
    }


def anchor_loss(
    scene: GaussianScene,
    anchor,
    generation_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-generation-weighted MSE to the anchor snapshot
    (gaussian_model.anchor_loss, :126-184): newer densify generations get
    smaller pull toward the anchor; weights capped at MAX_ANCHOR_WEIGHT."""
    valid = scene.alive & anchor["alive"]
    if generation_weights is None:
        gw = jnp.minimum(
            MAX_ANCHOR_WEIGHT, 1.0 + scene.generation.astype(jnp.float32)
        )
    else:
        gw = generation_weights[jnp.clip(scene.generation, 0,
                                         len(generation_weights) - 1)]
    w = jnp.where(valid, gw, 0.0)

    def field_mse(cur, anc):
        d = (cur - anc) ** 2
        d = d.reshape(d.shape[0], -1).sum(axis=1)
        return jnp.sum(w * d)

    total = (
        field_mse(scene.xyz, anchor["xyz"])
        + field_mse(scene.features_dc, anchor["features_dc"])
        + field_mse(scene.opacity, anchor["opacity"])
        + field_mse(scene.scaling, anchor["scaling"])
    )
    return total / jnp.maximum(jnp.sum(w), 1.0)
