"""Densification and pruning in fixed-capacity padded buffers.

Reference analog: GaussianModel.densify_and_prune / densify_and_clone /
densify_and_split / prune_points (gaussian_model.py:568-809), including the
DGE-specific quantile cap (``max_densify_percent``, :773-777) and the
mask-aware fixes (grads zeroed outside the editable mask :772, prune
restricted to the mask :794).

TPU redesign: all shapes are static. New Gaussians are written into free
(dead) slots allocated by prefix-sum ranking; when free slots run out the
overflow is dropped and counted (``info['dropped']``) instead of silently
growing — the host grows capacity and re-jits when occupancy crosses a
threshold (see fit.py).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dge_tpu.ops.projection import quat_to_rotmat
from dge_tpu.scene.gaussians import GaussianScene, inverse_sigmoid


class DensifyInfo(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    dropped: jnp.ndarray  # clones/children that found no free slot
    changed_rows: jnp.ndarray  # bool [cap]: rows whose Adam state must reset


def _masked_quantile(values: jnp.ndarray, alive: jnp.ndarray, q: jnp.ndarray):
    """torch.quantile(values_of_alive, q) with linear interpolation
    (densify_and_prune, gaussian_model.py:775)."""
    n = jnp.sum(alive.astype(jnp.int32))
    sorted_v = jnp.sort(jnp.where(alive, values, jnp.inf))
    pos = jnp.clip(q, 0.0, 1.0) * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    vlo = sorted_v[jnp.clip(lo, 0, values.shape[0] - 1)]
    vhi = sorted_v[jnp.clip(hi, 0, values.shape[0] - 1)]
    return vlo + (vhi - vlo) * frac


def densify_and_prune(
    scene: GaussianScene,
    grad_accum: jnp.ndarray,  # [cap] accumulated screen-space grad norms
    denom: jnp.ndarray,  # [cap] accumulation counts
    max_radii2d: jnp.ndarray,  # [cap] max screen radius seen
    key: jax.Array,
    *,
    max_grad: float,
    max_densify_percent: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float,
    generation_num: int = 0,
) -> Tuple[GaussianScene, DensifyInfo]:
    cap = scene.capacity
    alive = scene.alive
    editable = scene.grad_mask > 0

    grads = jnp.where(denom > 0, grad_accum / jnp.maximum(denom, 1), 0.0)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)
    grads = jnp.where(alive & editable, grads, 0.0)

    if max_densify_percent < 1.0:
        n_alive = jnp.sum(alive.astype(jnp.int32))
        nnz = jnp.sum((grads > 0).astype(jnp.float32))
        valid_percent = nnz * max_densify_percent / jnp.maximum(
            n_alive.astype(jnp.float32), 1.0
        )
        thr = _masked_quantile(grads, alive, 1.0 - valid_percent)
        grads = jnp.where(grads < thr, 0.0, grads)

    max_scale = jnp.max(scene.get_scaling, axis=-1)
    dense_cut = percent_dense * extent
    hot = grads >= max_grad
    clone_mask = hot & (max_scale <= dense_cut) & alive
    split_mask = hot & (max_scale > dense_cut) & alive

    free_list = jnp.argsort(alive)  # dead slots first
    n_free = cap - jnp.sum(alive.astype(jnp.int32))

    params = scene.params()

    # ---- clone (densify_and_clone, gaussian_model.py:730-766) ----
    clone_rank = jnp.cumsum(clone_mask.astype(jnp.int32)) - 1
    clone_ok = clone_mask & (clone_rank < n_free)
    clone_dest = jnp.where(clone_ok, free_list[jnp.clip(clone_rank, 0, cap - 1)], cap)

    def scatter(dst_field, src_values, dest):
        return dst_field.at[dest].set(src_values, mode="drop")

    new_params = {k: scatter(v, v, clone_dest) for k, v in params.items()}
    new_alive = alive.at[clone_dest].set(True, mode="drop")
    new_grad_mask = scene.grad_mask.at[clone_dest].set(scene.grad_mask, mode="drop")
    gen_tag = jnp.full((cap,), generation_num, jnp.int32)
    new_generation = scene.generation.at[clone_dest].set(gen_tag, mode="drop")
    n_cloned = jnp.sum(clone_ok.astype(jnp.int32))

    # ---- split (densify_and_split, gaussian_model.py:673-728): N=2 children
    # sampled from the Gaussian, scales /(0.8*N), source pruned ----
    split_rank = jnp.cumsum(split_mask.astype(jnp.int32)) - 1
    base = n_cloned
    slot0 = base + 2 * split_rank
    slot1 = slot0 + 1
    ok0 = split_mask & (slot0 < n_free)
    ok1 = split_mask & (slot1 < n_free)
    both_ok = ok0 & ok1
    dest0 = jnp.where(both_ok, free_list[jnp.clip(slot0, 0, cap - 1)], cap)
    dest1 = jnp.where(both_ok, free_list[jnp.clip(slot1, 0, cap - 1)], cap)

    std = scene.get_scaling  # [cap, 3]
    rot = quat_to_rotmat(scene.get_rotation)  # [cap, 3, 3]
    k0, k1 = jax.random.split(key)
    s0 = jax.random.normal(k0, (cap, 3)) * std
    s1 = jax.random.normal(k1, (cap, 3)) * std
    child_xyz0 = scene.xyz + jnp.einsum("nij,nj->ni", rot, s0)
    child_xyz1 = scene.xyz + jnp.einsum("nij,nj->ni", rot, s1)
    child_scaling = jnp.log(jnp.maximum(std / 1.6, 1e-30))  # 0.8 * N, N=2

    for dest, cxyz in ((dest0, child_xyz0), (dest1, child_xyz1)):
        new_params["xyz"] = scatter(new_params["xyz"], cxyz, dest)
        new_params["scaling"] = scatter(new_params["scaling"], child_scaling, dest)
        for k in ("features_dc", "features_rest", "opacity", "rotation"):
            new_params[k] = scatter(new_params[k], params[k], dest)
        new_alive = new_alive.at[dest].set(True, mode="drop")
        new_grad_mask = new_grad_mask.at[dest].set(scene.grad_mask, mode="drop")
        new_generation = new_generation.at[dest].set(gen_tag, mode="drop")

    # prune split sources (prune_filter, gaussian_model.py:719-726)
    new_alive = new_alive & ~both_ok
    n_split = jnp.sum(both_ok.astype(jnp.int32))

    # ---- prune (densify_and_prune, gaussian_model.py:787-795) ----
    opacity_act = jax.nn.sigmoid(new_params["opacity"][:, 0])
    prune = opacity_act < min_opacity
    if max_screen_size:
        big_vs = max_radii2d > max_screen_size
        big_ws = jnp.max(jnp.exp(new_params["scaling"]), axis=-1) > 0.1 * extent
        prune = prune | big_vs | big_ws
    prune = prune & (new_grad_mask > 0) & new_alive
    n_pruned = jnp.sum(prune.astype(jnp.int32))
    new_alive = new_alive & ~prune

    dropped = (
        jnp.sum((clone_mask & ~clone_ok).astype(jnp.int32))
        + 2 * jnp.sum((split_mask & ~both_ok).astype(jnp.int32))
    )

    changed = jnp.zeros(cap, bool)
    for dest in (clone_dest, dest0, dest1):
        changed = changed.at[dest].set(True, mode="drop")
    changed = changed | both_ok | prune

    new_scene = scene.replace(
        alive=new_alive,
        grad_mask=new_grad_mask,
        generation=new_generation,
        **new_params,
    )
    return new_scene, DensifyInfo(
        n_cloned=n_cloned,
        n_split=n_split,
        n_pruned=n_pruned,
        dropped=dropped,
        changed_rows=changed,
    )


def reset_opacity(scene: GaussianScene) -> Tuple[GaussianScene, jnp.ndarray]:
    """Clamp opacity activation to <= 0.01 (reset_opacity,
    gaussian_model.py:447-452). Returns (scene, rows) where rows marks the
    opacity Adam state to zero."""
    new_act = jnp.minimum(scene.get_opacity, 0.01)
    new_logit = inverse_sigmoid(jnp.clip(new_act, 1e-7, 1 - 1e-7))
    new_op = jnp.where(scene.alive[:, None], new_logit, scene.opacity)
    return scene.replace(opacity=new_op), scene.alive


def grow_capacity(scene: GaussianScene, new_capacity: int) -> GaussianScene:
    """Host-side capacity growth (re-jit boundary)."""
    import numpy as np

    cap = scene.capacity
    if new_capacity <= cap:
        return scene
    pad = new_capacity - cap

    def pad_arr(x, fill=0.0):
        x = np.asarray(x)
        p = np.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.asarray(np.concatenate([x, p], axis=0))

    rot = np.zeros((pad, 4), np.float32)
    rot[:, 0] = 1.0
    return scene.replace(
        xyz=pad_arr(scene.xyz),
        features_dc=pad_arr(scene.features_dc),
        features_rest=pad_arr(scene.features_rest),
        opacity=pad_arr(scene.opacity, -10.0),
        scaling=pad_arr(scene.scaling, -20.0),
        rotation=jnp.concatenate([scene.rotation, jnp.asarray(rot)], axis=0),
        alive=pad_arr(scene.alive, False),
        grad_mask=pad_arr(scene.grad_mask, 0.0),
        generation=pad_arr(scene.generation, 0),
    )
