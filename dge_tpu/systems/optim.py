"""Per-group Adam optimizer for Gaussian parameters.

Reference analog: GaussianModel.training_setup
(gaussian_model.py:336-380): six Adam param groups (xyz, f_dc, f_rest,
opacity, scaling, rotation) with eps=1e-15, an exponential-decay LR schedule
on xyz, and LR values from OptimizationParams
(gaussiansplatting/arguments/__init__.py:71-89) including DGE's LR scalers.

TPU redesign: instead of optimizer-state surgery on densify
(cat_tensors_to_optimizer / _prune_optimizer, gaussian_model.py:568-641),
optax state lives in the same padded buffers as the params; densify returns a
row mask and ``zero_adam_rows`` clears first/second moments for those rows.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from dge_tpu.ops.losses import expon_lr_schedule
from dge_tpu.scene.gaussians import PARAM_NAMES


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """OptimizationParams defaults with DGE's scaler hooks
    (arguments/__init__.py:71-89; DGE.py:500-515 constructs these from
    cfg.gs_lr_scaler etc.)."""

    max_steps: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.000016
    position_lr_delay_mult: float = 0.01
    feature_lr: float = 0.0125
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    eps: float = 1e-15

    @classmethod
    def scaled(
        cls,
        max_steps: int,
        lr_scaler: float = 1.0,
        lr_final_scaler: float = 1.0,
        color_lr_scaler: float = 1.0,
        opacity_lr_scaler: float = 1.0,
        scaling_lr_scaler: float = 1.0,
        rotation_lr_scaler: float = 1.0,
        **kw,
    ) -> "OptimConfig":
        """DGE's scaler constructor (arguments/__init__.py:72-80)."""
        return cls(
            max_steps=max_steps,
            position_lr_init=0.00016 * lr_scaler,
            position_lr_final=0.000016 * lr_final_scaler,
            feature_lr=0.0125 * color_lr_scaler,
            opacity_lr=0.05 * opacity_lr_scaler,
            scaling_lr=0.005 * scaling_lr_scaler,
            rotation_lr=0.001 * rotation_lr_scaler,
            **kw,
        )


def make_optimizer(
    cfg: OptimConfig, spatial_lr_scale: float = 1.0
) -> optax.GradientTransformation:
    sls = spatial_lr_scale
    xyz_sched = expon_lr_schedule(
        cfg.position_lr_init * sls,
        cfg.position_lr_final * sls,
        cfg.max_steps,
        lr_delay_steps=0,
        lr_delay_mult=cfg.position_lr_delay_mult,
    )
    txs = {
        "xyz": optax.adam(xyz_sched, eps=cfg.eps),
        "features_dc": optax.adam(cfg.feature_lr, eps=cfg.eps),
        "features_rest": optax.adam(cfg.feature_lr / 20.0, eps=cfg.eps),
        "opacity": optax.adam(cfg.opacity_lr, eps=cfg.eps),
        "scaling": optax.adam(cfg.scaling_lr, eps=cfg.eps),
        "rotation": optax.adam(cfg.rotation_lr, eps=cfg.eps),
    }
    return optax.multi_transform(txs, {k: k for k in PARAM_NAMES})


# Fields whose grads are zeroed outside the editable region. The reference
# hooks every field EXCEPT rotation (apply_grad_mask, gaussian_model.py:841-851).
MASKED_FIELDS = ("xyz", "features_dc", "features_rest", "opacity", "scaling")


def apply_grad_mask(
    grads: Dict[str, jnp.ndarray], grad_mask: jnp.ndarray, alive: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Zero grads of non-editable / dead Gaussians (functional version of the
    backward hooks at gaussian_model.py:834-856)."""
    m = (grad_mask > 0) & alive
    out = {}
    for k, g in grads.items():
        if k in MASKED_FIELDS:
            mm = m.reshape((-1,) + (1,) * (g.ndim - 1))
            out[k] = g * mm.astype(g.dtype)
        else:
            out[k] = g * alive.reshape((-1,) + (1,) * (g.ndim - 1)).astype(g.dtype)
    return out


def zero_adam_rows(
    opt_state, rows: jnp.ndarray, fields: Optional[tuple] = None
):
    """Zero Adam mu/nu for the given rows (bool [capacity]) — the padded-buffer
    equivalent of the reference's optimizer-state surgery
    (cat_tensors_to_optimizer zeroing exp_avg for new tensors,
    gaussian_model.py:609-641; replace_tensor_to_optimizer for opacity reset,
    :553-566). ``fields=None`` touches every param group."""
    keep = 1.0 - rows.astype(jnp.float32)

    def zero_rows(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == rows.shape[0]:
            return x * keep.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return x

    def maybe(label):
        return fields is None or label in fields

    # optax.multi_transform state: MultiTransformState(inner_states={label: ...})
    inner = {
        label: (
            jax.tree_util.tree_map(zero_rows, st) if maybe(label) else st
        )
        for label, st in opt_state.inner_states.items()
    }
    return opt_state._replace(inner_states=inner) if hasattr(
        opt_state, "_replace"
    ) else type(opt_state)(inner_states=inner)
