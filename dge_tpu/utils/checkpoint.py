"""Checkpoint/resume.

Reference analogs (SURVEY.md §5): Lightning ckpts + PLY snapshots +
GaussianModel.capture()/restore() tuples (gaussian_model.py:110-204). Here a
single orbax-backed checkpoint captures the full training state — scene
pytree (including alive/grad_mask/generation), optimizer state, fit stats,
and step — plus the PLY export for interchange with reference tooling.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _pack_zero_size(tree):
    """Orbax refuses zero-size arrays (e.g. features_rest at SH degree 0 is
    [cap, 0, 3], and its Adam moments mirror it) — swap them for 1-element
    placeholders of the same dtype; restore puts the template's zero-size
    arrays back."""
    import jax.numpy as jnp

    def pack(x):
        if hasattr(x, "size") and x.size == 0:
            return jnp.zeros((1,), x.dtype)
        return x

    return jax.tree_util.tree_map(pack, tree)


def _unpack_zero_size(restored, template):
    def unpack(r, t):
        if hasattr(t, "size") and t.size == 0:
            return t
        return r

    return jax.tree_util.tree_map(unpack, restored, template)


def save_checkpoint(path: str, scene, opt_state, fit_state, extra: Optional[Dict] = None):
    """Write a full training checkpoint (capture() analog)."""
    import orbax.checkpoint as ocp

    import json

    path = os.path.abspath(path)
    payload = _pack_zero_size({
        "scene": scene,
        "opt_state": opt_state,
        "fit_state": fit_state,
    })
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    meta = {"max_sh_degree": scene.max_sh_degree, **(extra or {})}
    with open(path + "_meta.json", "w") as f:
        json.dump(meta, f)
    return path


def restore_checkpoint(path: str, scene_template, opt_state_template, fit_state_template):
    """Restore into the provided templates (restore() analog; shapes must
    match the capture)."""
    import orbax.checkpoint as ocp

    import json

    path = os.path.abspath(path)
    template = {
        "scene": scene_template,
        "opt_state": opt_state_template,
        "fit_state": fit_state_template,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, _pack_zero_size(template))
    restored = _unpack_zero_size(restored, template)
    meta = {}
    if os.path.exists(path + "_meta.json"):
        with open(path + "_meta.json") as f:
            meta = json.load(f)
    return (
        restored["scene"],
        restored["opt_state"],
        restored["fit_state"],
        meta,
    )
