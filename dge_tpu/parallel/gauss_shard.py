"""Gaussian-block sharding: per-Gaussian preprocessing partitioned over a
mesh axis.

The north-star scaling plan (BASELINE.json, SURVEY.md §2.6) partitions both
camera views and Gaussian map blocks across hosts. Per-Gaussian
preprocessing (cull/project/covariance/SH) is embarrassingly parallel over
the Gaussian axis — each shard processes capacity/n rows; the compact
screen-space outputs are all-gathered for the (global) binning sort, which
needs every visible Gaussian's tile rect.

For multi-host scenes beyond one chip's HBM this keeps parameter storage and
preprocess FLOPs distributed; binning/compositing currently run replicated
on the gathered screen-space set (a later round can shard tiles too).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from dge_tpu.ops import projection

GAUSS_AXIS = "gauss"


def make_gauss_mesh(n_devices: Optional[int] = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (GAUSS_AXIS,))


def sharded_preprocess(mesh: Mesh, scene, cam, *, scale_modifier: float = 1.0):
    """Run projection.preprocess with the Gaussian axis sharded over the
    mesh; returns fully-replicated Preprocessed outputs (all_gather over
    ICI). scene.capacity must divide the mesh size."""

    def shard_fn(xyz, scale, quat, opac, sh, alive, active_deg):
        prep = projection.preprocess(
            xyz, scale, quat, opac, sh, alive, cam, active_deg,
            scene.max_sh_degree, scale_modifier=scale_modifier,
        )
        return tuple(
            jax.lax.all_gather(x, GAUSS_AXIS, tiled=True) for x in prep
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(GAUSS_AXIS), P(GAUSS_AXIS), P(GAUSS_AXIS), P(GAUSS_AXIS),
            P(GAUSS_AXIS), P(GAUSS_AXIS), P(),
        ),
        out_specs=tuple([P()] * 7),
        check_vma=False,
    )
    out = fn(
        scene.xyz,
        scene.get_scaling,
        scene.get_rotation,
        scene.get_opacity,
        scene.get_features,
        scene.alive,
        scene.active_sh_degree,
    )
    return projection.Preprocessed(*out)
