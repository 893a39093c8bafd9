"""GaussianScene — the core 3DGS parameter pytree.

TPU-first redesign of the reference GaussianModel
(gaussiansplatting/scene/gaussian_model.py): instead of dynamically growing
torch parameters with optimizer-state surgery, parameters live in
fixed-capacity padded buffers with an ``alive`` mask. Densify/prune become
masked writes into free slots, so every train step has static shapes and jits
once; capacity grows host-side (re-jit) only when occupancy crosses a
threshold.

Parameterization matches the reference exactly (gaussian_model.py:42-57):
  scaling stored as log (activation exp), opacity as logit (sigmoid),
  rotation as unnormalized wxyz quaternion (normalize), SH features split
  into DC + rest.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dge_tpu.scene import ply as ply_io

# Trainable leaf names, in reference optimizer-group order
# (gaussian_model.py:346-357: xyz, f_dc, f_rest, opacity, scaling, rotation).
PARAM_NAMES = ("xyz", "features_dc", "features_rest", "opacity", "scaling", "rotation")


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@struct.dataclass
class GaussianScene:
    """Padded 3DGS parameter buffers. ``capacity`` rows; rows with
    ``alive == False`` are ignored by every kernel."""

    xyz: jnp.ndarray  # [Np, 3]
    features_dc: jnp.ndarray  # [Np, 1, 3] SH DC coefficients
    features_rest: jnp.ndarray  # [Np, K-1, 3] higher-order SH
    opacity: jnp.ndarray  # [Np, 1] logit
    scaling: jnp.ndarray  # [Np, 3] log-scale
    rotation: jnp.ndarray  # [Np, 4] wxyz quaternion (unnormalized)
    alive: jnp.ndarray  # [Np] bool
    grad_mask: jnp.ndarray  # [Np] f32; 1 = editable (local-edit masking)
    generation: jnp.ndarray  # [Np] int32 densify generation tag
    active_sh_degree: jnp.ndarray  # scalar int32 (traced; bands above are zeroed)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ---- derived ----
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    # ---- activations (gaussian_model.py:42-57, 206-268) ----
    @property
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jnp.ndarray:
        q = self.rotation
        return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)

    @property
    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    @property
    def get_features(self) -> jnp.ndarray:
        """[Np, K, 3] full SH coefficient stack."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    # ---- trainable param pytree ----
    def params(self) -> Dict[str, jnp.ndarray]:
        return {k: getattr(self, k) for k in PARAM_NAMES}

    def with_params(self, params: Dict[str, jnp.ndarray]) -> "GaussianScene":
        return self.replace(**params)

    def one_up_sh_degree(self) -> "GaussianScene":
        """Reference oneupSHdegree (gaussian_model.py:270-272)."""
        return self.replace(
            active_sh_degree=jnp.minimum(self.active_sh_degree + 1, self.max_sh_degree)
        )


def _pad(arr: np.ndarray, capacity: int, fill=0.0) -> np.ndarray:
    n = arr.shape[0]
    if n > capacity:
        raise ValueError(f"capacity {capacity} < {n} points")
    pad = np.full((capacity - n,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def round_capacity(n: int, multiple: int = 4096) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def from_arrays(
    xyz: np.ndarray,
    features_dc: np.ndarray,
    features_rest: np.ndarray,
    opacity: np.ndarray,
    scaling: np.ndarray,
    rotation: np.ndarray,
    max_sh_degree: int,
    capacity: Optional[int] = None,
    active_sh_degree: Optional[int] = None,
) -> GaussianScene:
    n = xyz.shape[0]
    cap = capacity or round_capacity(n)
    alive = np.zeros(cap, dtype=bool)
    alive[:n] = True
    k_rest = (max_sh_degree + 1) ** 2 - 1
    if features_rest.shape[1] != k_rest:
        fr = np.zeros((n, k_rest, 3), dtype=np.float32)
        fr[:, : features_rest.shape[1]] = features_rest
        features_rest = fr
    # Dead-slot safe defaults: identity quat so activations stay finite.
    rot_pad = np.zeros((cap, 4), dtype=np.float32)
    rot_pad[:, 0] = 1.0
    rot_pad[:n] = rotation
    return GaussianScene(
        xyz=jnp.asarray(_pad(xyz.astype(np.float32), cap)),
        features_dc=jnp.asarray(_pad(features_dc.astype(np.float32), cap)),
        features_rest=jnp.asarray(_pad(features_rest.astype(np.float32), cap)),
        opacity=jnp.asarray(_pad(opacity.astype(np.float32), cap, fill=-10.0)),
        scaling=jnp.asarray(_pad(scaling.astype(np.float32), cap, fill=-20.0)),
        rotation=jnp.asarray(rot_pad),
        alive=jnp.asarray(alive),
        grad_mask=jnp.asarray(alive.astype(np.float32)),
        generation=jnp.zeros(cap, dtype=jnp.int32),
        active_sh_degree=jnp.asarray(
            max_sh_degree if active_sh_degree is None else active_sh_degree, jnp.int32
        ),
        max_sh_degree=max_sh_degree,
    )


def load_ply(
    path: str, capacity: Optional[int] = None, sh_degree: Optional[int] = None
) -> GaussianScene:
    """Load a pretrained 3DGS PLY (reference load_ply,
    gaussian_model.py:455-551; active_sh_degree = max on load)."""
    raw = ply_io.load_gaussian_ply(path)
    deg = raw["max_sh_degree"] if sh_degree is None else sh_degree
    return from_arrays(
        raw["xyz"],
        raw["features_dc"],
        raw["features_rest"][:, : (deg + 1) ** 2 - 1],
        raw["opacity"],
        raw["scaling"],
        raw["rotation"],
        max_sh_degree=deg,
        capacity=capacity,
        active_sh_degree=deg,
    )


def save_ply(scene: GaussianScene, path: str) -> None:
    """Save alive Gaussians in the reference byte layout
    (gaussian_model.py:410-445)."""
    alive = np.asarray(scene.alive)
    ply_io.save_gaussian_ply(
        path,
        np.asarray(scene.xyz)[alive],
        np.asarray(scene.features_dc)[alive],
        np.asarray(scene.features_rest)[alive],
        np.asarray(scene.opacity)[alive],
        np.asarray(scene.scaling)[alive],
        np.asarray(scene.rotation)[alive],
    )


def mean_sq_dist_to_3nn(points: np.ndarray) -> np.ndarray:
    """Mean squared distance to the 3 nearest neighbors per point.

    Reference analog: simple-knn distCUDA2 (simple_knn.cu:185-218), used to
    initialize Gaussian scales at create_from_pcd (gaussian_model.py:288-291).
    Uses the native grid-hash KNN (dge_tpu/native.py) with a scipy KDTree
    fallback."""
    from dge_tpu.native import knn_mean_sq_dist

    return knn_mean_sq_dist(np.asarray(points, np.float32), k=3)


def rgb_to_sh(rgb: np.ndarray) -> np.ndarray:
    """RGB2SH (utils/sh_utils.py:112-113): C0-normalized DC coefficient."""
    return (rgb - 0.5) / 0.28209479177387814


def sh_to_rgb(sh: np.ndarray) -> np.ndarray:
    return sh * 0.28209479177387814 + 0.5


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    max_sh_degree: int = 3,
    capacity: Optional[int] = None,
) -> GaussianScene:
    """Initialize from a colored point cloud (reference create_from_pcd,
    gaussian_model.py:274-334): scales from 3-NN mean sq distance, opacity
    0.1, identity rotation, DC-only color."""
    n = points.shape[0]
    dist2 = np.maximum(mean_sq_dist_to_3nn(points.astype(np.float64)), 1e-7)
    scaling = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1).astype(np.float32)
    rotation = np.zeros((n, 4), dtype=np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full((n, 1), np.log(0.1 / 0.9), dtype=np.float32)
    features_dc = rgb_to_sh(colors.astype(np.float32)).reshape(n, 1, 3)
    features_rest = np.zeros((n, (max_sh_degree + 1) ** 2 - 1, 3), dtype=np.float32)
    return from_arrays(
        points.astype(np.float32),
        features_dc,
        features_rest,
        opacity,
        scaling,
        rotation,
        max_sh_degree=max_sh_degree,
        capacity=capacity,
        active_sh_degree=0,
    )
