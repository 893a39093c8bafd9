"""Per-Gaussian preprocessing: cull, project, covariance, color.

Vectorized jnp re-implementation of the reference preprocess kernel
(cuda_rasterizer/forward.cu:74-256). Everything is a large batched op over
the padded Gaussian buffer — MXU/VPU friendly, differentiable by XLA autodiff
(no hand-written backward needed; the CUDA chain rules in backward.cu:144-398
fall out of jax.grad).

Conventions:
- ``ndc2pix(v, S) = ((v + 1) S - 1) / 2`` (auxiliary.h:40-43)
- near-cull at view z <= 0.2 (auxiliary.h in_frustum)
- EWA low-pass: += 0.3 on cov2D diagonal (forward.cu:110-111)
- radius = ceil(3 sqrt(max eigenvalue)) (forward.cu:229-232)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dge_tpu.ops import sh as sh_ops

NEAR_Z = 0.2


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (padded to capacity)."""

    mean2d: jnp.ndarray  # [N, 2] pixel coords
    depth: jnp.ndarray  # [N] view-space z
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray  # [N] float pixel radius (0 for culled)
    rgb: jnp.ndarray  # [N, 3]
    opacity: jnp.ndarray  # [N]
    visible: jnp.ndarray  # [N] bool


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion(s) to rotation matrices, [... ,4] -> [..., 3, 3].
    Matches build_rotation (general_utils.py:78-98) / computeCov3D
    (forward.cu:133-138)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - r * z),
            2 * (x * z + r * y),
            2 * (x * y + r * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - r * x),
            2 * (x * z - r * y),
            2 * (y * z + r * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def compute_cov3d(
    scale: jnp.ndarray, quat: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """World-space 3D covariance from (activated) scale and normalized quat.

    Sigma = R S S^T R^T (forward.cu:118-152). Returns full [N, 3, 3],
    computed elementwise (Sigma[i,k] = sum_j R[i,j] R[k,j] s_j^2) to avoid
    tiny batched matmuls."""
    R = quat_to_rotmat(quat)
    s2 = (scale_modifier * scale) ** 2  # [N, 3]
    rows = []
    for i in range(3):
        cols = []
        for k in range(3):
            cols.append(
                R[..., i, 0] * R[..., k, 0] * s2[..., 0]
                + R[..., i, 1] * R[..., k, 1] * s2[..., 1]
                + R[..., i, 2] * R[..., k, 2] * s2[..., 2]
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def compute_cov2d(
    p_view: jnp.ndarray,
    cov3d: jnp.ndarray,
    w2c_rot: jnp.ndarray,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
) -> jnp.ndarray:
    """EWA projection of 3D covariance to screen space (forward.cu:74-113).

    p_view: [N,3] view-space means; cov3d: [N,3,3]; w2c_rot: [3,3].
    Returns [N, 3] upper-triangular (a, b, c) with the +0.3 low-pass.

    Fully elementwise over [N] channels — per-Gaussian 2x3x3 matmul chains
    lower to badly-tiled tiny batched dots on TPU; expanding the sparse J
    structure keeps everything on wide VPU lanes."""
    tz = p_view[:, 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    # rows of T = J @ W with J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    w0 = w2c_rot[0]
    w1 = w2c_rot[1]
    w2 = w2c_rot[2]
    c0 = focal_x * inv_z
    c1 = -focal_x * tx * inv_z * inv_z
    d1 = focal_y * inv_z
    d2 = -focal_y * ty * inv_z * inv_z
    # T0[k] = c0 * W[0,k] + c1 * W[2,k];  T1[k] = d1 * W[1,k] + d2 * W[2,k]
    t0 = [c0 * w0[k] + c1 * w2[k] for k in range(3)]  # each [N]
    t1 = [d1 * w1[k] + d2 * w2[k] for k in range(3)]

    # cov2d = T S T^T with symmetric S (cov3d)
    s = [[cov3d[:, i, j] for j in range(3)] for i in range(3)]

    def quad(u, v):
        # u . S . v for row vectors of [N] channels
        acc = 0.0
        for i in range(3):
            si = s[i]
            acc = acc + u[i] * (si[0] * v[0] + si[1] * v[1] + si[2] * v[2])
        return acc

    a = quad(t0, t0) + 0.3
    b = quad(t0, t1)
    c = quad(t1, t1) + 0.3
    return jnp.stack([a, b, c], axis=-1)


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    quat: jnp.ndarray,
    opacity: jnp.ndarray,
    sh: jnp.ndarray,
    alive: jnp.ndarray,
    cam,
    active_sh_degree: jnp.ndarray,
    max_sh_degree: int,
    scale_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
) -> Preprocessed:
    """Full per-Gaussian forward preprocess (forward.cu:156-256).

    All inputs are *activated* parameters. ``override_color`` replaces the
    SH-derived color (reference render override_color,
    gaussian_renderer/__init__.py:126-127, used for semantic mask renders).
    """
    n = xyz.shape[0]
    f32 = jnp.float32
    xyz = xyz.astype(f32)

    # expanded row-sum form instead of [N,4] @ [4,4] matmuls: on TPU the
    # MXU multiplies f32 operands at DEFAULT (bf16-mantissa) precision,
    # which was measured to move depth by up to 3e-2 and flip ~1e-3 of
    # visibility decisions vs true f32 on the 131k bench scene — the
    # per-pixel oracle (and the CUDA reference, forward.cu:189-200) are
    # full f32. The VPU form is exact f32 and times identically (~2 ms
    # preprocess either way, round-4 SoA experiment).
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    w = cam.w2c
    pv0 = x * w[0, 0] + y * w[0, 1] + z * w[0, 2] + w[0, 3]
    pv1 = x * w[1, 0] + y * w[1, 1] + z * w[1, 2] + w[1, 3]
    depth = x * w[2, 0] + y * w[2, 1] + z * w[2, 2] + w[2, 3]
    in_front = depth > NEAR_Z

    fp = cam.full_proj
    ph0 = x * fp[0, 0] + y * fp[0, 1] + z * fp[0, 2] + fp[0, 3]
    ph1 = x * fp[1, 0] + y * fp[1, 1] + z * fp[1, 2] + fp[1, 3]
    ph3 = x * fp[3, 0] + y * fp[3, 1] + z * fp[3, 2] + fp[3, 3]
    p_w = 1.0 / (ph3 + 1e-7)

    cov3d = compute_cov3d(scale, quat, scale_modifier)
    # guard z for culled points to keep math finite
    safe_view = jnp.stack(
        [pv0, pv1, jnp.where(in_front, depth, 1.0)], axis=-1
    )
    cov2d = compute_cov2d(
        safe_view,
        cov3d,
        cam.w2c[:3, :3],
        cam.focal_x,
        cam.focal_y,
        cam.tan_half_fovx,
        cam.tan_half_fovy,
    )
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_ok = det > 0.0
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))

    mean2d = jnp.stack(
        [ndc2pix(ph0 * p_w, cam.width), ndc2pix(ph1 * p_w, cam.height)],
        axis=-1,
    )
    on_screen = (
        (mean2d[:, 0] + radius > 0)
        & (mean2d[:, 0] - radius < cam.width)
        & (mean2d[:, 1] + radius > 0)
        & (mean2d[:, 1] - radius < cam.height)
    )
    visible = alive & in_front & det_ok & on_screen

    if override_color is not None:
        rgb = override_color.astype(f32)
    else:
        dirs = xyz - cam.campos[None, :]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        rgb, _ = sh_ops.eval_sh_color(sh, dirs, active_sh_degree, max_sh_degree)

    radius = jnp.where(visible, radius, 0.0)
    return Preprocessed(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        radius=radius,
        rgb=rgb,
        opacity=opacity.reshape(n),
        visible=visible,
    )
