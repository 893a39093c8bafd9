"""Epipolar geometry for cross-view attention constraints.

Reference analogs:
- fundamental_from_projections — determinant-of-stacked-rows formula
  (gaussiansplatting/utils/graphics_utils.py:134-182, after Hartley &
  Zisserman eq. 17.3)
- get_fundamental_matrix_with_H — pixel-space 3x4 projections built by
  dropping the z row of full_proj and composing NDC->pixel
  (graphics_utils.py:353-369)
- compute_epipolar_constrains / point_to_line_dist — per-pixel epipolar-line
  distance, violation at > 1 px (threestudio/utils/dge_utils.py:61-71,
  154-187)

The convention: F satisfies x2^T F x1 = 0 for pixel coords x1 in cam1 and x2
in cam2. ``violation_mask[i, j]`` is True when cam1 pixel j is farther than
``threshold`` px from the epipolar line of cam2 pixel i.

TPU note: the dense S^2 bool mask is only materialized for small latent
resolutions; ``epipolar_distances`` exposes the underlying distance compute
so attention kernels can evaluate the constraint blockwise on the fly
instead of holding 4096x4096 masks (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fundamental_from_projections(P1: jnp.ndarray, P2: jnp.ndarray) -> jnp.ndarray:
    """F [..., 3, 3] from pixel-space projections [..., 3, 4] such that
    x2^T F x1 = 0."""

    def det4(rows_a, rows_b):
        m = jnp.concatenate([rows_a, rows_b], axis=-2)  # [..., 4, 4]
        return jnp.linalg.det(m)

    x = [
        P1[..., 1:3, :],  # rows (1,2)
        jnp.concatenate([P1[..., 2:3, :], P1[..., 0:1, :]], axis=-2),  # (2,0)
        P1[..., 0:2, :],  # (0,1)
    ]
    y = [
        P2[..., 1:3, :],
        jnp.concatenate([P2[..., 2:3, :], P2[..., 0:1, :]], axis=-2),
        P2[..., 0:2, :],
    ]
    rows = []
    for yj in y:
        for xi in x:
            rows.append(det4(xi, yj))
    F = jnp.stack(rows, axis=-1).reshape(P1.shape[:-2] + (3, 3))
    return F


def fundamental_between(cam1, cam2, height: int, width: int) -> jnp.ndarray:
    """get_fundamental_matrix_with_H analog for CameraArrays; height/width
    are the *current* (latent) resolution."""
    def pix_proj(cam):
        ndc2pix = jnp.array(
            [
                [width / 2.0, 0.0, width / 2.0],
                [0.0, height / 2.0, height / 2.0],
                [0.0, 0.0, 1.0],
            ],
            jnp.float32,
        )
        P34 = cam.full_proj[jnp.array([0, 1, 3]), :]
        return ndc2pix @ P34

    return fundamental_from_projections(pix_proj(cam1), pix_proj(cam2))


def _pixel_grid(height: int, width: int) -> jnp.ndarray:
    """Homogeneous pixel coords in raster order (y*W + x), [S, 3]."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([xs.reshape(-1), ys.reshape(-1), jnp.ones(height * width)], axis=1)


def epipolar_distances(
    F: jnp.ndarray, height: int, width: int
) -> jnp.ndarray:
    """[S2, S1] distances from every cam1 pixel to the epipolar line of every
    cam2 pixel (point_to_line_dist, dge_utils.py:61-71).

    Computed as |normalized_line . pt| — the SAME operation order as the
    banded/blockwise path (epipolar_lines + dot), not |line . pt| / norm:
    the two groupings round differently in f32, and a pixel sitting exactly
    on the threshold can then flip between the dense oracle and the banded
    kernel (hit in practice: a tiny-model edit diverged 6e-3 after an
    unrelated model-numerics fix moved a near-tie)."""
    pts = _pixel_grid(height, width)  # [S, 3]
    return jnp.abs(epipolar_lines(F, height, width) @ pts.T)  # [S2, S1]


def epipolar_lines(F: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[S2, 3] *normalized* epipolar-line coefficients in cam1's pixel space,
    one line per cam2 pixel: ``violation(s2, s1) = |lines[s2] . pts[s1]| >
    threshold`` with ``pts`` the homogeneous cam1 pixel grid.

    This is the banded/on-the-fly form of the constraint (SURVEY.md §7 hard
    part 5): 3 floats per query pixel instead of S booleans, so the S x S
    mask never materializes — attention kernels evaluate the distance test
    blockwise over key-token tiles."""
    pts = _pixel_grid(height, width)
    lines = pts @ F  # [S2, 3]
    den = jnp.linalg.norm(lines[:, :2], axis=1, keepdims=True)
    return lines / jnp.maximum(den, 1e-12)


def violation_mask(
    cam1, cam2, height: int, width: int, threshold: float = 1.0
) -> jnp.ndarray:
    """Dense bool [S, S] violation mask (compute_epipolar_constrains,
    dge_utils.py:154-187)."""
    F = fundamental_between(cam1, cam2, height, width)
    return epipolar_distances(F, height, width) > threshold


def camera_distances(cams_a, cams_b) -> jnp.ndarray:
    """Pairwise camera-center distances (compute_camera_distance,
    dge_utils.py:359-367). cams_*.campos: [Na, 3] / [Nb, 3]."""
    a = cams_a if isinstance(cams_a, jnp.ndarray) else cams_a.campos
    b = cams_b if isinstance(cams_b, jnp.ndarray) else cams_b.campos
    return jnp.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
