"""Jit-friendly camera pytree used by the rasterizer and guidance."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CameraArrays:
    """Device-side camera. H/W are static (shape-determining); matrices use
    the standard column-vector convention (see scene/cameras.py docstring)."""

    w2c: jnp.ndarray  # [4,4] world-to-camera
    full_proj: jnp.ndarray  # [4,4] proj @ w2c
    campos: jnp.ndarray  # [3] camera center in world
    tan_half_fovx: jnp.ndarray  # scalar
    tan_half_fovy: jnp.ndarray  # scalar
    height: int = struct.field(pytree_node=False, default=512)
    width: int = struct.field(pytree_node=False, default=512)

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tan_half_fovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tan_half_fovy)

    @classmethod
    def from_camera(cls, cam) -> "CameraArrays":
        return cls(
            w2c=jnp.asarray(cam.w2c, jnp.float32),
            full_proj=jnp.asarray(cam.full_proj, jnp.float32),
            campos=jnp.asarray(cam.camera_center, jnp.float32),
            tan_half_fovx=jnp.asarray(cam.tan_half_fovx, jnp.float32),
            tan_half_fovy=jnp.asarray(cam.tan_half_fovy, jnp.float32),
            height=int(cam.height),
            width=int(cam.width),
        )

    def pixel_projection(self) -> jnp.ndarray:
        """3x4 pixel-space projection (for fundamental matrices), the traced
        analog of Camera.pixel_projection."""
        ndc2pix = jnp.array(
            [
                [self.width / 2.0, 0.0, self.width / 2.0],
                [0.0, self.height / 2.0, self.height / 2.0],
                [0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )
        return ndc2pix @ self.full_proj[jnp.array([0, 1, 3]), :]
