"""Device mesh construction and camera batching."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dge_tpu.scene.camera_arrays import CameraArrays

VIEW_AXIS = "view"


def make_view_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the view (camera) axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (VIEW_AXIS,))


def stack_cameras(cams: Sequence[CameraArrays]) -> CameraArrays:
    """Stack per-view camera pytrees along a leading batch axis. All cameras
    must share H/W (static fields)."""
    h, w = cams[0].height, cams[0].width
    assert all(c.height == h and c.width == w for c in cams)
    return CameraArrays(
        w2c=jnp.stack([c.w2c for c in cams]),
        full_proj=jnp.stack([c.full_proj for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        tan_half_fovx=jnp.stack([c.tan_half_fovx for c in cams]),
        tan_half_fovy=jnp.stack([c.tan_half_fovy for c in cams]),
        height=h,
        width=w,
    )


def index_cameras(batch: CameraArrays, i) -> CameraArrays:
    """Select view ``i`` from a stacked camera batch."""
    return CameraArrays(
        w2c=batch.w2c[i],
        full_proj=batch.full_proj[i],
        campos=batch.campos[i],
        tan_half_fovx=batch.tan_half_fovx[i],
        tan_half_fovy=batch.tan_half_fovy[i],
        height=batch.height,
        width=batch.width,
    )
