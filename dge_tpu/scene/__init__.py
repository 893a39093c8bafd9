from dge_tpu.scene.cameras import (
    Camera,
    focal2fov,
    fov2focal,
    look_at_camera,
    projection_matrix,
    qvec2rotmat,
    rotmat2qvec,
    world_to_view,
)
from dge_tpu.scene.gaussians import (
    GaussianScene,
    create_from_pcd,
    from_arrays,
    load_ply,
    rgb_to_sh,
    save_ply,
    sh_to_rgb,
)

__all__ = [
    "Camera",
    "GaussianScene",
    "create_from_pcd",
    "focal2fov",
    "fov2focal",
    "from_arrays",
    "load_ply",
    "look_at_camera",
    "projection_matrix",
    "qvec2rotmat",
    "rgb_to_sh",
    "rotmat2qvec",
    "save_ply",
    "sh_to_rgb",
    "world_to_view",
]
