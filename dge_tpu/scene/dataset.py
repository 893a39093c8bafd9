"""Scene dataset: COLMAP capture -> camera list + scene extent.

Reference analogs: CamScene (gaussiansplatting/scene/camera_scene.py:17-42),
readColmapCameras_hw with its aspect-preserving FoV rescale
(dataset_readers.py:69-122), getNerfppNorm camera-extent estimate
(dataset_readers.py:46-67), and the gs-load data module's view subsetting
(threestudio/data/gs_load.py:212-297).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from dge_tpu.scene import colmap
from dge_tpu.scene.cameras import Camera, focal2fov, fov2focal, qvec2rotmat


def nerfpp_norm(cameras: Sequence[Camera]) -> dict:
    """Camera-extent estimate (getNerfppNorm, dataset_readers.py:46-67):
    radius = 1.1 * max distance from the mean camera center."""
    centers = np.stack([c.camera_center for c in cameras], axis=0)
    center = centers.mean(axis=0)
    diag = np.linalg.norm(centers - center, axis=1).max()
    return {"translate": -center, "radius": float(diag * 1.1)}


def _fovs_for_target(intr: colmap.ColmapCamera, height: int, width: int):
    """Aspect-preserving FoV rescale (readColmapCameras_hw,
    dataset_readers.py:88-112)."""
    oh, ow = intr.height, intr.width
    origin_aspect = oh / ow
    aspect = height / width
    if intr.model == "SIMPLE_PINHOLE":
        f = intr.params[0]
        return focal2fov(f, width), focal2fov(f, height)
    if intr.model == "PINHOLE":
        fx, fy = intr.params[0], intr.params[1]
    elif intr.model in ("SIMPLE_RADIAL", "RADIAL"):
        fx = fy = intr.params[0]
    else:
        raise ValueError(
            f"COLMAP camera model {intr.model} not supported (undistort first)"
        )
    if origin_aspect > aspect:  # shrink height
        fovy = focal2fov(fy, ow * aspect)
        fovx = focal2fov(fx, ow)
    else:  # shrink width
        fovy = focal2fov(fy, oh)
        fovx = focal2fov(fx, oh / aspect)
    return fovx, fovy


class ColmapScene:
    """Cameras + extent from a COLMAP capture directory (CamScene analog)."""

    def __init__(
        self,
        source_path: str,
        height: int = 512,
        width: int = 512,
        images_dir: str = "images",
    ):
        sparse = os.path.join(source_path, "sparse", "0")
        if not os.path.isdir(sparse):
            sparse = os.path.join(source_path, "sparse")
        if not os.path.isdir(sparse):
            raise FileNotFoundError(f"no COLMAP sparse dir under {source_path}")
        cams, images = colmap.load_sparse(sparse)

        cameras: List[Camera] = []
        for uid, key in enumerate(sorted(images, key=lambda k: images[k].name)):
            im = images[key]
            intr = cams[im.camera_id]
            fovx, fovy = _fovs_for_target(intr, height, width)
            cameras.append(
                Camera(
                    R=qvec2rotmat(im.qvec).T,
                    T=im.tvec,
                    fovx=fovx,
                    fovy=fovy,
                    height=height,
                    width=width,
                    uid=uid,
                    colmap_id=im.id,
                    image_name=os.path.splitext(os.path.basename(im.name))[0],
                )
            )
        self.cameras = cameras
        norm = nerfpp_norm(cameras)
        self.cameras_extent = norm["radius"]
        self.source_path = source_path
        self.images_dir = os.path.join(source_path, images_dir)

    def point_cloud(self) -> Tuple[np.ndarray, np.ndarray]:
        sparse = os.path.join(self.source_path, "sparse", "0")
        if not os.path.isdir(sparse):
            sparse = os.path.join(self.source_path, "sparse")
        pb = os.path.join(sparse, "points3D.bin")
        if os.path.exists(pb):
            return colmap.read_points3d_binary(pb)
        return colmap.read_points3d_text(os.path.join(sparse, "points3D.txt"))


class BlenderScene:
    """NeRF-synthetic (Blender) loader: transforms_{split}.json with
    camera_angle_x + c2w frames (reference readNerfSyntheticInfo /
    readCamerasFromTransforms, dataset_readers.py:199-359). Blender c2w uses
    OpenGL axes (y up, z back); converted to the COLMAP convention here."""

    def __init__(
        self,
        source_path: str,
        split: str = "train",
        height: int = 800,
        width: int = 800,
    ):
        import json

        path = os.path.join(source_path, f"transforms_{split}.json")
        with open(path) as f:
            meta = json.load(f)
        fovx = float(meta["camera_angle_x"])
        cameras: List[Camera] = []
        self.image_paths: List[str] = []
        for uid, frame in enumerate(meta["frames"]):
            c2w = np.array(frame["transform_matrix"], dtype=np.float64)
            # OpenGL -> COLMAP: flip y and z axes of the camera frame
            c2w[:3, 1:3] *= -1
            w2c = np.linalg.inv(c2w)
            R = w2c[:3, :3].T  # camera-to-world rotation, reference layout
            T = w2c[:3, 3]
            fovy = focal2fov(fov2focal(fovx, width), height)
            cameras.append(
                Camera(
                    R=R, T=T, fovx=fovx, fovy=fovy, height=height, width=width,
                    uid=uid, image_name=os.path.basename(frame["file_path"]),
                )
            )
            self.image_paths.append(
                os.path.join(source_path, frame["file_path"])
            )
        self.cameras = cameras
        self.cameras_extent = nerfpp_norm(cameras)["radius"]
        self.source_path = source_path


def load_scene(source_path: str, height: int = 512, width: int = 512):
    """Dispatch on capture type (sceneLoadTypeCallbacks analog,
    dataset_readers.py:361-365): COLMAP `sparse/` or Blender
    `transforms_train.json`."""
    if os.path.isdir(os.path.join(source_path, "sparse")):
        return ColmapScene(source_path, height=height, width=width)
    if os.path.exists(os.path.join(source_path, "transforms_train.json")):
        return BlenderScene(source_path, height=height, width=width)
    raise FileNotFoundError(f"unrecognized scene type at {source_path}")


def subsample_views(
    cameras: Sequence[Camera], max_views: int, seed: int = 0
) -> List[Camera]:
    """Pick an evenly-spread subset of at most ``max_views`` cameras
    (gs_load.py max_view_num=20 semantics)."""
    n = len(cameras)
    if n <= max_views:
        return list(cameras)
    idx = np.linspace(0, n - 1, max_views).round().astype(int)
    return [cameras[i] for i in idx]


def sort_cameras_ring(cameras: Sequence[Camera]) -> List[int]:
    """Order cameras around the scene by signed angle from the leftmost
    camera's forward axis — DGE's ring ordering for coherent multi-view
    editing (DGE.sort_the_cameras_idx, threestudio/systems/DGE.py:588-600)."""
    centers = np.stack([c.camera_center for c in cameras], axis=0)
    mean = centers.mean(axis=0)
    rel = centers - mean
    # project onto the dominant plane of camera positions
    _, _, vt = np.linalg.svd(rel - rel.mean(0, keepdims=True), full_matrices=False)
    basis = vt[:2]  # two principal directions
    uv = rel @ basis.T
    ang = np.arctan2(uv[:, 1], uv[:, 0])
    return list(np.argsort(ang))
