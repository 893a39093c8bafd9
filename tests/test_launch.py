"""End-to-end launcher tests over a synthetic COLMAP capture + PLY —
exercises the CLI paths (--render, --fit) exactly as a user would."""

import math
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_capture(tmp_path_factory):
    """A COLMAP dir (cameras/images/points3D.bin + rendered images) plus a
    pretrained-style PLY of the same scene."""
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("capture")
    sparse = root / "sparse" / "0"
    os.makedirs(sparse)
    images_dir = root / "images"
    os.makedirs(images_dir)

    from dge_tpu.scene import colmap as CM
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene import look_at_camera, rotmat2qvec
    from dge_tpu.scene.camera_arrays import CameraArrays
    from dge_tpu.ops import render as R
    from dge_tpu.utils import saving

    h = w = 64
    focal = 55.4  # ~60deg fovx at 64px
    cams = {1: CM.ColmapCamera(1, "PINHOLE", w, h, np.array([focal, focal, w / 2, h / 2]))}
    images = {}
    host_cams = []
    n_views = 4
    for i in range(n_views):
        ang = 2 * math.pi * i / n_views
        eye = np.array([3.0 * math.sin(ang), 0.2, -3.0 * math.cos(ang)])
        cam = look_at_camera(eye, np.zeros(3), fovx=math.radians(60), height=h, width=w)
        host_cams.append(cam)
        qvec = rotmat2qvec(cam.R.T)  # w2c rotation back to COLMAP qvec
        images[i + 1] = CM.ColmapImage(i + 1, qvec, cam.T, 1, f"view_{i:02d}.png")
    CM.write_cameras_binary(cams, str(sparse / "cameras.bin"))
    CM.write_images_binary(images, str(sparse / "images.bin"))

    pts = rng.normal(size=(120, 3)).astype(np.float32) * 0.6
    cols = rng.uniform(size=(120, 3)).astype(np.float32)
    CM.write_points3d_binary(pts, cols, str(sparse / "points3D.bin"))

    # scene + target renders as "captured" images
    scene = G.create_from_pcd(pts, cols, max_sh_degree=0)
    scene = scene.replace(opacity=scene.opacity + 2.5)  # more opaque
    import jax.numpy as jnp

    for i, cam in enumerate(host_cams):
        out = R.render(
            scene, CameraArrays.from_camera(cam), jnp.zeros(3),
            tile_px=16, max_per_tile=128,
        )
        saving.save_image(str(images_dir / f"view_{i:02d}.png"),
                          np.asarray(out.color))
    ply = str(root / "scene.ply")
    G.save_ply(scene, ply)
    return {"root": str(root), "ply": ply, "h": h, "w": w}


def test_launch_render(synthetic_capture, tmp_path):
    import launch

    launch.main(
        [
            "--render",
            "--gs_source", synthetic_capture["ply"],
            "--source", synthetic_capture["root"],
            "--out", str(tmp_path),
            "--config", _mini_cfg(tmp_path, synthetic_capture),
        ]
    )
    renders = _find(tmp_path, "renders")
    assert renders is not None
    files = os.listdir(renders)
    assert len([f for f in files if f.endswith(".png")]) == 4


def test_launch_render_matches_capture(synthetic_capture, tmp_path):
    """Rendering the PLY through the COLMAP-loaded cameras reproduces the
    captured images — the config-1 PSNR gate in miniature."""
    import launch
    from dge_tpu.ops import losses as L
    from dge_tpu.utils import saving
    import jax.numpy as jnp

    launch.main(
        [
            "--render",
            "--gs_source", synthetic_capture["ply"],
            "--source", synthetic_capture["root"],
            "--out", str(tmp_path),
            "--config", _mini_cfg(tmp_path, synthetic_capture),
        ]
    )
    renders = _find(tmp_path, "renders")
    img = saving.load_image(os.path.join(renders, "0000.png"))
    gt = saving.load_image(
        os.path.join(synthetic_capture["root"], "images", "view_00.png")
    )
    psnr = float(L.psnr(jnp.asarray(img), jnp.asarray(gt)))
    assert psnr > 30.0, psnr


@pytest.mark.slow
def test_launch_train_smoke(synthetic_capture, tmp_path):
    """The FULL CLI edit path end to end on CPU with tiny models: prompt
    processing, guidance edit round, refit with perceptual loss, edit
    cache, checkpoints, validation artifacts, metrics JSONL."""
    import launch

    cfg = os.path.join(str(tmp_path), "train_cfg.yaml")
    with open(cfg, "w") as f:
        f.write(
            "name: t\ntag: train\n"
            f"data:\n  height: {synthetic_capture['h']}\n"
            f"  width: {synthetic_capture['w']}\n  max_view_num: 4\n"
            "system:\n  model_size: tiny\n  prompt: make it snowy\n"
            "  guidance:\n    camera_batch_size: 2\n    diffusion_steps: 2\n"
            "    resize_target: 64\n"
            "  edit:\n    max_steps: 4\n    camera_update_per_step: 100\n"
            "    densify_from: 1000\n    tile_px: 16\n    max_per_tile: 128\n"
            "    chunk: 16\n    camera_batch_size: 2\n"
        )
    launch.main(
        [
            "--train", "--smoke",
            "--gs_source", synthetic_capture["ply"],
            "--source", synthetic_capture["root"],
            "--out", str(tmp_path),
            "--config", cfg,
        ]
    )
    trial = None
    for dirpath, dirnames, filenames in os.walk(tmp_path):
        if "last.ply" in filenames:
            trial = dirpath
    assert trial is not None
    assert os.path.exists(os.path.join(trial, "SMOKE_ONLY.txt"))
    assert os.path.exists(os.path.join(trial, "metrics.jsonl"))
    assert _find(trial, "val") or any(
        f.startswith("it") for f in os.listdir(os.path.join(trial, "val"))
    )
    assert _find(trial, "ckpts")
    # persistent edit cache exists outside the trial dir
    assert _find(tmp_path, "edit_cache")


def _mini_cfg(tmp_path, cap):
    p = os.path.join(str(tmp_path), "cfg.yaml")
    with open(p, "w") as f:
        f.write(f"name: t\ntag: t\ndata:\n  height: {cap['h']}\n  width: {cap['w']}\n")
    return p


def _find(root, name):
    for dirpath, dirnames, _ in os.walk(root):
        if name in dirnames:
            return os.path.join(dirpath, name)
    return None
