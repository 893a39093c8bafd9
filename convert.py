"""COLMAP SfM conversion: raw images -> undistorted images + sparse model.

Reference analog: /root/reference/gaussiansplatting/convert.py (the MipNeRF-360
converter script): COLMAP feature_extractor -> exhaustive_matcher -> mapper ->
image_undistorter, then the sparse/ relayout and optional 1/2, 1/4, 1/8 image
pyramids. Differences from the reference:

- subprocess instead of os.system (exit codes, no shell quoting bugs)
- the image pyramid is built with PIL (always in this environment) instead of
  shelling out to ImageMagick
- a missing `colmap` binary fails up front with an actionable message instead
  of four cryptic stage failures

Expected input layout (same as the reference): <source_path>/input/*.jpg
Output layout consumed by dge_tpu.scene.colmap.load_colmap_scene:
<source_path>/{images, sparse/0/{cameras,images,points3D}.bin}
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def _run(name: str, cmd: list) -> None:
    print(f"[convert] {name}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd)
    if proc.returncode != 0:
        sys.exit(f"[convert] {name} failed with code {proc.returncode}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("COLMAP converter")
    ap.add_argument("--source_path", "-s", required=True)
    ap.add_argument("--camera", default="OPENCV")
    ap.add_argument("--colmap_executable", default="colmap")
    ap.add_argument("--no_gpu", action="store_true")
    ap.add_argument("--skip_matching", action="store_true")
    ap.add_argument("--resize", action="store_true",
                    help="also write images_2/, images_4/, images_8/ pyramids")
    args = ap.parse_args(argv)

    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        sys.exit(
            f"[convert] COLMAP binary {colmap!r} not found on PATH. This "
            "tool drives COLMAP's SfM pipeline and cannot run without it; "
            "install COLMAP (https://colmap.github.io) or pass "
            "--colmap_executable. If you already have a reconstructed "
            "scene (sparse/0 + images/), skip conversion entirely — "
            "launch.py consumes that layout directly."
        )

    src = args.source_path
    use_gpu = "0" if args.no_gpu else "1"
    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        db = os.path.join(src, "distorted", "database.db")
        _run("feature extraction", [
            colmap, "feature_extractor",
            "--database_path", db,
            "--image_path", os.path.join(src, "input"),
            "--ImageReader.single_camera", "1",
            "--ImageReader.camera_model", args.camera,
            "--SiftExtraction.use_gpu", use_gpu,
        ])
        _run("feature matching", [
            colmap, "exhaustive_matcher",
            "--database_path", db,
            "--SiftMatching.use_gpu", use_gpu,
        ])
        _run("mapper", [
            colmap, "mapper",
            "--database_path", db,
            "--image_path", os.path.join(src, "input"),
            "--output_path", os.path.join(src, "distorted", "sparse"),
            "--Mapper.ba_global_function_tolerance=0.000001",
        ])

    _run("image undistortion", [
        colmap, "image_undistorter",
        "--image_path", os.path.join(src, "input"),
        "--input_path", os.path.join(src, "distorted", "sparse", "0"),
        "--output_path", src,
        "--output_type", "COLMAP",
    ])

    # relayout: sparse/* -> sparse/0/* (the loader expects sparse/0)
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f != "0":
            shutil.move(os.path.join(sparse, f), os.path.join(sparse, "0", f))

    if args.resize:
        from PIL import Image

        images = os.path.join(src, "images")
        for denom in (2, 4, 8):
            out_dir = os.path.join(src, f"images_{denom}")
            os.makedirs(out_dir, exist_ok=True)
            for f in os.listdir(images):
                with Image.open(os.path.join(images, f)) as im:
                    im.resize(
                        (im.width // denom, im.height // denom),
                        Image.LANCZOS,
                    ).save(os.path.join(out_dir, f))
            print(f"[convert] wrote {out_dir}", flush=True)

    print("[convert] done")


if __name__ == "__main__":
    main()
