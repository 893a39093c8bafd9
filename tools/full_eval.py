"""Benchmark driver over scene lists.

Reference analog: gaussiansplatting/full_eval.py:15-18 — runs
train/render/metrics over the MipNeRF360 / Tanks&Temples / DeepBlending
scene lists. Here: for each (ply, capture) pair, render all views and write
metrics.json against the captured images.

Usage:
  python tools/full_eval.py --pairs scene1.ply:capture1 scene2.ply:capture2 \
      --out results/
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MIPNERF360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
MIPNERF360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TANKS_AND_TEMPLES = ["truck", "train"]
DEEP_BLENDING = ["drjohnson", "playroom"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", nargs="+", required=True,
                   help="ply:capture_dir pairs")
    p.add_argument("--out", default="eval_out")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dge_tpu.ops import losses as L
    from dge_tpu.ops import render as R
    from dge_tpu.scene import dataset as DS
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene.camera_arrays import CameraArrays
    from dge_tpu.utils import saving

    results = {}
    for pair in args.pairs:
        ply, capture = pair.split(":")
        name = os.path.basename(capture.rstrip("/"))
        scene = G.load_ply(ply)
        cs = DS.ColmapScene(capture, height=args.height, width=args.width)
        bg = jnp.zeros(3)
        fwd = jax.jit(
            lambda s, c: R.render(s, c, bg, tile_px=32, max_per_tile=4096).color
        )
        psnrs, ssims = [], []
        out_dir = os.path.join(args.out, name, "renders")
        for cam in cs.cameras:
            img = fwd(scene, CameraArrays.from_camera(cam))
            saving.save_image(
                os.path.join(out_dir, cam.image_name + ".png"), np.asarray(img)
            )
            gt_path = None
            for ext in (".png", ".jpg", ".JPG", ".jpeg"):
                cand = os.path.join(cs.images_dir, cam.image_name + ext)
                if os.path.exists(cand):
                    gt_path = cand
                    break
            if gt_path:
                gt = jnp.asarray(
                    saving.load_image(gt_path, size=(args.height, args.width))
                )
                psnrs.append(float(L.psnr(img, gt)))
                ssims.append(float(L.ssim(img, gt)))
        results[name] = {
            "psnr": float(np.mean(psnrs)) if psnrs else None,
            "ssim": float(np.mean(ssims)) if ssims else None,
            "n_views": len(cs.cameras),
            "n_gaussians": int(scene.n_alive),
        }
        print(name, results[name], flush=True)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
