"""Benchmark driver over scene lists.

Reference analog: gaussiansplatting/full_eval.py:15-18 — runs
train/render/metrics over the MipNeRF360 / Tanks&Temples / DeepBlending
scene lists — and gaussiansplatting/metrics.py:71-86, which reports
PSNR / SSIM / LPIPS(vgg) per view and scene mean. Here: for each
(ply, capture) pair, render all views and write metrics.json (with all
three metrics) against the captured images.

Usage:
  python tools/full_eval.py --pairs scene1.ply:capture1 scene2.ply:capture2
  python tools/full_eval.py --mipnerf360 /data/m360 --models /out \
      # expands the standard scene lists: capture=<dir>/<scene>,
      # ply=<models>/<scene>/point_cloud/iteration_30000/point_cloud.ply
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


def expand_scene_lists(args):
    """Expand --mipnerf360/--tanksandtemples/--deepblending dirs into
    ply:capture pairs using the reference's directory conventions
    (full_eval.py:15-18 scene lists; 3DGS output layout)."""
    pairs = []
    for root, scenes in (
        (args.mipnerf360, MIPNERF360_OUTDOOR + MIPNERF360_INDOOR),
        (args.tanksandtemples, TANKS_AND_TEMPLES),
        (args.deepblending, DEEP_BLENDING),
    ):
        if not root:
            continue
        for scene in scenes:
            capture = os.path.join(root, scene)
            if not os.path.isdir(capture):
                print(f"skipping {scene}: no capture at {capture}")
                continue
            ply = os.path.join(
                args.models or root, scene, "point_cloud",
                f"iteration_{args.iteration}", "point_cloud.ply",
            )
            if not os.path.exists(ply):
                print(f"skipping {scene}: no PLY at {ply}")
                continue
            pairs.append(f"{ply}:{capture}")
    return pairs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", nargs="*", default=[],
                   help="ply:capture_dir pairs")
    p.add_argument("--mipnerf360", default=None,
                   help="MipNeRF360 dataset root (expands the scene list)")
    p.add_argument("--tanksandtemples", default=None)
    p.add_argument("--deepblending", default=None)
    p.add_argument("--models", default=None,
                   help="trained-model root for scene-list expansion")
    p.add_argument("--iteration", type=int, default=30000)
    p.add_argument("--out", default="eval_out")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--vgg_checkpoint", default=None,
                   help="torchvision VGG16 state dict for calibrated LPIPS")
    p.add_argument("--no_lpips", action="store_true")
    args = p.parse_args(argv)

    pairs = list(args.pairs) + expand_scene_lists(args)
    if not pairs:
        p.error("no scenes: pass --pairs or a dataset root")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dge_tpu.ops import losses as L
    from dge_tpu.ops import render as R
    from dge_tpu.scene import dataset as DS
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene.camera_arrays import CameraArrays
    from dge_tpu.utils import saving

    lpips_fn = None
    if not args.no_lpips:
        from dge_tpu.models.lpips import make_perceptual_fn

        lpips_params = None
        if args.vgg_checkpoint and os.path.exists(args.vgg_checkpoint):
            import torch

            from dge_tpu.diffusion.weights import convert_vgg16_torchvision

            sd = torch.load(args.vgg_checkpoint, map_location="cpu",
                            weights_only=True)
            base = make_perceptual_fn()[1]
            lpips_params = dict(base)
            lpips_params["vgg"] = convert_vgg16_torchvision(sd)
        lpips_fn, _ = make_perceptual_fn(params=lpips_params)
        if lpips_params is None:
            print("LPIPS: no VGG checkpoint — using random-init features "
                  "(structural distance, not calibrated LPIPS)")

    results = {}
    for pair in pairs:
        ply, capture = pair.split(":")
        name = os.path.basename(capture.rstrip("/"))
        scene = G.load_ply(ply)
        cs = DS.ColmapScene(capture, height=args.height, width=args.width)
        bg = jnp.zeros(3)

        # evaluation must not truncate: a FitLoop-trained scene may need
        # caps the defaults don't cover (training grows them adaptively;
        # hit in practice — a 6k-step fit evaluated 6 dB below its train
        # PSNR because eval silently spilled the big Gaussians training
        # kept). SpillFreeRenderer probes the first camera and doubles
        # every cap together until spill == 0, re-growing on any denser
        # later view (ops/render.py; previously inlined here).
        renderer = R.SpillFreeRenderer(
            scene, bg, tile_px=32,
            log=lambda m: print(f"[full_eval] {m}", flush=True),
        )
        residual = renderer.probe(CameraArrays.from_camera(cs.cameras[0]))
        if residual:
            print(
                f"[full_eval] WARNING: cap-growth probe for '{name}' exited "
                f"with spill still nonzero ({residual}) at {renderer.caps} — "
                "the metrics below are computed on TRUNCATED renders",
                file=sys.stderr, flush=True,
            )

        psnrs, ssims, lpipss = [], [], []
        total_spill = 0
        out_dir = os.path.join(args.out, name, "renders")
        for cam in cs.cameras:
            ca = CameraArrays.from_camera(cam)
            # a denser view than the probe camera can still spill —
            # SpillFreeRenderer grows and re-renders it rather than
            # scoring a truncated frame (ADVICE r3)
            img, sp = renderer(ca)
            if int(sp) > 0:
                print(
                    f"[full_eval] WARNING: view {cam.image_name} still "
                    f"spills {int(sp)} after re-probing — scored truncated",
                    file=sys.stderr, flush=True,
                )
            total_spill += int(sp)
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
                if lpips_fn is not None:
                    lpipss.append(float(lpips_fn(img, gt)))
        results[name] = {
            "psnr": float(np.mean(psnrs)) if psnrs else None,
            "ssim": float(np.mean(ssims)) if ssims else None,
            "lpips": float(np.mean(lpipss)) if lpipss else None,
            "n_views": len(cs.cameras),
            "n_gaussians": int(scene.n_alive),
            "spill": total_spill,  # nonzero = some view still truncated
        }
        print(name, results[name], flush=True)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
