"""CLI launcher for the dge_tpu framework.

Reference analog: /root/reference/launch.py (253 LoC: config load, registry
instantiation, Lightning Trainer, --train/--validate/--test/--export). Here:
plain argparse + YAML + dotted overrides driving the jitted systems — no
Lightning.

Modes:
  --train     full DGE edit (render -> multi-view edit -> refit), then test
  --test      render eval views of a scene/PLY + metrics
  --render    batch-render a pretrained PLY (gaussiansplatting/render.py)
  --fit       vanilla 3DGS fitting against target images (train.py analog)
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np

logging.basicConfig(
    level=logging.INFO, format="[%(levelname)s] %(asctime)s %(message)s"
)
log = logging.getLogger("dge_tpu")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="dge_tpu launcher")
    p.add_argument("--config", type=str, help="experiment YAML")
    mode = p.add_mutually_exclusive_group()
    mode.add_argument("--train", action="store_true")
    mode.add_argument("--test", action="store_true")
    mode.add_argument("--render", action="store_true")
    mode.add_argument("--fit", action="store_true")
    mode.add_argument(
        "--validate", action="store_true",
        help="render every capture view + PSNR/SSIM/LPIPS metrics.json "
        "(reference --validate / gaussiansplatting metrics.py)",
    )
    mode.add_argument(
        "--export", action="store_true",
        help="export artifacts from a PLY: turntable orbit video + a copy "
        "of the scene (the viewer-free --export analog)",
    )
    p.add_argument("--gs_source", type=str, default=None, help="pretrained PLY")
    p.add_argument("--source", type=str, default=None, help="COLMAP scene dir")
    p.add_argument("--out", type=str, default="outputs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument(
        "--resume", type=str, default=None,
        help="checkpoint path (from <trial>/ckpts) to resume --train from "
        "(reference launch.py:189-211)",
    )
    p.add_argument(
        "--distributed", action="store_true",
        help="multi-host: call jax.distributed.initialize() (coordinator "
        "address/process id from the standard JAX env vars or TPU "
        "metadata); the TPU analog of the reference's unused Lightning "
        "DDP scaffolding (SURVEY.md §2.6)",
    )
    p.add_argument(
        "--smoke", action="store_true",
        help="allow --train with random diffusion weights (outputs are noise)",
    )
    p.add_argument(
        "--typecheck", action="store_true",
        help="install the jaxtyping+typeguard runtime shape-check import "
        "hook over dge_tpu (reference launch.py:72-75)",
    )
    p.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.typecheck:
        from jaxtyping import install_import_hook

        # must run before any dge_tpu import in this process
        install_import_hook("dge_tpu", "typeguard.typechecked")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    if args.distributed:
        # idempotent on single host; on a pod each process discovers its
        # coordinator from env/TPU metadata. Host-level orchestration rides
        # DCN, collectives inside shard_map ride ICI.
        jax.distributed.initialize()
        log.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )

    from dge_tpu.utils import config as C

    cfg = C.load_config(args.config, args.overrides) if args.config else {}
    name = cfg.get("name", "dge")
    tag = cfg.get("tag", "run")
    trial_dir = C.make_trial_dir(args.out, name, tag)
    with open(os.path.join(trial_dir, "parsed.yaml"), "w") as f:
        import yaml

        yaml.safe_dump(cfg, f)
    # command + code-revision snapshot (CodeSnapshotCallback /
    # ConfigSnapshotCallback analog, threestudio/utils/callbacks.py:60-111)
    try:
        import subprocess

        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        rev = "unknown"
    with open(os.path.join(trial_dir, "cmd.txt"), "w") as f:
        f.write(" ".join(sys.argv) + f"\ngit: {rev}\n")
    log.info("trial dir: %s", trial_dir)

    gs_source = args.gs_source or cfg.get("system", {}).get("gs_source")
    source = args.source or cfg.get("data", {}).get("source")

    if args.render or args.test:
        run_render(cfg, gs_source, source, trial_dir)
    elif args.validate:
        run_validate(cfg, gs_source, source, trial_dir)
    elif args.export:
        run_export(cfg, gs_source, trial_dir)
    elif args.fit:
        run_fit(cfg, source, trial_dir, args.seed)
    elif args.train:
        run_edit(cfg, gs_source, source, trial_dir, args.seed,
                 smoke=args.smoke, resume=args.resume, out_root=args.out)
    else:
        log.error(
            "choose a mode: --train / --test / --render / --fit / "
            "--validate / --export"
        )
        sys.exit(2)


def _load_scene_and_cameras(gs_source, source, height=512, width=512):
    from dge_tpu.scene import dataset as DS
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene.camera_arrays import CameraArrays

    scene = G.load_ply(gs_source)
    cs = DS.ColmapScene(source, height=height, width=width)
    cams = [CameraArrays.from_camera(c) for c in cs.cameras]
    return scene, cams, cs


def run_render(cfg, gs_source, source, trial_dir):
    """Config-1: render a pretrained PLY for every camera + save frames
    (gaussiansplatting/render.py analog)."""
    import jax
    import jax.numpy as jnp

    from dge_tpu.ops import render as R
    from dge_tpu.utils import saving

    data_cfg = cfg.get("data", {})
    h = int(data_cfg.get("height", 512))
    w = int(data_cfg.get("width", 512))
    scene, cams, cs = _load_scene_and_cameras(gs_source, source, h, w)
    log.info("loaded %d gaussians, %d cameras", int(scene.n_alive), len(cams))

    bg = jnp.zeros(3)
    # eval paths must not truncate: probe-and-grow binning caps until
    # spill == 0 (a FitLoop-trained scene can need caps far above the
    # defaults; previously this path warned and saved truncated frames)
    renderer = R.SpillFreeRenderer(scene, bg, tile_px=32, log=log.info)
    renderer.probe(cams[0])
    out_dir = os.path.join(trial_dir, "renders")
    frames = []
    total_spill = 0
    for i, cam in enumerate(cams):
        color, sp = renderer(cam)
        img = np.asarray(color)
        total_spill += sp
        saving.save_image(os.path.join(out_dir, f"{i:04d}.png"), img)
        frames.append(img)
    if total_spill:
        log.warning(
            "binning still dropped %d (tile, gaussian) pairs after cap "
            "growth — renders are truncated", total_spill,
        )
    saving.save_video(os.path.join(trial_dir, "renders.mp4"), frames)
    log.info("wrote %d renders to %s", len(frames), out_dir)


def run_validate(cfg, gs_source, source, trial_dir):
    """Render every capture view and write PSNR/SSIM/LPIPS metrics.json
    (gaussiansplatting/metrics.py:36-93 analog for one scene)."""
    import tools.full_eval as FE

    FE.main([
        "--pairs", f"{gs_source}:{source}",
        "--out", os.path.join(trial_dir, "eval"),
        "--height", str(cfg.get("data", {}).get("height", 512)),
        "--width", str(cfg.get("data", {}).get("width", 512)),
    ])


def run_export(cfg, gs_source, trial_dir):
    """Artifact export from a PLY: turntable orbit video + scene copy (the
    SIBR-viewer-free --export analog)."""
    import shutil

    import tools.orbit_video as OV

    data_cfg = cfg.get("data", {})
    out_mp4 = os.path.join(trial_dir, "orbit.mp4")
    OV.main([
        gs_source, out_mp4,
        "--height", str(data_cfg.get("height", 512)),
        "--width", str(data_cfg.get("width", 512)),
    ])
    shutil.copy(gs_source, os.path.join(trial_dir, "scene.ply"))
    log.info("exported orbit video + scene.ply to %s", trial_dir)


def run_fit(cfg, source, trial_dir, seed):
    """Config-2: vanilla 3DGS fitting against the capture's images
    (gaussiansplatting/train.py analog)."""
    import jax
    import jax.numpy as jnp

    from dge_tpu.scene import dataset as DS
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene.camera_arrays import CameraArrays
    from dge_tpu.systems import fit as F
    from dge_tpu.systems import optim as O
    from dge_tpu.utils import saving

    data_cfg = cfg.get("data", {})
    h = int(data_cfg.get("height", 512))
    w = int(data_cfg.get("width", 512))
    cs = DS.ColmapScene(source, height=h, width=w)
    pts, cols = cs.point_cloud()
    # sh_degree=3 is the vanilla-3DGS default (train.py); DGE edits fit
    # with sh_degree=0 (DGE.py configure) — configurable for parity
    sh_deg = int(cfg.get("system", {}).get("sh_degree", 3))
    scene = G.create_from_pcd(pts, cols, max_sh_degree=sh_deg)
    cams = [CameraArrays.from_camera(c) for c in cs.cameras]
    targets = [
        jnp.asarray(
            saving.load_image(
                os.path.join(cs.images_dir, c.image_name + ext), size=(h, w)
            )
        )
        for c in cs.cameras
        for ext in [_find_ext(cs.images_dir, c.image_name)]
    ]

    ocfg = O.OptimConfig.scaled(int(cfg.get("trainer", {}).get("max_steps", 7000)))
    loop = F.FitLoop(ocfg, extent=cs.cameras_extent,
                     spatial_lr_scale=cs.cameras_extent)
    opt_state, fit_state = loop.init(scene)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    bg = jnp.zeros(3)
    from dge_tpu.utils.logger import MetricsLogger

    metrics = MetricsLogger(trial_dir, tensorboard=True)
    for step in range(ocfg.max_steps):
        i = int(rng.integers(len(cams)))
        scene, opt_state, fit_state, aux = loop.train_step(
            scene, opt_state, fit_state, cams[i], targets[i], bg
        )
        key, sub = jax.random.split(key)
        scene, opt_state, fit_state, _ = loop.maybe_densify(
            scene, opt_state, fit_state, sub
        )
        scene, opt_state, fit_state = loop.maybe_housekeep(
            scene, opt_state, fit_state
        )
        parts = aux.get("spill_parts")
        if loop.react_to_spill(int(aux["spill"]), scene.capacity,
                               None if parts is None else parts):
            log.warning(
                "step %d: binning spill persisted — grew caps to "
                "max_per_tile=%d max_pairs=%d big_capacity=%d (re-jit)",
                step, loop.max_per_tile, loop.max_pairs, loop.big_capacity,
            )
        if step % 10 == 0:
            metrics.log(step, {
                "train/loss": float(aux["loss"]),
                "train/psnr": float(aux["psnr"]),
                "train/n_alive": int(scene.n_alive),
            })
        if step % 100 == 0:
            log.info(
                "step %d loss %.4f psnr %.2f n=%d",
                step, aux["loss"], aux["psnr"], int(scene.n_alive),
            )
    metrics.close()
    G.save_ply(scene, os.path.join(trial_dir, "point_cloud.ply"))


def _find_ext(d, stem):
    for ext in (".png", ".jpg", ".JPG", ".jpeg"):
        if os.path.exists(os.path.join(d, stem + ext)):
            return ext
    return ".png"


def run_edit(cfg, gs_source, source, trial_dir, seed, smoke=False,
             resume=None, out_root="outputs"):
    """Config-4: the full DGE edit loop."""
    import hashlib

    import jax
    import jax.numpy as jnp

    from dge_tpu.diffusion import ip2p, tokenizer as T
    from dge_tpu.scene import dataset as DS
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene.camera_arrays import CameraArrays
    from dge_tpu.systems.edit import DGESystem, EditConfig
    from dge_tpu.systems.guidance import DGEGuidance, GuidanceConfig
    from dge_tpu.systems.prompts import PromptConfig, PromptProcessor
    from dge_tpu.systems.segmentation import build_segmentor
    from dge_tpu.utils.config import parse_structured

    sys_cfg = cfg.get("system", {})
    data_cfg = cfg.get("data", {})
    h = int(data_cfg.get("height", 512))
    w = int(data_cfg.get("width", 512))
    max_views = int(data_cfg.get("max_view_num", 20))

    scene, cams, cs = _load_scene_and_cameras(gs_source, source, h, w)
    from dge_tpu.scene.dataset import subsample_views

    sub = subsample_views(cs.cameras, max_views)
    cams = [CameraArrays.from_camera(c) for c in sub]

    ckpt_dir = sys_cfg.get("ip2p_checkpoint", None)
    params = None
    if ckpt_dir and os.path.isdir(ckpt_dir):
        from dge_tpu.diffusion.weights import is_ingested, load_ingested, \
            load_ip2p_checkpoint

        if is_ingested(ckpt_dir):
            # orbax cache from tools/ingest_checkpoint.py — no torch needed
            log.info("loading ingested IP2P weights from %s", ckpt_dir)
            params = load_ingested(ckpt_dir)
        else:
            log.info("loading IP2P weights from %s", ckpt_dir)
            params = load_ip2p_checkpoint(ckpt_dir)
    elif smoke or cfg.get("system", {}).get("allow_random_weights", False):
        log.warning(
            "SMOKE RUN: no IP2P checkpoint configured "
            "(system.ip2p_checkpoint) — using RANDOM weights; edits will be "
            "noise. Outputs are marked smoke-only."
        )
        with open(os.path.join(trial_dir, "SMOKE_ONLY.txt"), "w") as f:
            f.write(
                "this trial ran with random diffusion weights — edit "
                "outputs are noise, usable only for pipeline smoke testing\n"
            )
    else:
        log.error(
            "--train needs real diffusion weights: set "
            "system.ip2p_checkpoint to a local diffusers "
            "timbrooks/instruct-pix2pix directory, or pass --smoke to run "
            "the pipeline with random weights (noise output)."
        )
        sys.exit(2)
    # system.model_size="tiny" builds the small test configs — the whole
    # CLI edit path becomes runnable on CPU (e2e tests / smoke)
    if sys_cfg.get("model_size", "full") == "tiny":
        from dge_tpu.models.clip_text import CLIPTextConfig
        from dge_tpu.models.unet import UNetConfig
        from dge_tpu.models.vae import VAEConfig

        text_cfg = CLIPTextConfig.tiny()
        models = ip2p.build_models(
            UNetConfig.tiny(), VAEConfig.tiny(), text_cfg, params=params
        )
        tok = T.HashTokenizer(
            vocab_size=text_cfg.vocab_size, max_length=text_cfg.max_length
        )
    else:
        models = ip2p.build_models(params=params)
        tok = T.load_tokenizer(
            os.path.join(ckpt_dir, "tokenizer") if ckpt_dir else None
        )
        if isinstance(tok, T.HashTokenizer):
            log.warning("no tokenizer vocabulary — HashTokenizer ids are "
                        "meaningless (smoke only)")

    # perceptual loss: always part of the refit objective (DGE.py:637-683);
    # converted VGG16 weights when configured, random-init multi-scale
    # features otherwise (still a usable structural loss)
    from dge_tpu.models.lpips import make_perceptual_fn

    vgg_ckpt = sys_cfg.get("vgg_checkpoint")
    lpips_params = None
    if vgg_ckpt and os.path.exists(vgg_ckpt):
        import torch

        from dge_tpu.diffusion.weights import convert_vgg16_torchvision

        log.info("loading VGG16 weights from %s", vgg_ckpt)
        sd = torch.load(vgg_ckpt, map_location="cpu", weights_only=True)
        lpips_params = {"vgg": convert_vgg16_torchvision(sd)}
        # lin heads keep their default init unless present in the ckpt
    perceptual_fn, _ = make_perceptual_fn(rng=jax.random.PRNGKey(7))
    if lpips_params is not None:
        full = make_perceptual_fn(rng=jax.random.PRNGKey(7))[1]
        full = dict(full)
        full.update(lpips_params)
        perceptual_fn, _ = make_perceptual_fn(params=full)
    pp = PromptProcessor(
        tok,
        lambda ids: ip2p.encode_text(models, jnp.asarray(ids)),
        cache_dir=os.path.join(trial_dir, "text_cache"),
        cfg=PromptConfig(
            prompt=sys_cfg.get("prompt", ""),
            negative_prompt=sys_cfg.get("negative_prompt", ""),
        ),
    )
    po = pp()

    g_cfg = parse_structured(GuidanceConfig, sys_cfg.get("guidance", {}))
    guidance = DGEGuidance(g_cfg, models)

    e_cfg = parse_structured(EditConfig, sys_cfg.get("edit", {}))
    seg = build_segmentor(
        sys_cfg.get("segmentor", "fallback"), sys_cfg.get("mask_dir", "")
    )
    # persistent cross-trial edit cache keyed by (gs_source, prompt, #views)
    # (DGE.py:96-99 cache layout); a re-run with the same key skips the
    # edit rounds entirely unless system.edit.cache_overwrite is set
    cache_key = hashlib.md5(
        f"{os.path.abspath(gs_source)}|{sys_cfg.get('prompt', '')}|"
        f"{len(cams)}".encode()
    ).hexdigest()[:16]
    cache_dir = os.path.join(out_root, "edit_cache", cache_key)
    log.info("edit cache: %s", cache_dir)

    system = DGESystem(
        e_cfg,
        scene,
        cams,
        guidance=guidance,
        text_emb_pos=jnp.asarray(po.cond),
        text_emb_neg=jnp.asarray(po.uncond),
        perceptual_fn=perceptual_fn,
        cameras_extent=cs.cameras_extent,
        cache_dir=cache_dir,
        segmentor=seg,
    )
    start_step = 0
    if resume:
        start_step = system.restore_state(resume)
        log.info("resumed from %s at step %d", resume, start_step)
    from dge_tpu.utils.logger import MetricsLogger

    metrics = MetricsLogger(trial_dir, tensorboard=True)
    final = system.run(
        jax.random.PRNGKey(seed), log_fn=log.info, start_step=start_step,
        ckpt_dir=os.path.join(trial_dir, "ckpts"),
        val_dir=os.path.join(trial_dir, "val"),
        metrics=metrics,
    )
    metrics.close()
    G.save_ply(final, os.path.join(trial_dir, "last.ply"))
    log.info("saved edited scene to %s/last.ply", trial_dir)

    # CLIP edit-quality metrics on the test pass (clip_metrics.py:33-50):
    # similarity of (original, edited) renders to (source, edit) prompts
    _clip_edit_metrics(sys_cfg, system, trial_dir)


def _clip_edit_metrics(sys_cfg, system, trial_dir):
    import jax
    import jax.numpy as jnp

    ckpt = sys_cfg.get("clip_checkpoint")
    if not (ckpt and os.path.isdir(ckpt)):
        log.info(
            "no CLIP checkpoint (system.clip_checkpoint) — skipping CLIP "
            "edit metrics (scores from random towers are meaningless)"
        )
        return
    from dge_tpu.diffusion import tokenizer as T
    from dge_tpu.diffusion.weights import is_ingested, load_clip_checkpoint, \
        load_ingested
    from dge_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from dge_tpu.models.clip_vision import (
        CLIPVisionConfig,
        CLIPVisionModel,
        ClipSimilarity,
    )
    from dge_tpu.utils import saving

    if is_ingested(ckpt):
        params = load_ingested(ckpt)
    else:
        params = load_clip_checkpoint(ckpt)
    vision = CLIPVisionModel(CLIPVisionConfig())
    text = CLIPTextModel(CLIPTextConfig(projection_dim=768))
    tok_dir = os.path.join(ckpt, "tokenizer")
    tok = T.load_tokenizer(tok_dir if os.path.isdir(tok_dir) else ckpt)
    sim = ClipSimilarity(
        vision,
        params["vision"],
        lambda ids: text.apply({"params": params["text"]}, ids),
        tok,
        text_pooled_fn=lambda ids: text.apply(
            {"params": params["text"]}, ids, return_pooled=True
        )[1],
    )
    import numpy as np

    vids = sorted(system.origin_frames)
    src = np.stack([system.origin_frames[v] for v in vids])
    bg = jnp.zeros(3)
    edited = np.stack([
        np.asarray(system._render_jit(system.scene, system.cameras[v], bg))
        for v in vids
    ])
    prompt = sys_cfg.get("prompt", "")
    src_prompt = sys_cfg.get("source_prompt", "a photo")
    s_src, s_edit, s_dir, s_img = sim(
        src, edited, [src_prompt] * len(vids), [prompt] * len(vids)
    )
    out = {
        "clip_sim_source": float(np.mean(s_src)),
        "clip_sim_edit": float(np.mean(s_edit)),
        "clip_sim_direction": float(np.mean(s_dir)),
        "clip_sim_image": float(np.mean(s_img)),
        "n_views": len(vids),
    }
    saving.save_json(os.path.join(trial_dir, "clip_metrics.json"), out)
    log.info("CLIP edit metrics: %s", out)


if __name__ == "__main__":
    main()
