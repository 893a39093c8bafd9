"""The DGE editing system: render -> multi-view edit -> direct 3DGS refit.

Reference analog: threestudio/systems/DGE.py (registered "dge-system"):
- render_all_view caches original renders (:241-264)
- update_mask lifts SAM masks to per-Gaussian weights and installs grad
  masks for local editing (:101-165)
- edit_all_view re-edits the ~20-view set every camera_update_per_step
  steps through the guidance, with ring-ordered cameras and the
  added_noise_schedule annealing (:523-586)
- training_step fits the Gaussians to the edited frames with
  L1 + perceptual loss (:617-699)
- densify/prune every 100 steps from accumulated screen-space grads
  (:266-296)

The Lightning scaffolding is replaced by a plain loop over jitted steps.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import dge_tpu
from dge_tpu.ops import render as R
from dge_tpu.scene import dataset as DS
from dge_tpu.scene.camera_arrays import CameraArrays
from dge_tpu.scene.gaussians import GaussianScene
from dge_tpu.systems import fit as F
from dge_tpu.systems import optim as O
from dge_tpu.utils import saving
from dge_tpu.utils.misc import C


@dataclasses.dataclass
class EditConfig:
    """configs/dge.yaml system block (DGE.Config, DGE.py:31-77)."""

    max_steps: int = 1000
    camera_update_per_step: int = 500
    added_noise_schedule: Sequence[int] = (999, 300, 300, 21)
    densify_interval: int = 100
    densify_from: int = 100
    densify_until: int = 10_000
    max_densify_percent: float = 0.01
    densify_grad_threshold: float = 5.0
    min_opacity: float = 0.005
    lambda_l1: float = 10.0
    lambda_perceptual: float = 10.0
    camera_batch_size: int = 5
    max_view_num: int = 20
    seg_prompt: str = ""
    mask_thres: float = 0.8
    use_masked_image: bool = False
    # LR scalers (DGE.py:500-515 -> OptimizationParams ctor)
    gs_lr_scaler: float = 3.0
    gs_final_lr_scaler: float = 3.0
    color_lr_scaler: float = 3.0
    opacity_lr_scaler: float = 2.0
    scaling_lr_scaler: float = 2.0
    rotation_lr_scaler: float = 2.0
    tile_px: int = 32
    max_per_tile: int = 2048
    chunk: int = 64


@dge_tpu.register("dge-system")
class DGESystem:
    def __init__(
        self,
        cfg: EditConfig,
        scene: GaussianScene,
        cameras: Sequence[CameraArrays],
        guidance=None,
        text_emb_pos: Optional[jnp.ndarray] = None,
        text_emb_neg: Optional[jnp.ndarray] = None,
        perceptual_fn: Optional[Callable] = None,
        cameras_extent: float = 1.0,
        cache_dir: Optional[str] = None,
        segmentor: Optional[Callable] = None,
        camera_pool: Optional[Sequence[CameraArrays]] = None,
    ):
        self.cfg = cfg
        self.scene = scene
        self.cameras = list(cameras)
        # full camera pool for per-round view resampling (gs_load.py:286-292)
        self.camera_pool = list(camera_pool) if camera_pool is not None else None
        self.guidance = guidance
        self.text_emb_pos = text_emb_pos
        self.text_emb_neg = text_emb_neg
        self.segmentor = segmentor
        self.cache_dir = cache_dir
        self.cameras_extent = cameras_extent

        ocfg = O.OptimConfig.scaled(
            cfg.max_steps,
            lr_scaler=cfg.gs_lr_scaler,
            lr_final_scaler=cfg.gs_final_lr_scaler,
            color_lr_scaler=cfg.color_lr_scaler,
            opacity_lr_scaler=cfg.opacity_lr_scaler,
            scaling_lr_scaler=cfg.scaling_lr_scaler,
            rotation_lr_scaler=cfg.rotation_lr_scaler,
            densification_interval=cfg.densify_interval,
            densify_from_iter=cfg.densify_from,
            densify_until_iter=cfg.densify_until,
            densify_grad_threshold=cfg.densify_grad_threshold,
            lambda_dssim=0.0,
        )
        self.optim_cfg = ocfg
        self.loop = F.FitLoop(
            ocfg,
            extent=cameras_extent,
            max_densify_percent=cfg.max_densify_percent,
            min_opacity=cfg.min_opacity,
            spatial_lr_scale=cameras_extent,
            tile_px=cfg.tile_px,
            max_per_tile=cfg.max_per_tile,
            chunk=cfg.chunk,
            lambda_l1=cfg.lambda_l1,
            perceptual_fn=perceptual_fn,
            lambda_perceptual=cfg.lambda_perceptual,
        )
        self.opt_state, self.fit_state = self.loop.init(scene)
        self.origin_frames: Dict[int, np.ndarray] = {}
        self.edit_frames: Dict[int, np.ndarray] = {}
        self.view_list = list(range(len(self.cameras)))
        self._render_jit = jax.jit(
            lambda s, c, bg: R.render(
                s, c, bg, tile_px=cfg.tile_px, max_per_tile=cfg.max_per_tile,
                chunk=cfg.chunk,
            ).color
        )

    # ---- stage 0: cache original renders (render_all_view, DGE.py:241-264)
    def render_all_views(self, bg=None) -> Dict[int, np.ndarray]:
        bg = jnp.zeros(3) if bg is None else bg
        for vid in self.view_list:
            img = self._render_jit(self.scene, self.cameras[vid], bg)
            self.origin_frames[vid] = np.asarray(img)
            if self.cache_dir:
                saving.save_image(
                    os.path.join(self.cache_dir, "origin", f"{vid:04d}.png"),
                    self.origin_frames[vid],
                )
        return self.origin_frames

    # ---- local editing mask (update_mask, DGE.py:101-165) ----
    def update_mask(self) -> None:
        """Segment each original view, lift masks to per-Gaussian weights via
        the apply_weights path, threshold, install the grad mask."""
        if not self.cfg.seg_prompt or self.segmentor is None:
            return
        cap = self.scene.capacity
        weights = jnp.zeros((cap,))
        counts = jnp.zeros((cap,))
        for vid in self.view_list:
            img = self.origin_frames.get(vid)
            if img is None:
                img = np.asarray(
                    self._render_jit(self.scene, self.cameras[vid], jnp.zeros(3))
                )
            mask = self.segmentor(img, self.cfg.seg_prompt)  # [H, W] in {0,1}
            w, c = R.render_weights(
                self.scene,
                self.cameras[vid],
                jnp.asarray(mask, jnp.float32),
                tile_px=self.cfg.tile_px,
                max_per_tile=self.cfg.max_per_tile,
                chunk=self.cfg.chunk,
            )
            weights = weights + w
            counts = counts + c
        frac = jnp.where(counts > 0, weights / jnp.maximum(counts, 1.0), 0.0)
        gmask = (frac > self.cfg.mask_thres) & self.scene.alive
        self.scene = self.scene.replace(grad_mask=gmask.astype(jnp.float32))

    def resample_views(self, seed: int) -> None:
        """Re-draw the working view subset from the full camera pool
        (GSLoadIterableDataset.update_cameras, gs_load.py:286-292; DGE
        re-samples after the first edit round, DGE.py:528-535)."""
        pool = getattr(self, "camera_pool", None)
        if pool is None or len(pool) <= len(self.view_list):
            return
        r = np.random.default_rng(seed)
        idx = sorted(
            r.choice(len(pool), size=len(self.view_list), replace=False)
        )
        self.cameras = [pool[i] for i in idx]
        self.view_list = list(range(len(self.cameras)))
        self.origin_frames = {}
        self.render_all_views()

    # ---- stage 1: multi-view edit round (edit_all_view, DGE.py:523-586) ----
    def edit_all_views(
        self, rng: jax.Array, global_step: int = 0, update_camera: bool = False
    ) -> None:
        from dge_tpu.parallel.mesh import stack_cameras

        if update_camera:
            self.resample_views(global_step + 1)

        cfg = self.cfg
        sched = list(cfg.added_noise_schedule)
        round_idx = min(
            len(sched) - 1, global_step // max(cfg.camera_update_per_step, 1)
        )
        max_step = sched[round_idx]

        # ring-order the cameras for coherent batching (sort_the_cameras_idx)
        centers = np.stack(
            [np.asarray(self.cameras[v].campos) for v in self.view_list]
        )
        order = _ring_order(centers)
        views_sorted = [self.view_list[i] for i in order]

        renders, originals = [], []
        bg = jnp.zeros(3)
        for vid in views_sorted:
            img = np.asarray(self._render_jit(self.scene, self.cameras[vid], bg))
            if cfg.use_masked_image:
                # restrict the guidance input to the editable region: render
                # the per-Gaussian mask as color (override_color semantic
                # render, DGE.forward :170-239 + use_masked_image :566-567)
                mask_color = jnp.broadcast_to(
                    self.scene.grad_mask[:, None], (self.scene.capacity, 3)
                )
                m = R.render(
                    self.scene, self.cameras[vid], jnp.zeros(3),
                    tile_px=cfg.tile_px, max_per_tile=cfg.max_per_tile,
                    chunk=cfg.chunk, override_color=mask_color,
                ).color
                img = img * np.asarray(m[..., :1] > 0.5)
            renders.append(img)
            originals.append(self.origin_frames[vid])
        rgb = jnp.asarray(np.stack(renders))
        cond = jnp.asarray(np.stack(originals))

        cams_sorted = stack_cameras([self.cameras[v] for v in views_sorted])
        n = rgb.shape[0]
        pos = jnp.broadcast_to(self.text_emb_pos, (n,) + self.text_emb_pos.shape[-2:])
        neg = jnp.broadcast_to(self.text_emb_neg, (n,) + self.text_emb_neg.shape[-2:])
        edited = self.guidance(
            rgb, cond, pos, neg, cams_sorted, rng, max_step=max_step
        )
        edited = np.asarray(edited)
        for i, vid in enumerate(views_sorted):
            self.edit_frames[vid] = edited[i]
            if self.cache_dir:
                saving.save_image(
                    os.path.join(
                        self.cache_dir, f"edit_{global_step}", f"{vid:04d}.png"
                    ),
                    edited[i],
                )

    # ---- stage 2: refit (training_step, DGE.py:617-699) ----
    def fit_step(self, vid: int, rng: jax.Array) -> Dict[str, float]:
        target = jnp.asarray(self.edit_frames[vid])
        bg = jnp.zeros(3)
        self.scene, self.opt_state, self.fit_state, aux = self.loop.train_step(
            self.scene, self.opt_state, self.fit_state, self.cameras[vid],
            target, bg,
        )
        self.scene, self.opt_state, self.fit_state, _ = self.loop.maybe_densify(
            self.scene, self.opt_state, self.fit_state, rng
        )
        return {k: float(v) for k, v in aux.items()}

    # ---- full edit loop ----
    def run(self, rng: jax.Array, steps: Optional[int] = None, log_every=50,
            log_fn=print):
        cfg = self.cfg
        steps = steps or cfg.max_steps
        if not self.origin_frames:
            self.render_all_views()
        self.update_mask()
        view_rng = np.random.default_rng(0)
        for step in range(steps):
            if step % cfg.camera_update_per_step == 0:
                rng, r_edit = jax.random.split(rng)
                # re-draw the view subset after the first round (DGE.py:528)
                self.edit_all_views(
                    r_edit, global_step=step, update_camera=step > 0
                )
            vid = self.view_list[view_rng.integers(len(self.view_list))]
            rng, r_fit = jax.random.split(rng)
            aux = self.fit_step(vid, r_fit)
            if step % log_every == 0:
                log_fn(
                    f"step {step}: loss={aux['loss']:.4f} psnr={aux['psnr']:.2f}"
                )
        return self.scene


def _ring_order(centers: np.ndarray) -> List[int]:
    rel = centers - centers.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(rel, full_matrices=False)
    uv = rel @ vt[:2].T
    return list(np.argsort(np.arctan2(uv[:, 1], uv[:, 0])))
