"""Direct 3DGS fitting: jitted train step + host-side loop with densify.

Reference analogs: the vanilla trainer (gaussiansplatting/train.py:31-129,
L1 + lambda_dssim*(1-SSIM) loss, densify every interval, opacity reset) and
the DGE refit stage (threestudio/systems/DGE.py:617-699, L1 + perceptual vs
edited frames, densify in on_before_optimizer_step :266-296).

Everything inside ``train_step`` is one XLA program: render -> loss -> grad
-> masked update -> densification stats. Densify runs as a separate jitted
function every ``densification_interval`` steps (the shapes stay static; the
host only intervenes to grow capacity).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dge_tpu.ops import losses as L
from dge_tpu.ops import render as R
from dge_tpu.scene.gaussians import GaussianScene
from dge_tpu.systems import densify as D
from dge_tpu.systems import optim as O


@struct.dataclass
class FitState:
    """Densification statistics (xyz_gradient_accum / denom / max_radii2D,
    gaussian_model.py:330-334, 811-815)."""

    grad_accum: jnp.ndarray  # [cap]
    denom: jnp.ndarray  # [cap]
    max_radii2d: jnp.ndarray  # [cap]
    step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, capacity: int) -> "FitState":
        z = jnp.zeros((capacity,), jnp.float32)
        return cls(grad_accum=z, denom=z, max_radii2d=z, step=jnp.int32(0))


def default_train_backend() -> str:
    """pallas_train (custom-VJP kernels) on real TPU, jnp elsewhere."""
    import jax

    return "pallas_train" if jax.default_backend() in ("tpu", "axon") else "jnp"


def make_train_step(
    optimizer: optax.GradientTransformation,
    *,
    lambda_dssim: float = 0.2,
    lambda_l1: float = 1.0,
    perceptual_fn: Optional[Callable] = None,
    lambda_perceptual: float = 0.0,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    max_tiles_per_gaussian: int = 32,
    max_pairs: int = 0,
    big_capacity: int = 0,
    small_slots: int = 4,
    chunk: int = 64,
    backend: Optional[str] = None,
    tight_cull: bool = False,
):
    """Build a jitted (scene, opt_state, fit_state, cam, target, bg) step.

    Loss = lambda_l1 * L1 + lambda_dssim * (1 - SSIM) [vanilla 3DGS,
    train.py:77-79] + lambda_perceptual * perceptual [DGE refit,
    DGE.py:637-683].
    """

    backend = backend or default_train_backend()

    def loss_fn(params, scene, mean2d_offset, cam, target, bg):
        s = scene.with_params(params)
        out = R.render(
            s,
            cam,
            bg,
            tile_px=tile_px,
            max_per_tile=max_per_tile,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            max_pairs=max_pairs,
            big_capacity=big_capacity,
            small_slots=small_slots,
            mean2d_offset=mean2d_offset,
            chunk=chunk,
            backend=backend,
            tight_cull=tight_cull,
        )
        img = out.color
        loss = lambda_l1 * L.l1_loss(img, target)
        if lambda_dssim:
            loss = loss + lambda_dssim * (1.0 - L.ssim(img, target))
        if perceptual_fn is not None and lambda_perceptual:
            loss = loss + lambda_perceptual * perceptual_fn(img, target)
        return loss, out

    @jax.jit
    def train_step(scene, opt_state, fit_state, cam, target, bg):
        params = scene.params()
        offset = jnp.zeros((scene.capacity, 2), jnp.float32)
        grad_fn = jax.grad(loss_fn, argnums=(0, 2), has_aux=True)
        (gparams, goffset), out = grad_fn(params, scene, offset, cam, target, bg)
        gparams = O.apply_grad_mask(gparams, scene.grad_mask, scene.alive)

        updates, opt_state = optimizer.update(gparams, opt_state, params)
        params = optax.apply_updates(params, updates)
        scene = scene.with_params(params)

        # densification stats (add_densification_stats,
        # gaussian_model.py:811-815). CUDA's viewspace grads are NDC-scale;
        # ours are pixel-scale -> convert by (W/2, H/2) to keep the reference
        # threshold semantics (backward.cu:460-461).
        vis = out.visible
        g_ndc = jnp.stack(
            [goffset[:, 0] * (cam.width * 0.5), goffset[:, 1] * (cam.height * 0.5)],
            axis=-1,
        )
        gnorm = jnp.linalg.norm(g_ndc, axis=-1)
        fit_state = fit_state.replace(
            grad_accum=fit_state.grad_accum + jnp.where(vis, gnorm, 0.0),
            denom=fit_state.denom + vis.astype(jnp.float32),
            max_radii2d=jnp.maximum(
                fit_state.max_radii2d, jnp.where(vis, out.radii, 0.0)
            ),
            step=fit_state.step + 1,
        )
        aux = {
            "loss": lambda_l1 * L.l1_loss(out.color, target),
            "psnr": L.psnr(out.color, target),
            "spill": out.spill,
        }
        if out.spill_parts is not None:
            aux["spill_parts"] = out.spill_parts
        return scene, opt_state, fit_state, aux

    return train_step


@partial(
    jax.jit,
    static_argnames=(
        "max_grad",
        "max_densify_percent",
        "min_opacity",
        "extent",
        "max_screen_size",
        "percent_dense",
        "generation_num",
    ),
)
def densify_step(
    scene,
    opt_state,
    fit_state,
    key,
    *,
    max_grad: float,
    max_densify_percent: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float,
    generation_num: int = 0,
):
    """Jitted densify+prune, Adam-state reset for changed rows, stat reset
    (densification_postfix + densify_and_prune, gaussian_model.py:643-809)."""
    scene, info = D.densify_and_prune(
        scene,
        fit_state.grad_accum,
        fit_state.denom,
        fit_state.max_radii2d,
        key,
        max_grad=max_grad,
        max_densify_percent=max_densify_percent,
        min_opacity=min_opacity,
        extent=extent,
        max_screen_size=max_screen_size,
        percent_dense=percent_dense,
        generation_num=generation_num,
    )
    opt_state = O.zero_adam_rows(opt_state, info.changed_rows)
    cap = scene.capacity
    fit_state = fit_state.replace(
        grad_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
    )
    return scene, opt_state, fit_state, info


def _pad_opt_state(opt_state, old_cap: int, new_cap: int):
    """Zero-pad per-row Adam state on capacity growth (momentum of existing
    rows is preserved, unlike a fresh init)."""

    def pad_leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == old_cap:
            pad = jnp.zeros((new_cap - old_cap,) + x.shape[1:], x.dtype)
            return jnp.concatenate([x, pad], axis=0)
        return x

    return jax.tree_util.tree_map(pad_leaf, opt_state)


@dataclasses.dataclass
class FitLoop:
    """Host-side fitting driver: steps, periodic densify, capacity growth.

    Reference analog: the training() loop of gaussiansplatting/train.py:31-129
    without the Lightning/network-GUI scaffolding."""

    cfg: O.OptimConfig
    extent: float = 1.0
    max_densify_percent: float = 1.0
    min_opacity: float = 0.005
    max_screen_size: float = 0.0
    spatial_lr_scale: float = 1.0
    tile_px: int = 32
    max_per_tile: int = 2048
    max_tiles_per_gaussian: int = 32
    max_pairs: int = 0  # 0 = auto (binning scales with capacity)
    big_capacity: int = 0  # 0 = auto (bucketed emission default)
    # bucketed-emission small/big threshold; grow (16) for >= 1080p fits
    # where the median rect exceeds 4 tiles (binning.bin_gaussians_pairs)
    small_slots: int = 4
    chunk: int = 64
    grow_threshold: float = 0.9
    lambda_l1: float = 1.0
    perceptual_fn: Optional[Callable] = None
    lambda_perceptual: float = 0.0
    backend: Optional[str] = None  # None = auto (pallas_train on TPU)
    spill_patience: int = 3  # consecutive spilling steps before caps grow
    # exact tight tile culling (binning.tile_keep_mask): off by default (its
    # mask math costs ~1.4 ms/step at 131k Gaussians), switched on as the
    # FIRST react_to_spill response — dropping invisible pairs is cheaper
    # than growing caps, and cull-then-compact recovers real tiles the
    # per-Gaussian slot cap was spilling
    tight_cull: bool = False

    def __post_init__(self):
        self.optimizer = O.make_optimizer(self.cfg, self.spatial_lr_scale)
        self._spill_streak = 0
        self.train_step = make_train_step(
            self.optimizer,
            lambda_dssim=self.cfg.lambda_dssim,
            lambda_l1=self.lambda_l1,
            perceptual_fn=self.perceptual_fn,
            lambda_perceptual=self.lambda_perceptual,
            tile_px=self.tile_px,
            max_per_tile=self.max_per_tile,
            max_tiles_per_gaussian=self.max_tiles_per_gaussian,
            max_pairs=self.max_pairs,
            big_capacity=self.big_capacity,
            small_slots=self.small_slots,
            chunk=self.chunk,
            backend=self.backend,
            tight_cull=self.tight_cull,
        )

    def react_to_spill(self, spill: int, capacity: int,
                       parts=None) -> bool:
        """Adaptive spill ladder: persistent spill means the binning caps no
        longer fit the scene. Rungs, cheapest first: (1) enable exact tight
        tile culling (stops counting/emitting invisible pairs — with the
        bucketed cull-then-compact path this also makes the per-Gaussian
        spill term honest); (2) if spill persists after culling, ALL caps
        grow together in one rung — max_tiles_per_gaussian,
        max_per_tile, max_pairs, big_capacity, small_slots each double (up
        to their ceilings) — trading one big re-jit for fewer total re-jits than a
        strictly sequential ladder. Each rung rebuilds the
        jitted step (re-jit boundary). Training against truncated tile
        lists silently corrupts the scene (hit in practice: a densified
        256^2 fit trained at spill ~200k evaluated 18 dB below its train
        PSNR). NB on the non-bucketed (per-tile-list / jnp) paths the
        per-Gaussian term still counts raw rect tiles beyond the cap, so
        post-cull spill is conservative there; growth is bounded by the
        rung ceilings. Returns True when anything changed."""
        if spill <= 0:
            self._spill_streak = 0
            return False
        self._spill_streak += 1
        if self._spill_streak < self.spill_patience:
            return False
        self._spill_streak = 0
        if not self.tight_cull:
            # cheapest response first: stop emitting invisible pairs and
            # compact the big-Gaussian slots (exact; see binning.py)
            self.tight_cull = True
            self.__post_init__()
            return True
        # selective growth when the overflow attribution is available
        # ((slot, cap, tile, stream), binning.PairBins.spill_parts) —
        # lockstep growth overshot big_capacity 4x on a 1080p trained fit
        # (22.6 ms of binning sort on a 63 ms frame, round 5)
        if parts is not None:
            pl = [int(x) for x in parts]
            wants = [x > 0 for x in (
                pl if len(pl) == 4 else [pl[0], pl[0], pl[1], pl[2]])]
        else:
            wants = [True] * 4
        grew = False
        want_slot, want_cap, want_tile, want_stream = wants
        if want_slot and self.max_tiles_per_gaussian < 256:
            # honest (post-cull) per-Gaussian spill that persists means
            # big splats genuinely intersect more tiles than the cap
            self.max_tiles_per_gaussian *= 2
            grew = True
        if want_tile and self.max_per_tile < 1 << 15:
            self.max_per_tile *= 2
            grew = True
        auto_pairs = max(1 << 18,
                         1 << int(2 * capacity - 1).bit_length())
        new_pairs = max(self.max_pairs or auto_pairs, auto_pairs) * 2
        if want_stream and new_pairs <= 1 << 22:
            self.max_pairs = new_pairs
            grew = True
        auto_big = 1 << max(int(capacity // 32 - 1).bit_length(), 6)
        new_big = max(self.big_capacity or auto_big, auto_big) * 2
        if want_cap and new_big <= capacity:
            self.big_capacity = new_big
            grew = True
        if want_cap and self.small_slots < 32:
            # a flooded big grid usually means the whole population
            # moved up a rect-size class (e.g. a high-res fit: median
            # rect is 6 tiles at 1080p) — raising the small/big
            # threshold is far cheaper than big_capacity x2 forever
            # (rows: N*slots vs big_cap*max_tiles)
            self.small_slots *= 2
            grew = True
        # no fallback to unrelated classes when the attributed ones are
        # at ceilings: that spill is irreducible (e.g. a needle spanning
        # >256 tiles) and growing other caps cannot help
        if grew:
            self.__post_init__()
        return grew

    def init(self, scene: GaussianScene):
        return self.optimizer.init(scene.params()), FitState.create(scene.capacity)

    def maybe_housekeep(self, scene, opt_state, fit_state):
        """Periodic non-densify upkeep: opacity reset every
        opacity_reset_interval steps (train.py:97-99) and SH degree step-up
        every 1000 steps (train.py:52-54, oneupSHdegree).

        The reference saves checkpoints BEFORE its densify/reset block
        (train.py: save at :83, reset at :97) — never reset on the final
        step, or a run whose max_steps is a reset multiple exports a
        freshly-transparent scene (hit in practice: 6000-step fit saved at
        reset 6000 -> eval PSNR 16 vs train 37)."""
        step = int(fit_state.step)
        if step > 0 and step % 1000 == 0:
            scene = scene.one_up_sh_degree()
        if (
            self.cfg.opacity_reset_interval > 0
            and 0 < step < self.cfg.max_steps
            and step % self.cfg.opacity_reset_interval == 0
        ):
            scene, rows = D.reset_opacity(scene)
            opt_state = O.zero_adam_rows(opt_state, rows, fields=("opacity",))
        return scene, opt_state, fit_state

    def maybe_densify(self, scene, opt_state, fit_state, key, generation_num=0):
        step = int(fit_state.step)
        if (
            step < self.cfg.densify_from_iter
            or step > self.cfg.densify_until_iter
            or step % self.cfg.densification_interval != 0
        ):
            return scene, opt_state, fit_state, None
        # grow capacity on the host when nearly full (re-jit boundary)
        n_alive = int(scene.n_alive)
        if n_alive > self.grow_threshold * scene.capacity:
            old_cap = scene.capacity
            new_cap = old_cap * 2
            scene = D.grow_capacity(scene, new_cap)
            opt_state = _pad_opt_state(opt_state, old_cap, new_cap)
            fit_state = FitState.create(new_cap).replace(step=fit_state.step)
        return self._densify(scene, opt_state, fit_state, key, generation_num)

    def _densify(self, scene, opt_state, fit_state, key, generation_num):
        scene, opt_state, fit_state, info = densify_step(
            scene,
            opt_state,
            fit_state,
            key,
            max_grad=self.cfg.densify_grad_threshold,
            max_densify_percent=self.max_densify_percent,
            min_opacity=self.min_opacity,
            extent=self.extent,
            max_screen_size=self.max_screen_size,
            percent_dense=self.cfg.percent_dense,
            generation_num=generation_num,
        )
        return scene, opt_state, fit_state, info
