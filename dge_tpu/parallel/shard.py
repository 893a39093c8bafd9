"""View-parallel sharded training step.

Cameras/targets shard across the ``view`` mesh axis; the Gaussian scene and
optimizer state are replicated; per-view gradients (including the
screen-space densification grads) reduce with ``psum`` over ICI before a
replicated Adam update — distributed bundle adjustment over the camera set.

Reference contrast: the CUDA reference trains single-GPU with one camera per
step (SURVEY.md §2.6); its multi-camera gradient accumulation
(DGE.on_before_optimizer_step, threestudio/systems/DGE.py:266-296) is the
sequential analog of this parallel reduction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from dge_tpu.ops import losses as L
from dge_tpu.ops import render as R
from dge_tpu.parallel.mesh import VIEW_AXIS, index_cameras
from dge_tpu.systems import optim as O
from dge_tpu.systems.fit import FitState


def make_sharded_train_step(
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    lambda_dssim: float = 0.2,
    lambda_l1: float = 1.0,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    chunk: int = 64,
    backend: str = "jnp",
):
    """Build a pjit-ed multi-view train step.

    Inputs: scene/opt_state/fit_state replicated; ``cams`` a stacked
    CameraArrays with leading view axis of size mesh.shape[view]; ``targets``
    [V, H, W, 3]. One optimizer step on the view-summed gradients.
    """
    n_views = mesh.shape[VIEW_AXIS]

    def per_view_grads(scene, cam, target, bg):
        params = scene.params()
        offset = jnp.zeros((scene.capacity, 2), jnp.float32)

        def loss_fn(p, off):
            s = scene.with_params(p)
            out = R.render(
                s,
                cam,
                bg,
                tile_px=tile_px,
                max_per_tile=max_per_tile,
                mean2d_offset=off,
                chunk=chunk,
                backend=backend,
            )
            loss = lambda_l1 * L.l1_loss(out.color, target)
            if lambda_dssim:
                loss = loss + lambda_dssim * (1.0 - L.ssim(out.color, target))
            return loss, out

        (loss, out), (gp, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset)
        return loss, gp, goff, out

    def sharded_step(scene, opt_state, fit_state, cams, targets, bg):
        def shard_fn(scene, cams, targets, bg):
            # local shard has exactly one view
            cam = index_cameras(cams, 0)
            target = targets[0]
            loss, gp, goff, out = per_view_grads(scene, cam, target, bg)
            # ICI reduction: mean loss, summed grads (bundle adjustment)
            loss = jax.lax.pmean(loss, VIEW_AXIS)
            gp = jax.lax.psum(gp, VIEW_AXIS)
            goff = jax.lax.psum(goff, VIEW_AXIS)
            vis_any = jax.lax.psum(out.visible.astype(jnp.float32), VIEW_AXIS)
            radii_max = jax.lax.pmax(
                jnp.where(out.visible, out.radii, 0.0), VIEW_AXIS
            )
            gnorm = jnp.linalg.norm(
                goff
                * jnp.array([cams.width * 0.5, cams.height * 0.5], jnp.float32),
                axis=-1,
            )
            return loss, gp, gnorm, vis_any, radii_max

        shard = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(VIEW_AXIS), P(VIEW_AXIS), P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )
        loss, gp, gnorm, vis_any, radii_max = shard(scene, cams, targets, bg)

        params = scene.params()
        gp = O.apply_grad_mask(gp, scene.grad_mask, scene.alive)
        updates, opt_state = optimizer.update(gp, opt_state, params)
        scene = scene.with_params(optax.apply_updates(params, updates))

        fit_state = fit_state.replace(
            grad_accum=fit_state.grad_accum + gnorm,
            denom=fit_state.denom + jnp.minimum(vis_any, float(n_views)),
            max_radii2d=jnp.maximum(fit_state.max_radii2d, radii_max),
            step=fit_state.step + 1,
        )
        return scene, opt_state, fit_state, {"loss": loss}

    return jax.jit(sharded_step)


def make_sharded_render(
    mesh: Mesh,
    *,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    chunk: int = 64,
):
    """Render V views in parallel across the mesh (embarrassingly parallel
    view sharding used by the edit round). Returns [V, H, W, 3]."""

    def render_one(scene, cams, bg):
        cam = index_cameras(cams, 0)
        out = R.render(
            scene, cam, bg, tile_px=tile_px, max_per_tile=max_per_tile, chunk=chunk
        )
        return out.color[None], out.depth[None]

    def fn(scene, cams, bg):
        shard = jax.shard_map(
            render_one,
            mesh=mesh,
            in_specs=(P(), P(VIEW_AXIS), P()),
            out_specs=(P(VIEW_AXIS), P(VIEW_AXIS)),
            check_vma=False,
        )
        return shard(scene, cams, bg)

    return jax.jit(fn)
