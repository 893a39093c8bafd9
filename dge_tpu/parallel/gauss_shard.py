"""Gaussian-block sharding: per-Gaussian preprocessing partitioned over a
mesh axis.

The north-star scaling plan (BASELINE.json, SURVEY.md §2.6) partitions both
camera views and Gaussian map blocks across hosts. Per-Gaussian
preprocessing (cull/project/covariance/SH) is embarrassingly parallel over
the Gaussian axis — each shard processes capacity/n rows; the compact
screen-space outputs are all-gathered for the (global) binning sort, which
needs every visible Gaussian's tile rect.

For multi-host scenes beyond one chip's HBM this keeps parameter storage and
preprocess FLOPs distributed. Two execution schemes:

- ``sharded_preprocess``: preprocess sharded, binning/compositing replicated
  on the gathered screen-space set (compose with parallel/tile_shard.py for
  pixel parallelism).
- **depth-slab compositing** (``make_depth_slab_render`` /
  ``make_depth_slab_train_step``): each device composites only the Gaussians
  in ITS depth slab (global equal-count depth partition), and the per-slab
  (color, depth, T) images merge with the associative front-to-back "over"
  operator ``c = c_near + T_near * c_far, T = T_near * T_far`` — exact
  sequential compositing, distributed. This is the TPU answer to the CUDA
  kernel's global [tile|depth] walk (forward.cu:261-379) at multi-chip
  scale: compositing work AND parameter/optimizer storage both split D-way,
  with two all_gathers (compact screen-space features, per-slab images)
  riding ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from dge_tpu.ops import binning, composite, projection

GAUSS_AXIS = "gauss"


def make_gauss_mesh(n_devices: Optional[int] = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (GAUSS_AXIS,))


def sharded_preprocess(mesh: Mesh, scene, cam, *, scale_modifier: float = 1.0):
    """Run projection.preprocess with the Gaussian axis sharded over the
    mesh; returns fully-replicated Preprocessed outputs (all_gather over
    ICI). scene.capacity must divide the mesh size."""

    def shard_fn(xyz, scale, quat, opac, sh, alive, active_deg):
        prep = projection.preprocess(
            xyz, scale, quat, opac, sh, alive, cam, active_deg,
            scene.max_sh_degree, scale_modifier=scale_modifier,
        )
        return tuple(
            jax.lax.all_gather(x, GAUSS_AXIS, tiled=True) for x in prep
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(GAUSS_AXIS), P(GAUSS_AXIS), P(GAUSS_AXIS), P(GAUSS_AXIS),
            P(GAUSS_AXIS), P(GAUSS_AXIS), P(),
        ),
        out_specs=tuple([P()] * 7),
        check_vma=False,
    )
    out = fn(
        scene.xyz,
        scene.get_scaling,
        scene.get_rotation,
        scene.get_opacity,
        scene.get_features,
        scene.alive,
        scene.active_sh_degree,
    )
    return projection.Preprocessed(*out)


def _slab_bounds(depth, visible, n_dev, k, sample_cap=4096):
    """Equal-count depth-slab [lo, hi) for device k from a strided sample of
    the visible depths (replicated computation; identical on all devices)."""
    d = jnp.where(visible, depth, jnp.inf)
    n = d.shape[0]
    stride = max(1, n // sample_cap)
    samp = jax.lax.sort(d[::stride])
    v = jnp.sum(jnp.isfinite(samp)).astype(jnp.int32)
    ranks = jnp.clip(
        (v * jnp.arange(1, n_dev, dtype=jnp.int32)) // n_dev,
        0, samp.shape[0] - 1,
    )
    edges = samp[ranks]  # [n_dev - 1] ascending
    lo = jnp.where(k == 0, -jnp.inf, edges[jnp.maximum(k - 1, 0)])
    hi = jnp.where(
        k == n_dev - 1, jnp.inf, edges[jnp.minimum(k, n_dev - 2)]
    )
    return lo, hi


def _merge_slabs(parts_color, parts_depth, parts_t, n_dev):
    """Fold per-slab images front-to-back with the associative over
    operator (slab 0 = nearest)."""
    c, d, t = parts_color[0], parts_depth[0], parts_t[0]
    for j in range(1, n_dev):
        c = c + t[..., None] * parts_color[j]
        d = d + t * parts_depth[j]
        t = t * parts_t[j]
    return c, d, t


def _slab_composite(prep, vis_slab, cam, *, height, width, tile_px,
                    max_per_tile, chunk):
    """Bin + composite ONE depth slab (bg-free)."""
    bins = binning.bin_gaussians(
        jax.lax.stop_gradient(prep.mean2d),
        jax.lax.stop_gradient(prep.depth),
        jax.lax.stop_gradient(prep.radius),
        vis_slab,
        height=height, width=width, tile_px=tile_px,
        max_per_tile=max_per_tile,
    )
    out = composite.composite(
        bins.lists, bins.counts, prep.mean2d, prep.conic, prep.rgb,
        prep.depth, prep.opacity, height=height, width=width,
        tiles_x=bins.tiles_x, tiles_y=bins.tiles_y, tile_px=tile_px,
        bg=jnp.zeros(3, jnp.float32), spill=bins.spill, chunk=chunk,
    )
    return out


def make_depth_slab_render(
    mesh: Mesh,
    height: int,
    width: int,
    *,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    chunk: int = 64,
    axis: str = GAUSS_AXIS,
):
    """Jitted (scene, cam, bg) -> (color, depth, alpha, spill): Gaussian
    parameters sharded over ``axis``; each device composites its depth slab;
    slabs merge with the associative over operator. Exact vs the
    single-device render up to depth-quantization tie order (per-slab
    quantization is finer than global)."""
    n_dev = mesh.shape[axis]

    def shard_fn(scene, cam, bg):
        prep_local = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        prep = projection.Preprocessed(*(
            jax.lax.all_gather(x, axis, tiled=True) for x in prep_local
        ))
        k = jax.lax.axis_index(axis)
        lo, hi = _slab_bounds(prep.depth, prep.visible, n_dev, k)
        vis_slab = prep.visible & (prep.depth >= lo) & (prep.depth < hi)
        out = _slab_composite(
            prep, vis_slab, cam, height=height, width=width,
            tile_px=tile_px, max_per_tile=max_per_tile, chunk=chunk,
        )
        parts_c = jax.lax.all_gather(out.color, axis)  # [D, H, W, 3]
        parts_d = jax.lax.all_gather(out.depth, axis)
        parts_t = jax.lax.all_gather(out.final_T, axis)
        c, d, t = _merge_slabs(parts_c, parts_d, parts_t, n_dev)
        c = c + t[..., None] * bg[None, None, :]
        spill = jax.lax.psum(out.spill, axis)
        return c, d, 1.0 - t, spill

    def scene_spec(scene):
        import jax.tree_util as jtu

        cap = scene.capacity

        def spec(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
                return P(axis)
            return P()

        return jtu.tree_map(spec, scene)

    def fn(scene, cam, bg):
        shard = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(scene_spec(scene), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        return shard(scene, cam, bg)

    return jax.jit(fn)


def make_depth_slab_train_step(
    optimizer,
    mesh: Mesh,
    height: int,
    width: int,
    *,
    lambda_dssim: float = 0.0,
    lambda_l1: float = 1.0,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    chunk: int = 64,
    axis: str = GAUSS_AXIS,
):
    """Model-parallel train step: Gaussian parameters AND optimizer state
    stay sharded over ``axis`` (scenes beyond one chip's HBM); each device
    composites its depth slab, the merged image drives the loss, and
    gradients flow back through both all_gathers (their transposes are
    reduce_scatters over ICI). The per-leaf Adam update is elementwise, so
    updating each shard locally equals the global update.

    The loss is computed replicated on every device; dividing by the mesh
    size before grad makes the psum_scatter-summed cotangents exact."""
    import optax

    from dge_tpu.ops import losses as L
    from dge_tpu.systems import optim as O

    n_dev = mesh.shape[axis]

    def shard_fn(scene, opt_state, fit_state, cam, target, bg):
        params = scene.params()
        offset = jnp.zeros((scene.xyz.shape[0], 2), jnp.float32)

        def loss_fn(p, off):
            s = scene.with_params(p)
            prep_local = projection.preprocess(
                s.xyz, s.get_scaling, s.get_rotation, s.get_opacity,
                s.get_features, s.alive, cam, s.active_sh_degree,
                s.max_sh_degree,
            )
            prep_local = prep_local._replace(
                mean2d=prep_local.mean2d + off
            )
            prep = projection.Preprocessed(*(
                jax.lax.all_gather(x, axis, tiled=True)
                for x in prep_local
            ))
            k = jax.lax.axis_index(axis)
            lo, hi = _slab_bounds(prep.depth, prep.visible, n_dev, k)
            vis_slab = (
                prep.visible & (prep.depth >= lo) & (prep.depth < hi)
            )
            out = _slab_composite(
                prep, vis_slab, cam, height=height, width=width,
                tile_px=tile_px, max_per_tile=max_per_tile, chunk=chunk,
            )
            parts_c = jax.lax.all_gather(out.color, axis)
            parts_d = jax.lax.all_gather(out.depth, axis)
            parts_t = jax.lax.all_gather(out.final_T, axis)
            c, _, t = _merge_slabs(parts_c, parts_d, parts_t, n_dev)
            c = c + t[..., None] * bg[None, None, :]
            loss = lambda_l1 * L.l1_loss(c, target)
            if lambda_dssim:
                loss = loss + lambda_dssim * (1.0 - L.ssim(c, target))
            aux = (prep_local.visible, prep_local.radius, out.spill)
            # replicated loss: each device's copy contributes 1/n_dev so
            # the all_gather-transpose psum over identical cotangents is
            # exact (not n_dev x)
            return loss / n_dev, aux

        (loss, (vis, radii, spill)), (gp, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset)
        loss = jax.lax.psum(loss, axis)  # n_dev identical copies / n_dev
        gp = O.apply_grad_mask(gp, scene.grad_mask, scene.alive)
        updates, opt_state = optimizer.update(gp, opt_state, params)
        scene = scene.with_params(optax.apply_updates(params, updates))
        gnorm = jnp.linalg.norm(
            goff * jnp.array([width * 0.5, height * 0.5], jnp.float32),
            axis=-1,
        )
        fit_state = fit_state.replace(
            grad_accum=fit_state.grad_accum + gnorm,
            denom=fit_state.denom + vis.astype(jnp.float32),
            max_radii2d=jnp.maximum(
                fit_state.max_radii2d, jnp.where(vis, radii, 0.0)
            ),
            step=fit_state.step + 1,
        )
        spill = jax.lax.psum(spill, axis)
        return scene, opt_state, fit_state, loss, spill

    def cap_spec(tree, cap):
        import jax.tree_util as jtu

        def spec(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
                return P(axis)
            return P()

        return jtu.tree_map(spec, tree)

    def step(scene, opt_state, fit_state, cam, target, bg):
        cap = scene.capacity
        shard = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(
                cap_spec(scene, cap), cap_spec(opt_state, cap),
                cap_spec(fit_state, cap), P(), P(), P(),
            ),
            out_specs=(
                cap_spec(scene, cap), cap_spec(opt_state, cap),
                cap_spec(fit_state, cap), P(), P(),
            ),
            check_vma=False,
        )
        scene, opt_state, fit_state, loss, spill = shard(
            scene, opt_state, fit_state, cam, target, bg
        )
        return scene, opt_state, fit_state, {"loss": loss, "spill": spill}

    return jax.jit(step)
