"""Tile-axis sharding: ONE image's tile rows split across devices.

SURVEY.md §2.6 names Gaussian-block- and tile-parallel execution as the TPU
equivalents of the reference's intra-op CUDA parallelism. View sharding
(parallel/shard.py) cannot help a single 512² render; this module splits the
image into horizontal bands of tile rows, one band per device:

- preprocess runs replicated (cheap relative to compositing; compose with
  parallel/gauss_shard.py when parameters outgrow one chip),
- each device bins ONLY the Gaussians overlapping its band (the pair sort —
  the binning bottleneck — shrinks by the mesh size),
- each device composites its band; bands concatenate to the full image via
  the shard_map output spec. No cross-band communication is needed: 3DGS
  tiles are independent given per-tile lists.

The band trick: shift mean2d.y by -band_offset and bin/composite against a
band-height viewport — tile_rects clips rects to the band, so off-band
Gaussians cull out exactly as the reference's frustum/tile culling does
(cuda_rasterizer/forward.cu:229-255).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from dge_tpu.ops import binning, composite, projection

TILE_AXIS = "tile"
VIEW_AXIS = "view"


def make_tile_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (TILE_AXIS,))


def make_gauss_tile_mesh(n_gauss: int, n_tile: int) -> Mesh:
    """2-axis mesh: Gaussian blocks x tile bands."""
    devs = jax.devices()
    assert len(devs) >= n_gauss * n_tile, (len(devs), n_gauss, n_tile)
    return Mesh(
        np.array(devs[: n_gauss * n_tile]).reshape(n_gauss, n_tile),
        ("gauss", TILE_AXIS),
    )


def make_view_tile_mesh(n_view: int, n_tile: int) -> Mesh:
    """2-axis mesh: camera views x tile bands (the full scaling story —
    the edit round shards views, each view's render shards tiles)."""
    devs = jax.devices()
    assert len(devs) >= n_view * n_tile, (len(devs), n_view, n_tile)
    return Mesh(
        np.array(devs[: n_view * n_tile]).reshape(n_view, n_tile),
        (VIEW_AXIS, TILE_AXIS),
    )


def _band_render(
    scene, cam, bg, band_px: int, y_off, *, tile_px, max_per_tile, chunk
):
    """Render rows [y_off, y_off + band_px) of cam's image. y_off may be a
    traced value (axis_index * band_px)."""
    prep = projection.preprocess(
        scene.xyz,
        scene.get_scaling,
        scene.get_rotation,
        scene.get_opacity,
        scene.get_features,
        scene.alive,
        cam,
        scene.active_sh_degree,
        scene.max_sh_degree,
    )
    shift = jnp.stack(
        [jnp.zeros_like(y_off.astype(jnp.float32)),
         y_off.astype(jnp.float32)]
    )
    mean2d = prep.mean2d - shift[None, :]
    bins = binning.bin_gaussians(
        jax.lax.stop_gradient(mean2d),
        jax.lax.stop_gradient(prep.depth),
        jax.lax.stop_gradient(prep.radius),
        prep.visible,
        height=band_px,
        width=cam.width,
        tile_px=tile_px,
        max_per_tile=max_per_tile,
    )
    out = composite.composite(
        bins.lists,
        bins.counts,
        mean2d,
        prep.conic,
        prep.rgb,
        prep.depth,
        prep.opacity,
        height=band_px,
        width=cam.width,
        tiles_x=bins.tiles_x,
        tiles_y=bins.tiles_y,
        tile_px=tile_px,
        bg=bg,
        spill=bins.spill,
        chunk=chunk,
    )
    return out.color, out.depth, out.final_T, out.spill


def make_tile_sharded_render(
    mesh: Mesh,
    height: int,
    width: int,
    *,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    chunk: int = 64,
    axis: str = TILE_AXIS,
):
    """Jitted (scene, cam, bg) -> (color [H, W, 3], depth, alpha, spill)
    where the tile-row bands of ONE image are computed on separate devices
    and concatenated by the output sharding."""
    n = mesh.shape[axis]
    if height % (n * tile_px) != 0:
        raise ValueError(
            f"height {height} must divide into {n} bands of whole "
            f"{tile_px}px tile rows"
        )
    band_px = height // n

    def shard_fn(scene, cam, bg):
        i = jax.lax.axis_index(axis)
        y_off = (i * band_px).astype(jnp.float32)
        color, depth, final_t, spill = _band_render(
            scene, cam, bg, band_px, y_off,
            tile_px=tile_px, max_per_tile=max_per_tile, chunk=chunk,
        )
        spill = jax.lax.psum(spill, axis)
        return color, depth, 1.0 - final_t, spill

    in_specs = (P(), P(), P())
    out_specs = (P(axis), P(axis), P(axis), P())
    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def make_gauss_tile_render(
    mesh: Mesh,
    height: int,
    width: int,
    *,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    chunk: int = 64,
    gauss_axis: str = "gauss",
    tile_axis: str = TILE_AXIS,
):
    """2-axis (gauss x tile) single-image render: Gaussian parameter blocks
    shard over ``gauss`` (per-Gaussian preprocess is local, compact
    screen-space outputs all_gather over ICI — parallel/gauss_shard.py's
    scheme), and each device composites only its tile-row band. Completes
    the SURVEY §2.6 story: one 512^2 render uses G x T chips with both
    parameter storage and pixel work distributed.

    scene.capacity must divide mesh.shape[gauss_axis]; height must split
    into whole tile-row bands over mesh.shape[tile_axis]."""
    n_tile = mesh.shape[tile_axis]
    n_gauss = mesh.shape[gauss_axis]
    if height % (n_tile * tile_px) != 0:
        raise ValueError("height must split into whole tile-row bands")
    band_px = height // n_tile

    def shard_fn(scene, cam, bg):
        # local preprocess on this device's Gaussian block (the scene
        # arrays arrive sharded over gauss, replicated over tile)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        full = tuple(
            jax.lax.all_gather(x, gauss_axis, tiled=True) for x in prep
        )
        prep = projection.Preprocessed(*full)
        i = jax.lax.axis_index(tile_axis)
        y_off = (i * band_px).astype(jnp.float32)
        shift = jnp.stack([jnp.zeros((), jnp.float32), y_off])
        mean2d = prep.mean2d - shift[None, :]
        bins = binning.bin_gaussians(
            mean2d, prep.depth, prep.radius, prep.visible,
            height=band_px, width=cam.width, tile_px=tile_px,
            max_per_tile=max_per_tile,
        )
        out = composite.composite(
            bins.lists, bins.counts, mean2d, prep.conic, prep.rgb,
            prep.depth, prep.opacity, height=band_px, width=cam.width,
            tiles_x=bins.tiles_x, tiles_y=bins.tiles_y, tile_px=tile_px,
            bg=bg, spill=bins.spill, chunk=chunk,
        )
        spill = jax.lax.psum(out.spill, (gauss_axis, tile_axis)) // n_gauss
        return out.color, out.depth, 1.0 - out.final_T, spill

    # scene leaves with a leading capacity axis shard over gauss; camera
    # and bg replicate. CameraArrays' static ints aren't pytree leaves.
    def scene_spec(scene):
        import jax.tree_util as jtu

        cap = scene.capacity

        def spec(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
                return P(gauss_axis)
            return P()

        return jtu.tree_map(spec, scene)

    def fn(scene, cam, bg):
        shard = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(scene_spec(scene), P(), P()),
            out_specs=(P(tile_axis), P(tile_axis), P(tile_axis), P()),
            check_vma=False,
        )
        return shard(scene, cam, bg)

    return jax.jit(fn)


def _halo_rows(x, axis_name: str, n: int, pad: int):
    """Prepend/append ``pad`` rows exchanged with the neighboring tile
    bands along ``axis_name`` (zeros at the outermost edges — exactly the
    zero 'same' padding losses.ssim applies at image borders, so windowed
    metrics over band rows match the unsharded full image)."""
    if n == 1:
        z = jnp.zeros((pad,) + x.shape[1:], x.dtype)
        return jnp.concatenate([z, x, z], axis=0)
    fwd = [(i, i + 1) for i in range(n - 1)]  # band i's bottom rows -> i+1
    bwd = [(i, i - 1) for i in range(1, n)]  # band i's top rows -> i-1
    top = jax.lax.ppermute(x[-pad:], axis_name, fwd)
    bot = jax.lax.ppermute(x[:pad], axis_name, bwd)
    return jnp.concatenate([top, x, bot], axis=0)


def make_view_tile_train_step(
    optimizer,
    mesh: Mesh,
    height: int,
    width: int,
    *,
    lambda_dssim: float = 0.2,
    lambda_l1: float = 1.0,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    chunk: int = 64,
):
    """2-axis sharded train step: views over VIEW_AXIS, each view's image
    over TILE_AXIS bands. Per-band losses sum over both axes; Gaussian
    gradients psum over the whole mesh (distributed bundle adjustment with
    intra-image parallelism)."""
    import optax

    from dge_tpu.ops import losses as L
    from dge_tpu.parallel.mesh import index_cameras
    from dge_tpu.systems import optim as O

    n_tile = mesh.shape[TILE_AXIS]
    n_view = mesh.shape[VIEW_AXIS]
    if height % (n_tile * tile_px) != 0:
        raise ValueError("height must split into whole tile-row bands")
    band_px = height // n_tile

    def shard_fn(scene, cams, targets, bg):
        cam = index_cameras(cams, 0)  # this view shard's camera
        i = jax.lax.axis_index(TILE_AXIS)
        y0 = i * band_px
        target_band = jax.lax.dynamic_slice_in_dim(
            targets[0], y0, band_px, axis=0
        )
        params = scene.params()
        offset = jnp.zeros((scene.capacity, 2), jnp.float32)

        def loss_fn(p, off):
            s = scene.with_params(p)
            prep = projection.preprocess(
                s.xyz, s.get_scaling, s.get_rotation, s.get_opacity,
                s.get_features, s.alive, cam, s.active_sh_degree,
                s.max_sh_degree,
            )
            shift = jnp.stack(
                [jnp.zeros((), jnp.float32), y0.astype(jnp.float32)]
            )
            mean2d = prep.mean2d + off - shift[None, :]
            bins = binning.bin_gaussians(
                jax.lax.stop_gradient(mean2d),
                jax.lax.stop_gradient(prep.depth),
                jax.lax.stop_gradient(prep.radius),
                prep.visible,
                height=band_px, width=width, tile_px=tile_px,
                max_per_tile=max_per_tile,
            )
            out = composite.composite(
                bins.lists, bins.counts, mean2d, prep.conic, prep.rgb,
                prep.depth, prep.opacity, height=band_px, width=width,
                tiles_x=bins.tiles_x, tiles_y=bins.tiles_y, tile_px=tile_px,
                bg=bg, spill=bins.spill, chunk=chunk,
            )
            loss = lambda_l1 * L.l1_loss(out.color, target_band)
            if lambda_dssim:
                # exact full-image SSIM from per-band pieces: exchange
                # window-radius row halos with the neighbor bands
                # (ppermute over ICI; differentiable), compute the SSIM
                # map on the extended band, keep only this band's rows.
                # Mean-of-band-means == full-image mean (equal bands).
                pad = 11 // 2
                if band_px < pad:
                    raise ValueError(
                        f"band height {band_px} < SSIM window radius {pad}"
                    )
                color_h = _halo_rows(out.color, TILE_AXIS, n_tile, pad)
                tgt_full = jnp.pad(
                    targets[0], ((pad, pad), (0, 0), (0, 0))
                )
                tgt_h = jax.lax.dynamic_slice_in_dim(
                    tgt_full, y0, band_px + 2 * pad, axis=0
                )
                smap = L.ssim_map(color_h, tgt_h)
                loss = loss + lambda_dssim * (
                    1.0 - jnp.mean(smap[pad : pad + band_px])
                )
            return loss / n_tile, (prep.visible, prep.radius)

        (loss, (vis, radii)), (gp, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset)
        loss = jax.lax.psum(loss, TILE_AXIS)
        loss = jax.lax.pmean(loss, VIEW_AXIS)
        gp = jax.lax.psum(gp, (VIEW_AXIS, TILE_AXIS))
        goff = jax.lax.psum(goff, (VIEW_AXIS, TILE_AXIS))
        vis_any = jax.lax.pmax(
            vis.astype(jnp.float32), (VIEW_AXIS, TILE_AXIS)
        )
        radii_max = jax.lax.pmax(
            jnp.where(vis, radii, 0.0), (VIEW_AXIS, TILE_AXIS)
        )
        gnorm = jnp.linalg.norm(
            goff * jnp.array([width * 0.5, height * 0.5], jnp.float32),
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

    def step(scene, opt_state, fit_state, cams, targets, bg):
        loss, gp, gnorm, vis_any, radii_max = shard(
            scene, cams, targets, bg
        )
        params = scene.params()
        gp = O.apply_grad_mask(gp, scene.grad_mask, scene.alive)
        updates, opt_state = optimizer.update(gp, opt_state, params)
        scene = scene.with_params(optax.apply_updates(params, updates))
        fit_state = fit_state.replace(
            grad_accum=fit_state.grad_accum + gnorm,
            denom=fit_state.denom + vis_any,
            max_radii2d=jnp.maximum(fit_state.max_radii2d, radii_max),
            step=fit_state.step + 1,
        )
        return scene, opt_state, fit_state, {"loss": loss}

    return jax.jit(step)
