"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dge_tpu.parallel import mesh as M
from dge_tpu.parallel import shard as S
from dge_tpu.scene import look_at_camera
from dge_tpu.scene.camera_arrays import CameraArrays
from dge_tpu.systems import optim as O
from dge_tpu.systems.fit import FitState
from tests.conftest import make_random_scene


def ring_cameras(n, height=16, width=16, dist=3.5):
    cams = []
    for i in range(n):
        ang = 2 * math.pi * i / n
        eye = np.array([dist * math.sin(ang), 0.3, -dist * math.cos(ang)])
        cams.append(
            CameraArrays.from_camera(
                look_at_camera(
                    eye, np.zeros(3), fovx=math.radians(60),
                    height=height, width=width,
                )
            )
        )
    return cams


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_render_matches_single(rng):
    from dge_tpu.ops import render as R

    scene = make_random_scene(rng, n=40, capacity=64)
    mesh = M.make_view_mesh(8)
    cams = ring_cameras(8)
    batch = M.stack_cameras(cams)
    bg = jnp.zeros(3)
    render_fn = S.make_sharded_render(mesh, tile_px=8, max_per_tile=64, chunk=16)
    colors, depths = render_fn(scene, batch, bg)
    assert colors.shape == (8, 16, 16, 3)
    for i in (0, 3, 7):
        single = R.render(scene, cams[i], bg, tile_px=8, max_per_tile=64, chunk=16)
        assert np.allclose(colors[i], single.color, atol=1e-5), i


def test_sharded_train_step_runs_and_reduces(rng):
    scene = make_random_scene(rng, n=40, capacity=64)
    mesh = M.make_view_mesh(8)
    cams = ring_cameras(8)
    batch = M.stack_cameras(cams)
    targets = jnp.asarray(
        np.random.default_rng(1).uniform(size=(8, 16, 16, 3)).astype(np.float32)
    )
    bg = jnp.zeros(3)

    optimizer = O.make_optimizer(O.OptimConfig.scaled(100))
    opt_state = optimizer.init(scene.params())
    fit_state = FitState.create(scene.capacity)
    step = S.make_sharded_train_step(
        optimizer, mesh, tile_px=8, max_per_tile=64, chunk=16
    )
    s2, opt_state, fit_state, aux = step(
        scene, opt_state, fit_state, batch, targets, bg
    )
    assert np.isfinite(float(aux["loss"]))
    assert float(jnp.abs(s2.features_dc - scene.features_dc).max()) > 0
    assert int(fit_state.step) == 1
    assert float(fit_state.denom.max()) > 0


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tile_sharded_render_matches_single(rng):
    """One image's tile-row bands across 4 devices == the single-device
    render (modulo per-band depth-quantization tie order)."""
    from dge_tpu.ops import render as R
    from dge_tpu.parallel import tile_shard as TS

    scene = make_random_scene(rng, n=60, capacity=64)
    cams = ring_cameras(1, height=64, width=64)
    cam = cams[0]
    bg = jnp.zeros(3)
    single = R.render(scene, cam, bg, tile_px=16, max_per_tile=128, chunk=16)

    mesh = TS.make_tile_mesh(4)
    fn = TS.make_tile_sharded_render(
        mesh, 64, 64, tile_px=16, max_per_tile=128, chunk=16
    )
    color, depth, alpha, spill = fn(scene, cam, bg)
    assert color.shape == (64, 64, 3)
    assert int(spill) == int(single.spill) == 0
    # per-band depth quantization ranges differ from the global ones, so
    # near-equal depths may swap compositing order — tolerance, not equality
    assert np.allclose(np.asarray(color), np.asarray(single.color),
                       atol=5e-3), np.abs(
        np.asarray(color) - np.asarray(single.color)
    ).max()
    assert np.allclose(np.asarray(alpha), np.asarray(single.alpha), atol=5e-3)


def test_view_tile_train_step_matches_view_sharded(rng):
    """(2 views x 4 tile bands) == (2 views, whole images) for the L1-only
    objective: the band decomposition of the loss is exact."""
    from dge_tpu.parallel import tile_shard as TS

    scene = make_random_scene(rng, n=60, capacity=64)
    cams = ring_cameras(2, height=64, width=64)
    batch = M.stack_cameras(cams)
    targets = jnp.asarray(
        np.random.default_rng(2).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    )
    bg = jnp.zeros(3)

    def fresh():
        optimizer = O.make_optimizer(O.OptimConfig.scaled(100))
        return optimizer, optimizer.init(scene.params()), FitState.create(
            scene.capacity
        )

    opt_a, os_a, fs_a = fresh()
    step_a = S.make_sharded_train_step(
        opt_a, M.make_view_mesh(2), lambda_dssim=0.0, tile_px=16,
        max_per_tile=128, chunk=16,
    )
    sa, _, fsa, aux_a = step_a(scene, os_a, fs_a, batch, targets, bg)

    opt_b, os_b, fs_b = fresh()
    mesh2 = TS.make_view_tile_mesh(2, 4)
    step_b = TS.make_view_tile_train_step(
        opt_b, mesh2, 64, 64, lambda_dssim=0.0, tile_px=16,
        max_per_tile=128, chunk=16,
    )
    sb, _, fsb, aux_b = step_b(scene, os_b, fs_b, batch, targets, bg)

    assert np.allclose(float(aux_a["loss"]), float(aux_b["loss"]), atol=1e-5)
    assert np.allclose(
        np.asarray(sa.features_dc), np.asarray(sb.features_dc), atol=1e-4
    )
    assert np.allclose(np.asarray(sa.xyz), np.asarray(sb.xyz), atol=1e-4)
    # densification stats agree where it matters (union visibility)
    assert np.allclose(
        np.asarray(fsa.max_radii2d), np.asarray(fsb.max_radii2d), atol=1e-3
    )


def test_view_tile_train_step_ssim_halo_matches(rng):
    """lambda_dssim > 0: the halo-exchanged per-band SSIM (ppermute of
    window-radius rows between tile bands) reproduces the full-image SSIM
    objective of the view-sharded step exactly — losses AND gradients."""
    from dge_tpu.parallel import tile_shard as TS

    scene = make_random_scene(rng, n=60, capacity=64)
    cams = ring_cameras(2, height=64, width=64)
    batch = M.stack_cameras(cams)
    targets = jnp.asarray(
        np.random.default_rng(3).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    )
    bg = jnp.zeros(3)

    def fresh():
        optimizer = O.make_optimizer(O.OptimConfig.scaled(100))
        return optimizer, optimizer.init(scene.params()), FitState.create(
            scene.capacity
        )

    opt_a, os_a, fs_a = fresh()
    step_a = S.make_sharded_train_step(
        opt_a, M.make_view_mesh(2), lambda_dssim=0.2, tile_px=16,
        max_per_tile=128, chunk=16,
    )
    sa, _, _, aux_a = step_a(scene, os_a, fs_a, batch, targets, bg)

    opt_b, os_b, fs_b = fresh()
    step_b = TS.make_view_tile_train_step(
        opt_b, TS.make_view_tile_mesh(2, 4), 64, 64, lambda_dssim=0.2,
        tile_px=16, max_per_tile=128, chunk=16,
    )
    sb, _, _, aux_b = step_b(scene, os_b, fs_b, batch, targets, bg)

    assert np.allclose(float(aux_a["loss"]), float(aux_b["loss"]), atol=1e-5)
    assert np.allclose(
        np.asarray(sa.features_dc), np.asarray(sb.features_dc), atol=1e-4
    )
    assert np.allclose(np.asarray(sa.xyz), np.asarray(sb.xyz), atol=1e-4)


def test_gauss_tile_render_matches_single(rng):
    """2-axis (gauss x tile) render: parameters sharded over Gaussian
    blocks, pixels over tile bands — equals the single-device render."""
    from dge_tpu.ops import render as R
    from dge_tpu.parallel import tile_shard as TS

    scene = make_random_scene(rng, n=60, capacity=64)  # 64 % 4 == 0
    cams = ring_cameras(1, height=64, width=64)
    cam = cams[0]
    bg = jnp.zeros(3)
    single = R.render(scene, cam, bg, tile_px=16, max_per_tile=128, chunk=16)

    mesh = TS.make_gauss_tile_mesh(4, 2)
    fn = TS.make_gauss_tile_render(
        mesh, 64, 64, tile_px=16, max_per_tile=128, chunk=16
    )
    color, depth, alpha, spill = fn(scene, cam, bg)
    assert color.shape == (64, 64, 3)
    assert np.allclose(np.asarray(color), np.asarray(single.color),
                       atol=5e-3)
    assert int(spill) == int(single.spill) == 0


@pytest.mark.slow
def test_gauss_sharded_preprocess_matches(rng):
    """Gaussian-axis-sharded preprocess == single-device preprocess."""
    from dge_tpu.ops import projection
    from dge_tpu.parallel import gauss_shard as GS

    scene = make_random_scene(rng, n=100, capacity=128)  # 128 % 8 == 0
    cams = ring_cameras(1, height=32, width=32)
    cam = cams[0]
    ref = projection.preprocess(
        scene.xyz, scene.get_scaling, scene.get_rotation, scene.get_opacity,
        scene.get_features, scene.alive, cam, scene.active_sh_degree,
        scene.max_sh_degree,
    )
    mesh = GS.make_gauss_mesh(8)
    out = GS.sharded_preprocess(mesh, scene, cam)
    for name in ref._fields:
        a, b = getattr(ref, name), getattr(out, name)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                           equal_nan=True), name


def test_depth_slab_render_matches_single(rng):
    """Gaussian parameters sharded over 8 devices, each compositing its
    depth slab; the associative over-merge == single-device render."""
    from dge_tpu.ops import render as R
    from dge_tpu.parallel import gauss_shard as GS

    scene = make_random_scene(rng, n=100, capacity=128)  # 128 % 8 == 0
    cams = ring_cameras(1, height=64, width=64)
    cam = cams[0]
    bg = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    single = R.render(scene, cam, bg, tile_px=16, max_per_tile=128, chunk=16)

    mesh = GS.make_gauss_mesh(8)
    fn = GS.make_depth_slab_render(
        mesh, 64, 64, tile_px=16, max_per_tile=128, chunk=16
    )
    color, depth, alpha, spill = fn(scene, cam, bg)
    assert color.shape == (64, 64, 3)
    assert int(spill) == int(single.spill) == 0
    # per-slab depth quantization is finer than global — near-equal depths
    # may swap order, so tolerance rather than equality
    assert np.allclose(np.asarray(color), np.asarray(single.color),
                       atol=5e-3), np.abs(
        np.asarray(color) - np.asarray(single.color)
    ).max()
    assert np.allclose(np.asarray(alpha), np.asarray(single.alpha), atol=5e-3)
    assert np.allclose(np.asarray(depth), np.asarray(single.depth), atol=5e-2)


def test_depth_slab_train_step_matches_unsharded(rng):
    """Model-parallel (sharded params + optimizer) depth-slab train step ==
    the single-device train step: same loss, same updated parameters."""
    from dge_tpu.parallel import gauss_shard as GS
    from dge_tpu.systems import fit as F

    scene = make_random_scene(rng, n=100, capacity=128)
    cams = ring_cameras(1, height=64, width=64)
    cam = cams[0]
    target = jnp.asarray(
        np.random.default_rng(3).uniform(size=(64, 64, 3)).astype(np.float32)
    )
    bg = jnp.zeros(3)

    def fresh():
        optimizer = O.make_optimizer(O.OptimConfig.scaled(100))
        return optimizer, optimizer.init(scene.params()), FitState.create(
            scene.capacity
        )

    opt_a, os_a, fs_a = fresh()
    step_a = F.make_train_step(
        opt_a, lambda_dssim=0.0, tile_px=16, max_per_tile=128, chunk=16
    )
    sa, _, fsa, aux_a = step_a(scene, os_a, fs_a, cam, target, bg)

    opt_b, os_b, fs_b = fresh()
    mesh = GS.make_gauss_mesh(8)
    step_b = GS.make_depth_slab_train_step(
        opt_b, mesh, 64, 64, lambda_dssim=0.0, tile_px=16,
        max_per_tile=128, chunk=16,
    )
    sb, _, fsb, aux_b = step_b(scene, os_b, fs_b, cam, target, bg)

    assert np.allclose(float(aux_a["loss"]), float(aux_b["loss"]), atol=1e-5)
    assert np.allclose(
        np.asarray(sa.features_dc), np.asarray(sb.features_dc), atol=1e-4
    )
    assert np.allclose(np.asarray(sa.xyz), np.asarray(sb.xyz), atol=1e-4)
    assert np.allclose(
        np.asarray(fsa.max_radii2d), np.asarray(fsb.max_radii2d), atol=1e-3
    )
    assert np.allclose(
        np.asarray(fsa.grad_accum), np.asarray(fsb.grad_accum), atol=1e-4
    )
