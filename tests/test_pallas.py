"""Pallas compositing kernel vs the jnp reference (interpret mode on CPU;
the same kernel compiles with Mosaic on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dge_tpu.ops import render
from tests.conftest import make_random_scene, make_test_camera


@pytest.mark.parametrize("angle", [0.0, 2.0])
def test_pallas_matches_jnp(rng, angle):
    scene = make_random_scene(rng, n=64)
    _, cam = make_test_camera(height=32, width=32, angle=angle)
    bg = jnp.array([0.2, 0.1, 0.4])
    ref = render.render(scene, cam, bg, tile_px=16, max_per_tile=128, chunk=32)
    out = render.render(
        scene, cam, bg, tile_px=16, max_per_tile=128, backend="pallas"
    )
    # Hillis-Steele cumprod reorders multiplies vs the sequential reference
    # — agreement to ~1e-4 is the expected f32 associativity noise
    assert np.allclose(out.color, ref.color, atol=1e-4), (
        np.abs(np.asarray(out.color) - np.asarray(ref.color)).max()
    )
    assert np.allclose(out.depth, ref.depth, atol=1e-3)
    assert np.allclose(out.alpha, ref.alpha, atol=2e-4)


def test_pallas_empty_tiles(rng):
    # a scene confined to one corner: most tiles have zero gaussians
    scene = make_random_scene(rng, n=8, spread=0.05)
    _, cam = make_test_camera(height=32, width=32)
    ref = render.render(scene, cam, tile_px=16, max_per_tile=128, chunk=32)
    out = render.render(scene, cam, tile_px=16, max_per_tile=128, backend="pallas")
    assert np.allclose(out.color, ref.color, atol=3e-5)


def test_pallas_stream_matches_jnp(rng):
    """Pair-stream kernel parity with the jnp reference."""
    scene = make_random_scene(rng, n=96)
    _, cam = make_test_camera(height=32, width=32, angle=1.3)
    bg = jnp.array([0.3, 0.0, 0.2])
    ref = render.render(scene, cam, bg, tile_px=16, max_per_tile=128, chunk=32)
    out = render.render(
        scene, cam, bg, tile_px=16, max_per_tile=128, backend="pallas_stream"
    )
    assert np.allclose(out.color, ref.color, atol=1e-4), (
        np.abs(np.asarray(out.color) - np.asarray(ref.color)).max()
    )
    assert np.allclose(out.depth, ref.depth, atol=1e-3)
    assert np.allclose(out.alpha, ref.alpha, atol=2e-4)


def test_pallas_blocks_matches_jnp(rng):
    """Opt-in block-aligned stream kernel (backend="pallas_blocks") parity.

    Kept opt-in after the round-2 regression: at the 131k/512^2 bench point
    it measured 23.8 ms/frame vs 9.9 ms for the pair-stream default; its
    design regime is heavy tile-load skew (1080p)."""
    scene = make_random_scene(rng, n=96)
    _, cam = make_test_camera(height=32, width=32, angle=1.3)
    bg = jnp.array([0.3, 0.0, 0.2])
    ref = render.render(scene, cam, bg, tile_px=16, max_per_tile=128, chunk=32)
    # max_pairs deliberately NOT a chunk multiple: align_pairs must round
    # the stream up instead of tripping the kernel's % chunk contract
    out = render.render(
        scene, cam, bg, tile_px=16, max_per_tile=128, max_pairs=1000,
        backend="pallas_blocks",
    )
    assert np.allclose(out.color, ref.color, atol=1e-4)
    assert np.allclose(out.depth, ref.depth, atol=1e-3)
    assert np.allclose(out.alpha, ref.alpha, atol=2e-4)


class TestPallasTrainBackend:
    def test_forward_matches(self, rng):
        scene = make_random_scene(rng, n=96)
        _, cam = make_test_camera(height=32, width=32)
        bg = jnp.array([0.1, 0.2, 0.3])
        ref = render.render(scene, cam, bg, tile_px=16, max_per_tile=128,
                            chunk=32)
        out = render.render(scene, cam, bg, tile_px=16, max_per_tile=128,
                            backend="pallas_train")
        assert np.allclose(out.color, ref.color, atol=1e-4)
        assert np.allclose(out.alpha, ref.alpha, atol=2e-4)

    def test_gradients_match_jnp(self, rng):
        """The Pallas custom-VJP backward must agree with XLA autodiff of
        the jnp compositing (the analytic CUDA backward identity)."""
        import jax

        scene = make_random_scene(rng, n=48, capacity=64)
        _, cam = make_test_camera(height=32, width=32)
        target = jnp.asarray(
            rng.uniform(size=(32, 32, 3)).astype(np.float32)
        )
        bg = jnp.array([0.3, 0.1, 0.0])

        def loss(params, backend):
            s = scene.with_params(params)
            out = render.render(
                s, cam, bg, tile_px=16, max_per_tile=128, chunk=32,
                backend=backend,
            )
            return (
                jnp.mean((out.color - target) ** 2)
                + 0.1 * jnp.mean(out.depth)
                + 0.05 * jnp.mean(out.alpha)
            )

        params = scene.params()
        g_ref = jax.grad(lambda p: loss(p, "jnp"))(params)
        g_new = jax.grad(lambda p: loss(p, "pallas_train"))(params)
        for k in params:
            a, b = np.asarray(g_ref[k]), np.asarray(g_new[k])
            scale = np.abs(a).max() + 1e-8
            assert np.allclose(a, b, atol=2e-3 * scale + 1e-7), (
                k, np.abs(a - b).max(), scale
            )


def test_pallas_train_offset_grads_match(rng):
    """Screen-space (densification) gradients through the custom VJP must
    match the jnp path — these drive densify decisions on TPU."""
    import jax

    scene = make_random_scene(rng, n=32)
    _, cam = make_test_camera(height=32, width=32)

    def loss(offset, backend):
        out = render.render(
            scene, cam, tile_px=16, max_per_tile=64, chunk=32,
            mean2d_offset=offset, backend=backend,
        )
        return jnp.sum(out.color ** 2)

    z = jnp.zeros((scene.capacity, 2))
    g_ref = jax.grad(lambda o: loss(o, "jnp"))(z)
    g_new = jax.grad(lambda o: loss(o, "pallas_train"))(z)
    scale = np.abs(np.asarray(g_ref)).max() + 1e-8
    assert np.allclose(g_ref, g_new, atol=2e-3 * scale), (
        np.abs(np.asarray(g_ref) - np.asarray(g_new)).max(), scale
    )


def test_stream_blocks_matches_pairs_skewed(rng):
    """Block-aligned stream kernel vs the (tile, slot) pair kernel on a
    SKEWED load: most Gaussians piled into one corner tile, many tiles
    empty — exercises per-tile block counts 1..many, the one-sentinel-block
    empty-tile path, and dead capacity blocks."""
    from dge_tpu.ops import binning, pallas_composite, projection
    from tests.conftest import make_random_scene, make_test_camera

    import numpy as np

    scene = make_random_scene(rng, n=192)
    # pile 3/4 of the gaussians into one corner of the view
    xyz = np.asarray(scene.xyz).copy()
    xyz[:144, 0] = xyz[:144, 0] * 0.1 - 1.2
    xyz[:144, 1] = xyz[:144, 1] * 0.1 + 0.9
    scene = scene.replace(xyz=jnp.asarray(xyz))
    _, cam = make_test_camera(height=64, width=64)
    prep = projection.preprocess(
        scene.xyz, scene.get_scaling, scene.get_rotation, scene.get_opacity,
        scene.get_features, scene.alive, cam, scene.active_sh_degree,
        scene.max_sh_degree,
    )
    pb = binning.bin_gaussians_pairs(
        prep.mean2d, prep.depth, prep.radius, prep.visible,
        height=64, width=64, tile_px=16, max_per_tile=256,
    )
    kw = dict(
        height=64, width=64, tiles_x=4, tiles_y=4, tile_px=16,
        bg=jnp.array([0.2, 0.0, 0.4]), chunk=128,
    )
    ref = pallas_composite.composite_pairs_pallas(
        pb.pair_ids, pb.starts, pb.counts, prep.mean2d, prep.conic,
        prep.rgb, prep.depth, prep.opacity, max_per_tile=256, **kw)
    ap = binning.align_pairs(pb, chunk=128, id_sentinel=scene.capacity)
    out = pallas_composite.composite_stream_pallas(
        ap.ids, ap.block_tile, ap.n_real_blocks, prep.mean2d, prep.conic,
        prep.rgb, prep.depth, prep.opacity, **kw)
    # alignment shifts chunk boundaries, so the cumprod association (and
    # its roundoff) differs slightly — same tolerances as the jnp parity
    # (depth values are ~4x color scale)
    for a, b, tol in zip(out, ref, (1e-4, 1e-3, 2e-4)):
        assert np.allclose(a, b, atol=tol), np.abs(a - b).max()
