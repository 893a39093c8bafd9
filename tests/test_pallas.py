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

    @pytest.mark.slow
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
