"""Fitting stage tests: optimizer parity knobs, refit convergence,
densify/prune invariants in padded buffers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dge_tpu.ops import losses as L
from dge_tpu.ops import render as R
from dge_tpu.systems import densify as D
from dge_tpu.systems import fit as F
from dge_tpu.systems import optim as O
from tests.conftest import make_random_scene, make_test_camera


class TestLosses:
    def test_l1_psnr(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.ones((8, 8, 3)) * 0.5
        assert np.isclose(float(L.l1_loss(a, b)), 0.5)
        assert np.isclose(float(L.psnr(a, b)), -10 * np.log10(0.25))

    def test_ssim_identity(self, rng):
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
        assert float(L.ssim(img, img)) > 0.999
        noisy = img + 0.2 * jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32))
        assert float(L.ssim(img, noisy)) < 0.95

    def test_expon_schedule_endpoints(self):
        s = L.expon_lr_schedule(1e-2, 1e-4, 100)
        assert np.isclose(float(s(0)), 1e-2, rtol=1e-3)
        assert np.isclose(float(s(100)), 1e-4, rtol=1e-3)
        assert np.isclose(float(s(50)), 1e-3, rtol=1e-3)  # log-linear midpoint


class TestOptimConfig:
    def test_scaled_matches_reference_defaults(self):
        # OptimizationParams (arguments/__init__.py:71-89)
        cfg = O.OptimConfig.scaled(1000)
        assert cfg.position_lr_init == 0.00016
        assert cfg.feature_lr == 0.0125
        assert cfg.opacity_lr == 0.05
        assert cfg.scaling_lr == 0.005
        assert cfg.rotation_lr == 0.001
        cfg2 = O.OptimConfig.scaled(1000, lr_scaler=1e-4)
        assert np.isclose(cfg2.position_lr_init, 1.6e-8)

    def test_grad_mask_skips_rotation(self, rng):
        grads = {
            k: jnp.ones((4, 2))
            for k in ("xyz", "features_dc", "features_rest", "opacity", "scaling",
                      "rotation")
        }
        mask = jnp.array([1.0, 0.0, 1.0, 0.0])
        alive = jnp.array([True, True, True, False])
        out = O.apply_grad_mask(grads, mask, alive)
        assert np.allclose(np.asarray(out["xyz"])[:, 0], [1, 0, 1, 0])
        # rotation only alive-masked (reference hooks exclude _rotation,
        # gaussian_model.py:851)
        assert np.allclose(np.asarray(out["rotation"])[:, 0], [1, 1, 1, 0])


class TestRefit:
    def test_refit_recovers_target(self, rng):
        """Config-2 miniature: fit a perturbed scene back to its own render."""
        scene = make_random_scene(rng, n=48, capacity=64)
        _, cam = make_test_camera(height=32, width=32)
        bg = jnp.zeros(3)
        target = R.render(scene, cam, bg, tile_px=16, max_per_tile=64).color

        # perturb colors + opacity
        pert = scene.replace(
            features_dc=scene.features_dc
            + 0.5 * jnp.asarray(rng.normal(size=scene.features_dc.shape)),
            opacity=scene.opacity - 1.0,
        )
        cfg = O.OptimConfig.scaled(200)
        loop = F.FitLoop(cfg, tile_px=16, max_per_tile=64, chunk=16)
        opt_state, fit_state = loop.init(pert)

        s = pert
        first_psnr = None
        for i in range(60):
            s, opt_state, fit_state, aux = loop.train_step(
                s, opt_state, fit_state, cam, target, bg
            )
            if first_psnr is None:
                first_psnr = float(aux["psnr"])
        final_psnr = float(aux["psnr"])
        assert final_psnr > first_psnr + 3.0, (first_psnr, final_psnr)


class TestDensify:
    def _stats(self, cap, hot_idx, hot_val=1.0):
        ga = np.zeros(cap, np.float32)
        ga[hot_idx] = hot_val
        return jnp.asarray(ga), jnp.asarray(np.ones(cap, np.float32))

    def test_clone_small_gaussian(self, rng):
        scene = make_random_scene(rng, n=8, capacity=16)
        # make all scales tiny -> clone path
        scene = scene.replace(scaling=jnp.full_like(scene.scaling, -6.0))
        ga, denom = self._stats(16, [2])
        s2, info = D.densify_and_prune(
            scene, ga, denom, jnp.zeros(16), jax.random.PRNGKey(0),
            max_grad=0.5, max_densify_percent=1.0, min_opacity=0.0,
            extent=1.0, max_screen_size=0.0, percent_dense=0.01,
        )
        assert int(info.n_cloned) == 1
        assert int(info.n_split) == 0
        assert int(s2.n_alive) == 9
        # clone copies params
        dest = np.where(np.asarray(s2.alive) & ~np.asarray(scene.alive))[0]
        assert np.allclose(np.asarray(s2.xyz)[dest[0]], np.asarray(scene.xyz)[2])

    def test_split_large_gaussian(self, rng):
        scene = make_random_scene(rng, n=8, capacity=16)
        scaling = np.full((16, 3), -6.0, np.float32)
        scaling[3] = np.log(0.5)  # large -> split path (0.5 > pd*extent)
        scene = scene.replace(scaling=jnp.asarray(scaling))
        ga, denom = self._stats(16, [3])
        s2, info = D.densify_and_prune(
            scene, ga, denom, jnp.zeros(16), jax.random.PRNGKey(0),
            max_grad=0.5, max_densify_percent=1.0, min_opacity=0.0,
            extent=1.0, max_screen_size=0.0, percent_dense=0.01,
        )
        assert int(info.n_split) == 1
        assert not bool(np.asarray(s2.alive)[3])  # source pruned
        assert int(s2.n_alive) == 9  # -1 source +2 children
        # children scales = source/1.6 (densify_and_split /(0.8*N))
        new = np.where(np.asarray(s2.alive) & ~np.asarray(scene.alive))[0]
        assert len(new) == 2
        assert np.allclose(
            np.exp(np.asarray(s2.scaling)[new]), 0.5 / 1.6, atol=1e-5
        )

    def test_prune_low_opacity(self, rng):
        scene = make_random_scene(rng, n=8, capacity=16)
        op = np.asarray(scene.opacity).copy()
        op[5] = -10.0  # sigmoid ~ 0
        scene = scene.replace(opacity=jnp.asarray(op))
        ga, denom = self._stats(16, [])
        s2, info = D.densify_and_prune(
            scene, ga, denom, jnp.zeros(16), jax.random.PRNGKey(0),
            max_grad=0.5, max_densify_percent=1.0, min_opacity=0.005,
            extent=1.0, max_screen_size=0.0, percent_dense=0.01,
        )
        assert int(info.n_pruned) == 1
        assert not bool(np.asarray(s2.alive)[5])

    def test_capacity_overflow_reported(self, rng):
        scene = make_random_scene(rng, n=15, capacity=16)
        scene = scene.replace(scaling=jnp.full_like(scene.scaling, -6.0))
        ga, denom = self._stats(16, list(range(15)))
        s2, info = D.densify_and_prune(
            scene, ga, denom, jnp.zeros(16), jax.random.PRNGKey(0),
            max_grad=0.5, max_densify_percent=1.0, min_opacity=0.0,
            extent=1.0, max_screen_size=0.0, percent_dense=0.01,
        )
        assert int(info.n_cloned) == 1  # only one free slot
        assert int(info.dropped) == 14
        assert int(s2.n_alive) == 16

    def test_grad_mask_blocks_densify(self, rng):
        scene = make_random_scene(rng, n=8, capacity=16)
        scene = scene.replace(
            scaling=jnp.full_like(scene.scaling, -6.0),
            grad_mask=scene.grad_mask.at[2].set(0.0),
        )
        ga, denom = self._stats(16, [2])
        s2, info = D.densify_and_prune(
            scene, ga, denom, jnp.zeros(16), jax.random.PRNGKey(0),
            max_grad=0.5, max_densify_percent=1.0, min_opacity=0.0,
            extent=1.0, max_screen_size=0.0, percent_dense=0.01,
        )
        assert int(info.n_cloned) == 0

    def test_reset_opacity(self, rng):
        scene = make_random_scene(rng, n=8, capacity=16)
        s2, rows = D.reset_opacity(scene)
        op = np.asarray(s2.get_opacity)[:8]
        assert np.all(op <= 0.0101)

    def test_grow_capacity(self, rng):
        scene = make_random_scene(rng, n=8, capacity=16)
        s2 = D.grow_capacity(scene, 32)
        assert s2.capacity == 32
        assert int(s2.n_alive) == 8
        assert np.allclose(np.asarray(s2.xyz)[:8], np.asarray(scene.xyz)[:8])


class TestHousekeepFinalStep:
    def test_no_opacity_reset_on_final_step(self, rng):
        """A run whose max_steps is a reset multiple must NOT export a
        freshly-reset (transparent) scene — the reference saves before its
        reset block (train.py). Regression for the 6000-step fit that
        saved at reset boundary 6000 (eval PSNR 16 vs train 37)."""
        import jax
        import jax.numpy as jnp

        from dge_tpu.systems import fit as F
        from dge_tpu.systems import optim as O
        from tests.conftest import make_random_scene, make_test_camera

        scene = make_random_scene(rng, n=32, capacity=64)
        scene = scene.replace(opacity=scene.opacity + 3.0)  # clearly opaque
        _, cam = make_test_camera(height=16, width=16)
        cfg = O.OptimConfig.scaled(
            4, opacity_reset_interval=2, densify_from_iter=1000
        )
        loop = F.FitLoop(cfg, tile_px=16, max_per_tile=32, chunk=16)
        opt_state, fit_state = loop.init(scene)
        target = jnp.zeros((16, 16, 3))
        bg = jnp.zeros(3)
        reset_seen = False
        for step in range(4):
            scene, opt_state, fit_state, _ = loop.train_step(
                scene, opt_state, fit_state, cam, target, bg
            )
            before = float(jnp.max(scene.get_opacity))
            scene, opt_state, fit_state = loop.maybe_housekeep(
                scene, opt_state, fit_state
            )
            after = float(jnp.max(scene.get_opacity))
            if int(fit_state.step) == 2:
                # mid-run reset fires (interval 2)
                assert after < before, (before, after)
                reset_seen = True
            if int(fit_state.step) == 4:
                # final step: reset suppressed
                assert after == before, (before, after)
        assert reset_seen


class TestSpillLadder:
    def test_tight_cull_is_first_response(self, rng):
        """react_to_spill ladder: enable exact tight culling first (free
        quality, no cap growth), then grow max_tiles_per_gaussian and the
        stream caps on further persistent spill."""
        cfg = O.OptimConfig.scaled(4)
        loop = F.FitLoop(cfg, tile_px=16, max_per_tile=32, chunk=16,
                         spill_patience=2)
        assert not loop.tight_cull
        assert not loop.react_to_spill(100, 64)  # patience not reached
        assert loop.react_to_spill(100, 64)
        assert loop.tight_cull
        m0, k0 = loop.max_tiles_per_gaussian, loop.max_per_tile
        assert not loop.react_to_spill(100, 64)
        assert loop.react_to_spill(100, 64)
        assert loop.max_tiles_per_gaussian == 2 * m0
        assert loop.max_per_tile == 2 * k0
        assert loop.small_slots == 8  # bucket threshold grows with the rung
        # spill clearing resets the streak
        assert not loop.react_to_spill(0, 64)
        assert not loop.react_to_spill(100, 64)

    def test_fit_with_tight_cull_matches(self, rng):
        """A short fit with tight_cull on reaches the same loss as without
        (the cull is exact for gradients)."""
        scene = make_random_scene(rng, n=24, capacity=32)
        _, cam = make_test_camera(height=16, width=16)
        target = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        bg = jnp.zeros(3)
        cfg = O.OptimConfig.scaled(4, densify_from_iter=1000)
        results = []
        for cull in (False, True):
            s = scene
            loop = F.FitLoop(cfg, tile_px=16, max_per_tile=64, chunk=16,
                             tight_cull=cull)
            opt_state, fit_state = loop.init(s)
            for _ in range(5):
                s, opt_state, fit_state, aux = loop.train_step(
                    s, opt_state, fit_state, cam, target, bg
                )
            results.append(float(aux["loss"]))
        assert np.allclose(results[0], results[1], rtol=1e-5), results
