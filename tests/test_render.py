"""Rasterizer correctness: tiled renderer vs naive per-pixel oracle,
gradient checks, apply_weights mask lifting."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dge_tpu.ops import naive, render
from tests.conftest import make_random_scene, make_test_camera


class TestForwardVsOracle:
    @pytest.mark.parametrize("angle", [0.0, 1.1, 2.5])
    def test_matches_naive(self, rng, angle):
        scene = make_random_scene(rng, n=48)
        _, cam = make_test_camera(height=48, width=64, angle=angle)
        bg = jnp.array([0.1, 0.2, 0.3])
        out = render.render(scene, cam, bg, tile_px=16, max_per_tile=64)
        ref = naive.render_naive(scene, cam, np.array([0.1, 0.2, 0.3]), tile_px=16)
        assert np.allclose(out.color, ref["color"], atol=2e-5), (
            np.abs(np.asarray(out.color) - ref["color"]).max()
        )
        assert np.allclose(out.depth, ref["depth"], atol=2e-4)
        assert np.allclose(1.0 - np.asarray(out.alpha), ref["final_T"], atol=2e-5)

    def test_dead_slots_ignored(self, rng):
        scene = make_random_scene(rng, n=30, capacity=None)
        # capacity is padded; dead rows must not render
        _, cam = make_test_camera(height=32, width=32)
        out = render.render(scene, cam, tile_px=16, max_per_tile=64)
        # corrupt dead rows wildly; output must not change
        xyz = np.asarray(scene.xyz).copy()
        xyz[30:] = 0.0  # in front of camera
        scene2 = scene.replace(
            xyz=jnp.asarray(xyz),
            opacity=scene.opacity.at[30:].set(5.0),
            scaling=scene.scaling.at[30:].set(0.0),
        )
        out2 = render.render(scene2, cam, tile_px=16, max_per_tile=64)
        assert np.allclose(out.color, out2.color, atol=1e-6)

    def test_opaque_gaussian_occludes(self, rng):
        # two gaussians on the optical axis: near one opaque -> far invisible
        from dge_tpu.scene import gaussians as G

        from dge_tpu.scene.gaussians import rgb_to_sh

        xyz = np.array([[0, 0, 0], [0, 0, 1.0]], np.float32)  # cam at -z
        fdc = rgb_to_sh(
            np.array([[[1.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]]], np.float32)
        )
        scene = G.from_arrays(
            xyz,
            fdc,
            np.zeros((2, 0, 3), np.float32),
            np.full((2, 1), 12.0, np.float32),  # sigmoid ~ 1
            np.full((2, 3), np.log(0.3), np.float32),
            np.tile(np.array([1, 0, 0, 0], np.float32), (2, 1)),
            max_sh_degree=0,
        )
        _, cam = make_test_camera(height=32, width=32)
        out = render.render(scene, cam, tile_px=16, max_per_tile=64)
        center = np.asarray(out.color)[16, 16]
        assert center[0] > 0.85 and center[1] < 0.1, center

    def test_spill_reported(self, rng):
        scene = make_random_scene(rng, n=256)
        _, cam = make_test_camera(height=32, width=32)
        out = render.render(scene, cam, tile_px=16, max_per_tile=8)
        assert int(out.spill) > 0


class TestGradients:
    @pytest.mark.slow
    def test_finite_difference_params(self, rng):
        scene = make_random_scene(rng, n=12, capacity=16)
        _, cam = make_test_camera(height=24, width=24)
        target = jnp.asarray(rng.uniform(size=(24, 24, 3)).astype(np.float32))

        def loss_fn(params):
            s = scene.with_params(params)
            out = render.render(s, cam, tile_px=8, max_per_tile=32)
            return jnp.mean((out.color - target) ** 2)

        params = scene.params()
        grads = jax.grad(loss_fn)(params)
        # central finite differences on a few random coordinates of each leaf
        eps = 3e-4
        for name in ("xyz", "opacity", "scaling", "rotation", "features_dc"):
            leaf = params[name]
            flat = np.asarray(leaf).ravel()
            g_flat = np.asarray(grads[name]).ravel()
            idxs = rng.choice(
                min(12 * int(np.prod(leaf.shape[1:])), flat.size),
                size=5,
                replace=False,
            )
            for i in idxs:
                fp = dict(params)
                pert = flat.copy()
                pert[i] += eps
                fp[name] = jnp.asarray(pert.reshape(leaf.shape))
                lp = float(loss_fn(fp))
                pert[i] -= 2 * eps
                fp[name] = jnp.asarray(pert.reshape(leaf.shape))
                lm = float(loss_fn(fp))
                fd = (lp - lm) / (2 * eps)
                assert np.isclose(fd, g_flat[i], rtol=0.08, atol=3e-4), (
                    f"{name}[{i}]: fd={fd} vs ad={g_flat[i]}"
                )

    def test_mean2d_offset_grads(self, rng):
        # densification-stat harvesting: grads w.r.t. screen-space means
        scene = make_random_scene(rng, n=16)
        _, cam = make_test_camera(height=24, width=24)

        def loss_fn(offset):
            out = render.render(
                scene, cam, tile_px=8, max_per_tile=64, mean2d_offset=offset
            )
            return jnp.sum(out.color**2)

        g = jax.grad(loss_fn)(jnp.zeros((scene.capacity, 2)))
        vis = np.asarray(
            render.render(scene, cam, tile_px=8, max_per_tile=64).visible
        )
        gn = np.linalg.norm(np.asarray(g), axis=1)
        assert np.any(gn[vis] > 0)
        assert np.all(gn[~vis] == 0)


class TestApplyWeights:
    def test_full_mask_counts(self, rng):
        scene = make_random_scene(rng, n=32)
        _, cam = make_test_camera(height=32, width=32)
        ones = jnp.ones((32, 32))
        w, c = render.render_weights(scene, cam, ones, tile_px=16, max_per_tile=64)
        w, c = np.asarray(w), np.asarray(c)
        # full mask: weight == hit count for every gaussian
        assert np.allclose(w, c)
        assert w.sum() > 0

    def test_half_mask_localizes(self, rng):
        # gaussians on the left/right halves get weights matching mask side
        from dge_tpu.scene import gaussians as G

        xs = np.linspace(-1.5, 1.5, 8).astype(np.float32)
        xyz = np.stack([xs, np.zeros(8), np.zeros(8)], axis=1)
        scene = G.from_arrays(
            xyz,
            np.zeros((8, 1, 3), np.float32),
            np.zeros((8, 0, 3), np.float32),
            np.full((8, 1), 2.0, np.float32),
            np.full((8, 3), np.log(0.08), np.float32),
            np.tile(np.array([1, 0, 0, 0], np.float32), (8, 1)),
            max_sh_degree=0,
        )
        _, cam = make_test_camera(height=32, width=32)
        mask = jnp.zeros((32, 32)).at[:, 16:].set(1.0)  # right half of image
        w, c = render.render_weights(scene, cam, mask, tile_px=16, max_per_tile=64)
        w, c = np.asarray(w)[:8], np.asarray(c)[:8]
        frac = w / np.maximum(c, 1)
        # camera looks from -z with up=+y; in the right-handed
        # x-right/y-down/z-forward camera frame, world -x projects to the
        # right half of the image
        assert frac[0] > 0.9  # world -x gaussian fully inside right-half mask
        assert frac[-1] < 0.1  # world +x gaussian outside the mask


class TestBinningVariants:
    def test_pair_sort_matches_scan(self, rng):
        """The default duplicate-and-sort binning must agree with the
        prefix-sum compaction oracle entry for entry."""
        from dge_tpu.ops import binning, projection

        scene = make_random_scene(rng, n=256)
        _, cam = make_test_camera(height=64, width=64)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        kw = dict(height=64, width=64, tile_px=16, max_per_tile=64)
        a = binning.bin_gaussians(
            prep.mean2d, prep.depth, prep.radius, prep.visible, **kw
        )
        b = binning.bin_gaussians_scan(
            prep.mean2d, prep.depth, prep.radius, prep.visible, **kw
        )
        assert np.array_equal(np.asarray(a.counts), np.asarray(b.counts))
        # a.lists hold original ids (order=None); b.lists index into b.order
        assert a.order is None
        order = np.asarray(b.order)
        ac, bc = np.asarray(a.lists), np.asarray(b.lists)
        for t in range(ac.shape[0]):
            c = int(a.counts[t])
            assert np.array_equal(ac[t, :c], order[bc[t, :c]]), t
        assert int(a.spill) == int(b.spill)

    def test_compact_pair_sort_matches_full(self, rng):
        """Prefix-sum compaction before the pair sort (the production path)
        must reproduce the sort-everything stream exactly."""
        from dge_tpu.ops import binning, projection

        scene = make_random_scene(rng, n=256)
        _, cam = make_test_camera(height=64, width=64)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        kw = dict(
            height=64, width=64, tile_px=16, max_per_tile=64,
            max_tiles_per_gaussian=16, max_pairs=2048,
        )
        a = binning._pair_sort(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            compact_sort=True, **kw,
        )
        b = binning._pair_sort(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            compact_sort=False, **kw,
        )
        assert np.array_equal(np.asarray(a.counts), np.asarray(b.counts))
        assert np.array_equal(np.asarray(a.starts), np.asarray(b.starts))
        assert int(a.spill) == int(b.spill)
        pa, pb = np.asarray(a.pair_ids), np.asarray(b.pair_ids)
        # compare the valid stream ranges per tile (garbage beyond counts
        # may differ)
        for t in range(a.starts.shape[0]):
            s, c = int(a.starts[t]), int(a.counts[t])
            assert np.array_equal(pa[s:s + c], pb[s:s + c]), t

    def test_bucketed_emission_matches_flat(self, rng):
        """Two-tier key emission (small 4-slot grid + compacted large grid)
        covers exactly the same pairs as the flat [N, M] grid; order may
        differ only between equal [tile|qdepth] keys."""
        from dge_tpu.ops import binning, projection

        scene = make_random_scene(rng, n=256)
        _, cam = make_test_camera(height=64, width=64)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        kw = dict(
            height=64, width=64, tile_px=16, max_per_tile=256,
            max_tiles_per_gaussian=16, max_pairs=4096,
        )
        a = binning._pair_sort(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            compact_sort=False, emission="bucketed", big_capacity=256, **kw,
        )
        b = binning._pair_sort(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            compact_sort=False, emission="flat", **kw,
        )
        assert np.array_equal(np.asarray(a.counts), np.asarray(b.counts))
        assert int(a.spill) == int(b.spill)
        pa, pb = np.asarray(a.pair_ids), np.asarray(b.pair_ids)
        depth = np.asarray(prep.depth)
        for t in range(a.counts.shape[0]):
            ca = int(a.counts[t])
            sa, sb = int(a.starts[t]), int(b.starts[t])
            ia, ib = pa[sa:sa + ca], pb[sb:sb + ca]
            assert sorted(ia) == sorted(ib), t  # same pair set
            # both streams are depth-ordered within the tile
            assert (np.diff(depth[ia]) > -1e-4).all(), t
            assert (np.diff(depth[ib]) > -1e-4).all(), t

    def test_bucketed_emission_large_scales_matches_flat(self, rng):
        """Bucketed emission parity at wide slot caps (mtg=64) on a scene
        with an inflated large-Gaussian population — same counts, same
        per-tile pair sets, same spill as the flat grid, with and without
        culling. (Also the regression net for the deleted round-5 mid
        tier: any emission restructure must keep this exact.)"""
        from dge_tpu.ops import binning, projection

        scene = make_random_scene(rng, n=256)
        # inflate some scales so all three classes are populated
        bump = (np.arange(scene.capacity) % 7 == 0).astype(np.float32) * 2.0
        scene = scene.replace(
            scaling=scene.scaling + jnp.asarray(bump)[:, None]
        )
        _, cam = make_test_camera(height=128, width=128)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        for cull in (False, True):
            ckw = (dict(conic=prep.conic, opacity=prep.opacity)
                   if cull else {})
            kw = dict(
                height=128, width=128, tile_px=16, max_per_tile=512,
                max_tiles_per_gaussian=64, max_pairs=16384,
                compact_sort=False, small_slots=4, **ckw,
            )
            a = binning._pair_sort(
                prep.mean2d, prep.depth, prep.radius, prep.visible,
                emission="bucketed", big_capacity=256, **kw,
            )
            b = binning._pair_sort(
                prep.mean2d, prep.depth, prep.radius, prep.visible,
                emission="flat", **kw,
            )
            assert np.array_equal(np.asarray(a.counts), np.asarray(b.counts)), cull
            assert int(a.spill) == int(b.spill), cull
            pa, pb = np.asarray(a.pair_ids), np.asarray(b.pair_ids)
            for t in range(a.counts.shape[0]):
                ca = int(a.counts[t])
                sa, sb = int(a.starts[t]), int(b.starts[t])
                assert sorted(pa[sa:sa + ca]) == sorted(pb[sb:sb + ca]), (
                    cull, t)

    def test_bucketed_big_overflow_degrades_gracefully(self, rng):
        """Big Gaussians beyond the slot capacity keep their first
        small_slots tiles (partial coverage + counted spill) instead of
        vanishing entirely."""
        from dge_tpu.ops import binning, projection

        scene = make_random_scene(rng, n=256)
        _, cam = make_test_camera(height=64, width=64)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        kw = dict(
            height=64, width=64, tile_px=16, max_per_tile=256,
            max_tiles_per_gaussian=16, max_pairs=4096, compact_sort=False,
            small_slots=1,  # force most multi-tile Gaussians into the big grid
        )
        full = binning._pair_sort(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            emission="bucketed", big_capacity=256, **kw,
        )
        tiny = binning._pair_sort(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            emission="bucketed", big_capacity=1, **kw,
        )
        # overflow drops pairs (counted), but every Gaussian that appears
        # in the full stream still appears somewhere in the degraded one
        assert int(tiny.spill) > int(full.spill)
        ids_full, ids_tiny = set(), set()
        for t in range(full.starts.shape[0]):
            s, c = int(full.starts[t]), int(full.counts[t])
            ids_full.update(np.asarray(full.pair_ids[s:s + c]).tolist())
            s, c = int(tiny.starts[t]), int(tiny.counts[t])
            ids_tiny.update(np.asarray(tiny.pair_ids[s:s + c]).tolist())
        assert ids_full == ids_tiny

    def test_pair_sort_overflow_spill_reported(self, rng):
        """When the valid pairs exceed max_pairs, the compact path reports
        the overflow in spill instead of silently dropping."""
        from dge_tpu.ops import binning, projection

        scene = make_random_scene(rng, n=256)
        _, cam = make_test_camera(height=64, width=64)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        out = binning.bin_gaussians_pairs(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            height=64, width=64, tile_px=16, max_per_tile=64,
            max_tiles_per_gaussian=16, max_pairs=32,
        )
        assert int(out.spill) > 0


class TestTightCulling:
    """Exactness of binning.tile_keep_mask (tight tile culling): pairs are
    dropped only when no pixel of the tile could composite the Gaussian at
    alpha >= 1/255 — the kernels' hard skip threshold — so renders (and
    gradients) are unchanged while the pair stream shrinks."""

    def test_keep_mask_matches_bruteforce(self, rng):
        from dge_tpu.ops import binning, projection

        scene = make_random_scene(rng, n=96, scale_rng=(-3.5, -1.0))
        _, cam = make_test_camera(height=64, width=64)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        tile_px = 16
        tiles = 64 // tile_px
        cap = scene.capacity
        tx = jnp.broadcast_to(jnp.arange(tiles * tiles) % tiles, (cap, tiles * tiles))
        ty = jnp.broadcast_to(jnp.arange(tiles * tiles) // tiles, (cap, tiles * tiles))
        keep = np.asarray(binning.tile_keep_mask(
            prep.mean2d, prep.conic, prep.opacity, tx, ty, tile_px))

        mean2d = np.asarray(prep.mean2d)
        conic = np.asarray(prep.conic)
        op = np.asarray(prep.opacity)
        vis = np.asarray(prep.visible)
        # brute-force max alpha over each tile's pixel grid
        n_culled_visible = 0
        for i in range(96):
            if not vis[i]:
                continue
            for t in range(tiles * tiles):
                x0 = (t % tiles) * tile_px
                y0 = (t // tiles) * tile_px
                xs, ys = np.meshgrid(
                    np.arange(x0, x0 + tile_px), np.arange(y0, y0 + tile_px)
                )
                dx = mean2d[i, 0] - xs
                dy = mean2d[i, 1] - ys
                q = (conic[i, 0] * dx * dx + 2 * conic[i, 1] * dx * dy
                     + conic[i, 2] * dy * dy)
                amax = op[i] * np.exp(-0.5 * q.min())
                if not keep[i, t]:
                    # culled pairs must be invisible at every pixel
                    assert amax < 1.0 / 255.0, (i, t, amax)
                    n_culled_visible += 1
        # the test scene is anisotropic enough that culling must fire
        assert n_culled_visible > 0

    @pytest.mark.parametrize("backend", ["jnp", "pallas_stream"])
    def test_render_unchanged(self, rng, backend):
        if backend == "pallas_stream" and jax.default_backend() == "cpu":
            pytest.skip("pallas kernels are TPU-only")
        scene = make_random_scene(rng, n=128, scale_rng=(-3.5, -1.0))
        _, cam = make_test_camera(height=64, width=64)
        bg = jnp.array([0.2, 0.1, 0.4])
        kw = dict(tile_px=16, max_per_tile=256, backend=backend)
        out = render.render(scene, cam, bg, tight_cull=True, **kw)
        ref = render.render(scene, cam, bg, tight_cull=False, **kw)
        assert np.allclose(out.color, ref.color, atol=1e-6)
        assert np.allclose(out.depth, ref.depth, atol=1e-6)
        assert np.allclose(out.alpha, ref.alpha, atol=1e-6)

    def test_grads_unchanged(self, rng):
        scene = make_random_scene(rng, n=64, scale_rng=(-3.5, -1.0))
        _, cam = make_test_camera(height=48, width=48)

        def loss(xyz, opacity, scaling, tight):
            s = scene.replace(xyz=xyz, opacity=opacity, scaling=scaling)
            out = render.render(s, cam, tile_px=16, max_per_tile=256,
                                tight_cull=tight)
            return jnp.sum(out.color ** 2) + jnp.sum(out.depth)

        g1 = jax.grad(loss, argnums=(0, 1, 2))(
            scene.xyz, scene.opacity, scene.scaling, True)
        g0 = jax.grad(loss, argnums=(0, 1, 2))(
            scene.xyz, scene.opacity, scene.scaling, False)
        for a, b in zip(g1, g0):
            assert np.allclose(a, b, atol=1e-6), np.abs(a - b).max()

    def test_compaction_recovers_capped_tiles(self, rng):
        """Cull-then-compact for big Gaussians: a thin diagonal splat whose
        tile RECT far exceeds max_tiles_per_gaussian but whose true
        (visible) footprint fits — with tight culling the slots hold the
        surviving tiles (full coverage, no spill); without it the slots
        fill with mostly-invisible rect tiles and the rest spills."""
        from dge_tpu.ops import binning, projection
        from dge_tpu.scene import gaussians as G

        n = 6
        xyz = (rng.normal(size=(n, 3)) * 0.4).astype(np.float32)
        fdc = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.3
        frest = np.zeros((n, 3, 3), np.float32)
        opacity = np.full((n, 1), 3.0, np.float32)
        # one long axis, two tiny: an extremely anisotropic splat
        scaling = np.tile(np.array([[-0.8, -4.0, -4.0]], np.float32), (n, 1))
        th = math.pi / 8  # 45 deg about the view axis
        quat = np.tile(
            np.array([[math.cos(th), 0.0, 0.0, math.sin(th)]], np.float32),
            (n, 1),
        )
        scene = G.from_arrays(xyz, fdc, frest, opacity, scaling, quat,
                              max_sh_degree=1)
        _, cam = make_test_camera(height=128, width=128)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        kw = dict(height=128, width=128, tile_px=16, max_per_tile=256)
        cull = dict(conic=prep.conic, opacity=prep.opacity)

        def pair_set(pb):
            ids = np.asarray(pb.pair_ids)
            st = np.asarray(pb.starts)
            ct = np.asarray(pb.counts)
            return {
                (t, ids[st[t] + i])
                for t in range(len(st))
                for i in range(ct[t])
            }

        m_small = 16
        a = binning.bin_gaussians_pairs(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            max_tiles_per_gaussian=m_small, **kw, **cull)
        a_nocull = binning.bin_gaussians_pairs(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            max_tiles_per_gaussian=m_small, **kw)
        full = binning.bin_gaussians_pairs(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            max_tiles_per_gaussian=64, **kw, **cull)
        # the test is only meaningful if the rects actually exceed m_small
        assert int(a_nocull.spill) > 0
        # compacted slots recover the full surviving footprint
        assert pair_set(a) == pair_set(full)
        assert int(a.spill) == 0

    def test_cull_small_tile_grid(self, rng):
        """num_tiles < max_tiles_per_gaussian: the packed big-Gaussian grid
        is narrower than the slot count (regression: shape mismatch)."""
        from dge_tpu.ops import binning, projection

        scene = make_random_scene(rng, n=64, scale_rng=(-3.0, -1.0))
        _, cam = make_test_camera(height=32, width=32)
        prep = projection.preprocess(
            scene.xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, scene.get_features, scene.alive, cam,
            scene.active_sh_degree, scene.max_sh_degree,
        )
        kw = dict(height=32, width=32, tile_px=16, max_per_tile=128)
        a = binning.bin_gaussians_pairs(
            prep.mean2d, prep.depth, prep.radius, prep.visible,
            conic=prep.conic, opacity=prep.opacity, **kw)
        b = binning.bin_gaussians_pairs(
            prep.mean2d, prep.depth, prep.radius, prep.visible, **kw)
        # culled stream is a subset of the uncapped one per tile
        ids_a, ids_b = np.asarray(a.pair_ids), np.asarray(b.pair_ids)
        for t in range(4):
            la = ids_a[int(a.starts[t]):int(a.starts[t]) + int(a.counts[t])]
            lb = ids_b[int(b.starts[t]):int(b.starts[t]) + int(b.counts[t])]
            assert set(la) <= set(lb)

    def test_margin_covers_kernel_roundoff_high_aspect(self, rng):
        """The compositor groups the power as -0.5*(a dx^2 + c dy^2) -
        b dx dy while the cull minimizes a u^2 + 2b uv + c v^2; for
        high-aspect conics the terms cancel catastrophically and the two
        f32 evaluations diverge by far more than a fixed epsilon
        (observed 2.7e-3 at aspect ~136; the qabs-proportional margin term
        covers it with ~100x headroom). Opacities here are TUNED so every
        (Gaussian, target-tile) pair sits within a few 1e-3 of the cull
        threshold, maximizing sensitivity to the invariant: no culled pair
        may have a pixel the f32 kernel composites."""
        from dge_tpu.ops import binning

        n = 4096
        tile_px = 16
        tiles = 8  # 128^2 image
        lam1 = rng.uniform(0.2, 0.6, size=n).astype(np.float32)
        aspect = rng.uniform(30.0, 500.0, size=n).astype(np.float32)
        lam2 = lam1 / aspect
        th = rng.uniform(0, np.pi, size=n).astype(np.float32)
        ct, st = np.cos(th), np.sin(th)
        a = (lam1 * ct * ct + lam2 * st * st).astype(np.float32)
        c = (lam1 * st * st + lam2 * ct * ct).astype(np.float32)
        b = ((lam1 - lam2) * ct * st).astype(np.float32)
        m_np = rng.uniform(-40, 168, size=(n, 2)).astype(np.float32)

        # f64 pixel-grid min q of one random target tile per Gaussian, with
        # kernel grouping; tune opacity so qcut lands within +-5e-3 of it
        ttile = rng.integers(0, tiles * tiles, size=n)
        px = np.arange(tile_px, dtype=np.float64)
        gx, gy = np.meshgrid(px, px)
        x0 = (ttile % tiles) * tile_px
        y0 = (ttile // tiles) * tile_px
        dx = m_np[:, 0, None, None].astype(np.float64) - (x0[:, None, None] + gx)
        dy = m_np[:, 1, None, None].astype(np.float64) - (y0[:, None, None] + gy)
        q64 = (a[:, None, None].astype(np.float64) * dx * dx
               + 2.0 * b[:, None, None].astype(np.float64) * dx * dy
               + c[:, None, None].astype(np.float64) * dy * dy)
        qmin64 = np.maximum(q64.min(axis=(1, 2)), 0.0)
        eps = rng.uniform(-5e-3, 5e-3, size=n)
        opacity = np.clip(
            np.exp((qmin64 + eps) / 2.0) / 255.0, 1e-6, 0.999
        ).astype(np.float32)

        conic = jnp.asarray(np.stack([a, b, c], 1))
        mean2d = jnp.asarray(m_np)
        nt = tiles * tiles
        tx = jnp.broadcast_to(jnp.arange(nt) % tiles, (n, nt))
        ty = jnp.broadcast_to(jnp.arange(nt) // tiles, (n, nt))
        keep = np.asarray(binning.tile_keep_mask(
            mean2d, conic, jnp.asarray(opacity), tx, ty, tile_px))

        # kernel-f32 max alpha per CULLED (gaussian, tile): must be < 1/255
        pxf = np.arange(tile_px, dtype=np.float32)
        gxf, gyf = np.meshgrid(pxf, pxf)
        violations = 0
        culled_checked = 0
        for t in range(nt):
            xt = (t % tiles) * tile_px
            yt = (t // tiles) * tile_px
            rows = np.where(~keep[:, t])[0]
            if rows.size == 0:
                continue
            dxf = (m_np[rows, 0, None, None] - (xt + gxf)[None]).astype(np.float32)
            dyf = (m_np[rows, 1, None, None] - (yt + gyf)[None]).astype(np.float32)
            power = (
                np.float32(-0.5)
                * (a[rows, None, None] * dxf * dxf
                   + c[rows, None, None] * dyf * dyf)
                - b[rows, None, None] * dxf * dyf
            ).astype(np.float32)
            power = np.minimum(power, 0.0)  # kernel skips power > 0
            amax = (opacity[rows, None, None]
                    * np.exp(power)).max(axis=(1, 2))
            violations += int((amax >= 1.0 / 255.0).sum())
            culled_checked += rows.size
        assert culled_checked > 10000  # the sweep must actually cull
        assert violations == 0, f"{violations} culled-but-compositable pairs"


class TestSpillFreeRenderer:
    def test_grows_until_spill_free_and_matches_big_caps(self, rng):
        """Starting from deliberately tiny caps, the ladder must clear the
        spill and reproduce a direct render at generous caps exactly."""
        scene = make_random_scene(rng, n=256)
        _, cam = make_test_camera(height=64, width=64)
        bg = jnp.array([0.1, 0.2, 0.3])

        grew = []
        r = render.SpillFreeRenderer(
            scene, bg, tile_px=16,
            # tiny enough that the probe must climb several rungs
            max_per_tile=4, max_tiles_per_gaussian=4, max_pairs=256,
            big_capacity=64, log=grew.append,
        )
        first = r.caps
        residual = r.probe(cam)
        assert residual == 0
        assert grew, "expected at least one growth rung"
        assert r.caps["max_per_tile"] > first["max_per_tile"]
        color, sp = r(cam)
        assert sp == 0

        ref = render.render(
            scene, cam, bg, tile_px=16, max_per_tile=2048,
            max_tiles_per_gaussian=32,
        )
        assert int(ref.spill) == 0
        assert np.allclose(np.asarray(color), np.asarray(ref.color), atol=1e-5)

    def test_no_growth_when_caps_suffice(self, rng):
        scene = make_random_scene(rng, n=64)
        _, cam = make_test_camera(height=32, width=32)
        grew = []
        r = render.SpillFreeRenderer(scene, None, tile_px=16, log=grew.append)
        assert r.probe(cam) == 0
        assert grew == []
