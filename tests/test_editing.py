"""Scene editing utilities: mask growth, localization, concat, anchors."""

import jax.numpy as jnp
import numpy as np

from dge_tpu.scene import editing as E
from dge_tpu.ops import render
from tests.conftest import make_random_scene, make_test_camera


def test_localized_renders_subset(rng):
    scene = make_random_scene(rng, n=32)
    _, cam = make_test_camera(height=32, width=32)
    mask = jnp.zeros(scene.capacity, bool).at[:8].set(True)
    local = E.localized(scene, mask)
    assert int(local.n_alive) == 8
    full = render.render(scene, cam, tile_px=16, max_per_tile=64)
    sub = render.render(local, cam, tile_px=16, max_per_tile=64)
    assert not np.allclose(full.color, sub.color)


def test_grow_mask(rng):
    # two separated clusters; mask one point of cluster A -> grows within A
    a = rng.normal(size=(20, 3)).astype(np.float32) * 0.05
    b = rng.normal(size=(20, 3)).astype(np.float32) * 0.05 + 10.0
    from dge_tpu.scene import gaussians as G

    pts = np.concatenate([a, b])
    scene = G.create_from_pcd(pts, np.ones((40, 3), np.float32) * 0.5)
    mask = jnp.zeros(scene.capacity, bool).at[:3].set(True)
    grown = E.grow_mask_to_neighbors(scene, mask, dist_thresh=0.2)
    g = np.asarray(grown)
    assert g[:20].sum() > 1  # grew within cluster A
    assert g[20:40].sum() == 0  # cluster B untouched


def test_concat(rng):
    s1 = make_random_scene(rng, n=10)
    s2 = make_random_scene(rng, n=7)
    out = E.concat_scenes(s1, s2)
    assert int(out.n_alive) == 17
    assert np.allclose(np.asarray(out.xyz)[:10], np.asarray(s1.xyz)[:10])
    assert np.allclose(np.asarray(out.xyz)[10:17], np.asarray(s2.xyz)[:7])


def test_anchor_loss(rng):
    scene = make_random_scene(rng, n=16)
    anchor = E.anchor_snapshot(scene)
    assert float(E.anchor_loss(scene, anchor)) == 0.0
    moved = scene.replace(xyz=scene.xyz + 0.1)
    assert float(E.anchor_loss(moved, anchor)) > 0.0
