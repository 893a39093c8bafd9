"""Scene layer tests: camera math invariants, PLY roundtrip, SH eval."""

import math

import numpy as np
import pytest

from dge_tpu.scene import cameras as C
from dge_tpu.scene import gaussians as G
from dge_tpu.scene import ply as ply_io


class TestCamera:
    def test_w2c_inverse(self):
        cam = C.look_at_camera(np.array([1.0, 2.0, -3.0]), np.zeros(3))
        assert np.allclose(cam.w2c @ cam.c2w, np.eye(4), atol=1e-5)

    def test_camera_center_matches_eye(self):
        eye = np.array([1.0, 2.0, -3.0])
        cam = C.look_at_camera(eye, np.zeros(3))
        assert np.allclose(cam.camera_center, eye, atol=1e-5)

    def test_target_projects_to_image_center(self):
        eye = np.array([0.5, -1.0, -4.0])
        cam = C.look_at_camera(eye, np.zeros(3), height=128, width=256)
        p = np.array([0.0, 0.0, 0.0, 1.0])
        ph = cam.full_proj @ p
        ndc = ph[:2] / ph[3]
        assert np.allclose(ndc, 0.0, atol=1e-5)
        # view-space: target on +z axis at distance |eye|
        pv = cam.w2c @ p
        assert pv[2] > 0
        assert np.allclose(pv[2], np.linalg.norm(eye), atol=1e-5)

    def test_projection_matrix_reference_form(self):
        # getProjectionMatrix (graphics_utils.py:67-87) entries
        znear, zfar = 0.01, 100.0
        fovx, fovy = math.radians(70), math.radians(50)
        P = C.projection_matrix(znear, zfar, fovx, fovy)
        assert np.isclose(P[0, 0], 1.0 / math.tan(fovx / 2))
        assert np.isclose(P[1, 1], 1.0 / math.tan(fovy / 2))
        assert np.isclose(P[3, 2], 1.0)
        assert np.isclose(P[2, 2], zfar / (zfar - znear))
        assert np.isclose(P[2, 3], -(zfar * znear) / (zfar - znear))

    def test_znear_zfar_ndc_depth(self):
        cam = C.look_at_camera(np.array([0, 0, -4.0]), np.zeros(3))
        # point at znear maps to ndc z=0; at zfar to z=1 (reference z mapping)
        for z_view, expect in ((cam.znear, 0.0), (cam.zfar, 1.0)):
            p_view = np.array([0.0, 0.0, z_view, 1.0])
            ph = cam.proj @ p_view
            assert np.isclose(ph[2] / ph[3], expect, atol=1e-4)

    def test_fov_focal_roundtrip(self):
        fov = math.radians(63.0)
        assert np.isclose(C.focal2fov(C.fov2focal(fov, 640), 640), fov)

    def test_qvec_roundtrip(self):
        rng = np.random.default_rng(3)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = C.qvec2rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-8)
        assert np.allclose(C.rotmat2qvec(R), q, atol=1e-6)

    def test_world_to_view_translate_scale(self):
        # recentring moves camera center (getWorld2View2 semantics)
        rng = np.random.default_rng(0)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = C.qvec2rotmat(q).T
        t = rng.normal(size=3)
        translate = np.array([1.0, -2.0, 0.5])
        scale = 2.0
        w2c = C.world_to_view(R, t, translate, scale)
        c2w = np.linalg.inv(w2c)
        base = np.linalg.inv(C.world_to_view(R, t))
        assert np.allclose(c2w[:3, 3], (base[:3, 3] + translate) * scale, atol=1e-4)


class TestPly:
    def test_roundtrip(self, rng, tmp_path):
        n, deg = 17, 2
        k_rest = (deg + 1) ** 2 - 1
        arrays = dict(
            xyz=rng.normal(size=(n, 3)).astype(np.float32),
            features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
            features_rest=rng.normal(size=(n, k_rest, 3)).astype(np.float32),
            opacity=rng.normal(size=(n, 1)).astype(np.float32),
            scaling=rng.normal(size=(n, 3)).astype(np.float32),
            rotation=rng.normal(size=(n, 4)).astype(np.float32),
        )
        path = str(tmp_path / "test.ply")
        ply_io.save_gaussian_ply(path, **arrays)
        loaded = ply_io.load_gaussian_ply(path)
        assert loaded["max_sh_degree"] == deg
        for k, v in arrays.items():
            assert np.array_equal(loaded[k], v), k

    def test_reference_attribute_order(self, rng, tmp_path):
        # header property order must match construct_list_of_attributes
        # (gaussian_model.py:396-408)
        n, deg = 3, 1
        path = str(tmp_path / "t.ply")
        ply_io.save_gaussian_ply(
            path,
            xyz=np.zeros((n, 3), np.float32),
            features_dc=np.zeros((n, 1, 3), np.float32),
            features_rest=np.zeros((n, 3, 3), np.float32),
            opacity=np.zeros((n, 1), np.float32),
            scaling=np.zeros((n, 3), np.float32),
            rotation=np.zeros((n, 4), np.float32),
        )
        header = open(path, "rb").read(2048).split(b"end_header")[0].decode()
        names = [
            ln.split()[-1] for ln in header.splitlines() if ln.startswith("property")
        ]
        expected = (
            ["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(9)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        assert names == expected

    def test_scene_roundtrip_via_ply(self, rng, tmp_path, small_scene):
        path = str(tmp_path / "scene.ply")
        G.save_ply(small_scene, path)
        loaded = G.load_ply(path)
        n = int(small_scene.n_alive)
        assert int(loaded.n_alive) == n
        assert np.allclose(
            np.asarray(loaded.xyz)[:n], np.asarray(small_scene.xyz)[:n]
        )

    def test_create_from_pcd(self, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        cols = rng.uniform(size=(50, 3)).astype(np.float32)
        scene = G.create_from_pcd(pts, cols, max_sh_degree=3)
        assert int(scene.n_alive) == 50
        # opacity activation = 0.1 (gaussian_model.py:294-296)
        op = np.asarray(scene.get_opacity)[:50]
        assert np.allclose(op, 0.1, atol=1e-5)
        # DC color reproduces input color
        rgb = G.sh_to_rgb(np.asarray(scene.features_dc)[:50, 0])
        assert np.allclose(rgb, cols, atol=1e-5)


class TestSH:
    def test_degree0_constant(self):
        import jax.numpy as jnp

        from dge_tpu.ops import sh as S

        dirs = np.random.default_rng(0).normal(size=(10, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        coeffs = np.zeros((10, 1, 3), np.float32)
        coeffs[:, 0] = 1.0
        rgb, clamped = S.eval_sh_color(
            jnp.asarray(coeffs), jnp.asarray(dirs), jnp.int32(0), 0
        )
        assert np.allclose(rgb, S.SH_C0 * 1.0 + 0.5, atol=1e-6)
        assert not np.any(clamped)

    def test_band_masking(self, rng):
        import jax.numpy as jnp

        from dge_tpu.ops import sh as S

        dirs = rng.normal(size=(5, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        coeffs = rng.normal(size=(5, 16, 3)).astype(np.float32)
        r3, _ = S.eval_sh_color(jnp.asarray(coeffs), jnp.asarray(dirs), jnp.int32(3), 3)
        r0, _ = S.eval_sh_color(jnp.asarray(coeffs), jnp.asarray(dirs), jnp.int32(0), 3)
        dc_only, _ = S.eval_sh_color(
            jnp.asarray(coeffs[:, :1]), jnp.asarray(dirs), jnp.int32(0), 0
        )
        assert np.allclose(r0, dc_only, atol=1e-6)
        assert not np.allclose(r0, r3)

    def test_negative_clamped(self):
        import jax.numpy as jnp

        from dge_tpu.ops import sh as S

        coeffs = np.full((1, 1, 3), -10.0, np.float32)
        dirs = np.array([[0.0, 0.0, 1.0]])
        rgb, clamped = S.eval_sh_color(
            jnp.asarray(coeffs), jnp.asarray(dirs), jnp.int32(0), 0
        )
        assert np.all(rgb == 0.0)
        assert np.all(clamped)
