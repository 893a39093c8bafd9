"""Test environment: force CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (per the reference-parity test strategy,
SURVEY.md §4). Must run before jax initializes a backend."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU plugin in every interpreter and
# calls jax.config.update("jax_platforms", "axon,cpu"), overriding the env
# var — force the config back to CPU before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the 2-vCPU CI box pays ~1 min per UNet variant
# otherwise
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_random_scene(rng, n=64, capacity=None, max_sh_degree=1, spread=1.0,
                      scale_rng=(-3.5, -2.0)):
    """A small random Gaussian cloud in front of the default test camera."""
    from dge_tpu.scene import gaussians as G

    xyz = rng.normal(size=(n, 3)).astype(np.float32) * spread
    features_dc = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.5
    k_rest = (max_sh_degree + 1) ** 2 - 1
    features_rest = rng.normal(size=(n, k_rest, 3)).astype(np.float32) * 0.1
    opacity = rng.uniform(-1.0, 3.0, size=(n, 1)).astype(np.float32)
    scaling = rng.uniform(*scale_rng, size=(n, 3)).astype(np.float32)
    rotation = rng.normal(size=(n, 4)).astype(np.float32)
    rotation /= np.linalg.norm(rotation, axis=1, keepdims=True)
    return G.from_arrays(
        xyz, features_dc, features_rest, opacity, scaling, rotation,
        max_sh_degree=max_sh_degree, capacity=capacity,
    )


def make_test_camera(height=64, width=64, dist=4.0, angle=0.0):
    import math

    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    eye = np.array([dist * math.sin(angle), 0.3, -dist * math.cos(angle)])
    cam = look_at_camera(
        eye, np.zeros(3), fovx=math.radians(60), height=height, width=width
    )
    return cam, CameraArrays.from_camera(cam)


@pytest.fixture
def small_scene(rng):
    return make_random_scene(rng)


@pytest.fixture
def test_camera():
    return make_test_camera()
