"""LPIPS-style VGG16 perceptual loss.

Reference analog: threestudio/utils/perceptual/perceptual.py — VGG16
features at relu{1_2, 2_2, 3_3, 4_3, 5_3}, unit-normalized along channels,
squared differences passed through learned 1x1 "lin" layers, spatially
averaged and summed.

Weights: convert from a torch checkpoint via dge_tpu.diffusion.weights
(torchvision VGG16 + LPIPS lin heads). Without a checkpoint, random-init
features still give a usable multi-scale structural loss for tests/smoke
runs — the ``pretrained`` flag records which one you got.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per stage; features tapped at the
# last relu of each stage.
VGG16_STAGES: Tuple[Tuple[int, int], ...] = (
    (64, 2), (128, 2), (256, 3), (512, 3), (512, 3)
)

# ImageNet normalization used by the reference's ScalingLayer equivalent
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """x: [B, H, W, 3] in [-1, 1] -> list of 5 stage features."""
        feats = []
        conv_idx = 0
        for stage, (ch, n) in enumerate(VGG16_STAGES):
            for i in range(n):
                x = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv_{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
            feats.append(x)
            if stage < len(VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a, b: [B, H, W, 3] in [0, 1]. Returns scalar mean distance."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def norm_input(x):
            x = x * 2.0 - 1.0
            return (x - shift) / scale

        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fa = vgg(norm_input(a))
        fb = vgg(norm_input(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            w = self.param(
                f"lin_{i}",
                nn.initializers.constant(1.0 / diff.shape[-1]),
                (diff.shape[-1],),
            )
            total = total + jnp.mean(jnp.sum(diff * jnp.abs(w), axis=-1))
        return total


def make_perceptual_fn(params=None, rng=None, image_size: int = 64):
    """Returns (fn(a, b) -> scalar, params). Random init unless converted
    weights are provided."""
    model = LPIPS()
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, image_size, image_size, 3))
        params = model.init(rng, dummy, dummy)["params"]

    def fn(a, b):
        if a.ndim == 3:
            a, b = a[None], b[None]
        return model.apply({"params": params}, a, b)

    return fn, params
