"""SD AutoencoderKL (flax.linen, NHWC).

Matches diffusers' AutoencoderKL with the SD-1.5 config: 4 down blocks
(128/256/512/512), 2 resnets per block, attention mid-block, latent
channels 4, scaling factor 0.18215. The reference uses this through the
InstructPix2Pix pipeline's ``vae.encode``/``vae.decode``
(dge_guidance.py:219-244 encode_images/encode_cond_images/decode_latents).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from dge_tpu.models.layers import Downsample2D, ResnetBlock2D, Upsample2D

SD_VAE_SCALE = 0.18215


@struct.dataclass
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(16, 32), layers_per_block=1,
                   norm_groups=8)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention of the VAE mid block (diffusers
    Attention with heads=1 on [B, H*W, C])."""

    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        logits = jnp.einsum(
            "bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(c)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        y = jnp.einsum("bqk,bkd->bqd", probs, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out_0")(y)
        return y.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ch = cfg.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i in range(len(ch)):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    ch[i], groups=cfg.norm_groups, eps=1e-6, dtype=self.dtype,
                    name=f"down_blocks_{i}_resnets_{j}"
                )(h)
            if i != len(ch) - 1:
                h = Downsample2D(
                    ch[i], dtype=self.dtype, name=f"down_blocks_{i}_downsamplers_0"
                )(h)
        h = ResnetBlock2D(ch[-1], groups=cfg.norm_groups, eps=1e-6, dtype=self.dtype,
                      name="mid_block_resnets_0")(h)
        h = VAEAttention(ch[-1], groups=cfg.norm_groups, dtype=self.dtype,
                         name="mid_block_attentions_0")(h)
        h = ResnetBlock2D(ch[-1], groups=cfg.norm_groups, eps=1e-6, dtype=self.dtype,
                      name="mid_block_resnets_1")(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
            name="conv_out",
        )(h)
        # diffusers quant_conv
        return nn.Conv(
            2 * cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch = cfg.block_out_channels
        z = nn.Conv(
            cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )(z)
        h = nn.Conv(ch[-1], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock2D(ch[-1], groups=cfg.norm_groups, eps=1e-6, dtype=self.dtype,
                      name="mid_block_resnets_0")(h)
        h = VAEAttention(ch[-1], groups=cfg.norm_groups, dtype=self.dtype,
                         name="mid_block_attentions_0")(h)
        h = ResnetBlock2D(ch[-1], groups=cfg.norm_groups, eps=1e-6, dtype=self.dtype,
                      name="mid_block_resnets_1")(h)
        # up path: reversed channels, layers_per_block+1 resnets each
        for i in range(len(ch)):
            ch_i = ch[len(ch) - 1 - i]
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(
                    ch_i, groups=cfg.norm_groups, eps=1e-6, dtype=self.dtype,
                    name=f"up_blocks_{i}_resnets_{j}"
                )(h)
            if i != len(ch) - 1:
                h = Upsample2D(
                    ch_i, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0"
                )(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            cfg.in_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)

    def encode_moments(self, x):
        """[B, H, W, 3] in [-1, 1] -> (mean, logvar) latents [B, h, w, 4]."""
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        """Sample (or take the mode when rng is None) of the latent
        distribution, scaled by the SD factor."""
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype
            )
        return mean * self.config.scaling_factor

    def decode(self, z):
        return self.decoder(z / self.config.scaling_factor)

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))
