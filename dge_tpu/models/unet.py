"""SD-1.5-family conditional UNet (flax.linen, NHWC).

Architecture = diffusers UNet2DConditionModel with the SD-1.5 config
(block_out 320/640/1280/1280, 3x CrossAttnDownBlock2D + DownBlock2D, mid
cross-attn block, mirrored up path, 8 heads, context dim 768). For
InstructPix2Pix, ``in_channels=8`` (noisy latent 4 + conditioning image
latent 4 — the reference loads timbrooks/instruct-pix2pix whose conv_in is
8-channel, dge_guidance.py:53-135).

Cross-view attention modes thread through every transformer block (see
models/layers.py); the pivotal KV-cache rides the "pivot" flax variable
collection:

    out, vars = unet.apply({'params': p}, ..., mode='pivot_record',
                           mutable=['pivot'])
    out = unet.apply({'params': p, 'pivot': vars['pivot']}, ...,
                     mode='pivot_reuse', cross_view=cv)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from flax import struct

from dge_tpu.models.layers import (
    BasicTransformerBlock,
    CrossViewState,
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    Upsample2D,
    timestep_embedding,
)


@struct.dataclass
class UNetConfig:
    in_channels: int = 8  # IP2P; vanilla SD = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_heads: int = 8
    norm_groups: int = 32

    @classmethod
    def tiny(cls, context_dim: int = 32) -> "UNetConfig":
        """Small config for unit tests."""
        return cls(
            in_channels=8,
            out_channels=4,
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=context_dim,
            attention_heads=2,
            norm_groups=8,
        )


class UNet2DConditionModel(nn.Module):
    config: UNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C_in]
        timesteps: jnp.ndarray,  # [B] or scalar
        context: jnp.ndarray,  # [B, S_ctx, D_ctx] text embeddings
        *,
        mode: str = "plain",
        cross_view: Optional[CrossViewState] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        ch = cfg.block_out_channels
        heads = cfg.attention_heads
        n_blocks = len(ch)

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        temb = timestep_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=self.dtype,
                                 name="time_embedding")(temb)

        kw = dict(mode=mode, cross_view=cross_view)

        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            sample
        )
        skips = [h]

        # down path: CrossAttnDownBlock2D x (n-1) + DownBlock2D
        for i in range(n_blocks):
            is_final = i == n_blocks - 1
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    ch[i], groups=cfg.norm_groups, dtype=self.dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(h, temb)
                if not is_final:
                    h = Transformer2DModel(
                        ch[i], heads, ch[i] // heads, cfg.cross_attention_dim,
                        groups=cfg.norm_groups, dtype=self.dtype,
                        name=f"down_blocks_{i}_attentions_{j}",
                    )(h, context, **kw)
                skips.append(h)
            if not is_final:
                # SD UNet downsamplers use symmetric padding=1
                # (diffusers downsample_padding=1), unlike the VAE's
                # asymmetric (0,1,0,1) pad
                h = Downsample2D(
                    ch[i], padding=1, dtype=self.dtype,
                    name=f"down_blocks_{i}_downsamplers_0",
                )(h)
                skips.append(h)

        # mid
        h = ResnetBlock2D(ch[-1], groups=cfg.norm_groups, dtype=self.dtype,
                          name="mid_block_resnets_0")(h, temb)
        h = Transformer2DModel(
            ch[-1], heads, ch[-1] // heads, cfg.cross_attention_dim,
            groups=cfg.norm_groups, dtype=self.dtype,
            name="mid_block_attentions_0",
        )(h, context, **kw)
        h = ResnetBlock2D(ch[-1], groups=cfg.norm_groups, dtype=self.dtype,
                          name="mid_block_resnets_1")(h, temb)

        # up path (reversed channels; UpBlock2D first, then CrossAttnUpBlock2D)
        for i in range(n_blocks):
            ch_i = ch[n_blocks - 1 - i]
            is_first = i == 0
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(
                    ch_i, groups=cfg.norm_groups, dtype=self.dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(h, temb)
                if not is_first:
                    h = Transformer2DModel(
                        ch_i, heads, ch_i // heads, cfg.cross_attention_dim,
                        groups=cfg.norm_groups, dtype=self.dtype,
                        name=f"up_blocks_{i}_attentions_{j}",
                    )(h, context, **kw)
            if i != n_blocks - 1:
                h = Upsample2D(
                    ch_i, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0"
                )(h)

        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
