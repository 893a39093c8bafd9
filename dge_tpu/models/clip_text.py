"""CLIP text encoder (ViT-L/14 text tower, the SD-1.5 text encoder).

Reference analog: StableDiffusionPromptProcessor's CLIPTextModel usage
(threestudio/models/prompt_processors/stable_diffusion_prompt_processor.py:72-102).
Architecture: 12 layers, d=768, 12 heads, vocab 49408, max_len 77, causal
mask, quick-GELU. Weight layout mirrors transformers' CLIPTextModel for
conversion.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    intermediate_size: int = 3072
    # set to enable the text_projection head (transformers
    # CLIPTextModelWithProjection; the metrics CLIP ViT-L/14 uses 768). The
    # SD-1.5 text encoder checkpoint has no projection — leave None there.
    projection_dim: Optional[int] = None

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(
            vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
            max_length=16, intermediate_size=64,
        )


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_heads
        hd = d // h
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x) * (hd**-0.5)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        b, s, _ = x.shape

        def split(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                            preferred_element_type=jnp.float32)
        logits = jnp.where(mask[None, None], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, return_pooled: bool = False):
        """input_ids [B, S] -> last hidden state [B, S, D].

        With ``return_pooled=True`` also returns the projected pooled
        embedding [B, projection_dim]: the final-layer-norm hidden state at
        the eos token (argmax of ids — eos is the largest CLIP token id)
        passed through ``text_projection`` (transformers
        CLIPTextModelWithProjection semantics; the reference's edit metric
        uses these via clip.encode_text, clip_metrics.py:20-24)."""
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
        )
        x = tok + pos[None, :s]
        causal = jnp.tril(jnp.ones((s, s), bool))
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="final_layer_norm")(x)
        if not return_pooled:
            return x
        if cfg.projection_dim is None:
            raise ValueError(
                "return_pooled=True requires CLIPTextConfig.projection_dim"
            )
        eos = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eos]
        proj = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype,
            name="text_projection",
        )(pooled)
        return x, proj
