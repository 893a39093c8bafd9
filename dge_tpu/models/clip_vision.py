"""CLIP vision tower (ViT) for edit-quality metrics.

Reference analog: ClipSimilarity (threestudio/utils/clip_metrics.py:7-50)
loads CLIP to score text-image and directional similarity of edits. This is
the ViT image encoder matching transformers' CLIPVisionModel layout (the
text tower lives in models/clip_text.py); weights convert via
dge_tpu.diffusion.weights.convert_clip_vision.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dge_tpu.models.clip_text import CLIPLayer, CLIPTextConfig

# CLIP image normalization
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@struct.dataclass
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(
            image_size=32, patch_size=8, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, projection_dim=16,
        )

    def text_like(self) -> CLIPTextConfig:
        """Reuse the text-layer module config for the shared encoder block."""
        n_patches = (self.image_size // self.patch_size) ** 2 + 1
        return CLIPTextConfig(
            vocab_size=1,
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            max_length=n_patches,
            intermediate_size=self.intermediate_size,
        )


class CLIPVisionModel(nn.Module):
    config: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: [B, H, W, 3] CLIP-normalized. Returns projected image
        features [B, projection_dim] (unnormalized)."""
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size,
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixels)
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x], axis=1
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (x.shape[1], cfg.hidden_size),
        )
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layrnorm")(x)
        lcfg = cfg.text_like()
        mask = jnp.ones((x.shape[1], x.shape[1]), bool)
        for i in range(cfg.num_layers):
            x = CLIPLayer(lcfg, dtype=self.dtype, name=f"layers_{i}")(x, mask)
        pooled = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="post_layernorm"
        )(x[:, 0])
        return nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)


class ClipSimilarity:
    """Edit-quality scorer (ClipSimilarity, clip_metrics.py:7-50): embeds
    images with the vision tower + texts with the text tower, computes
    cosine and directional similarities."""

    def __init__(
        self, vision_model, vision_params, encode_text_fn, tokenizer,
        text_pooled_fn=None,
    ):
        self.vision = vision_model
        self.vparams = vision_params
        self.encode_text = encode_text_fn  # ids -> [B, S, D] hidden states
        # ids -> [B, projection_dim] projected pooled embeddings (CLIP
        # text_projection; required for scores comparable to the reference's
        # clip.encode_text, clip_metrics.py:20-24). Without it text_features
        # falls back to raw eos hidden states (structural-only scores).
        self.text_pooled = text_pooled_fn
        self.tokenizer = tokenizer
        self._embed = jax.jit(
            lambda p, x: self.vision.apply({"params": p}, x)
        )

    def image_features(self, images: np.ndarray) -> np.ndarray:
        """images: [B, H, W, 3] in [0, 1], resized to the tower size."""
        cfg = self.vision.config
        x = jax.image.resize(
            jnp.asarray(images),
            (images.shape[0], cfg.image_size, cfg.image_size, 3),
            "bilinear",
        )
        x = (x - CLIP_MEAN) / CLIP_STD
        f = np.asarray(self._embed(self.vparams, x))
        return f / np.linalg.norm(f, axis=-1, keepdims=True)

    def text_features(self, texts) -> np.ndarray:
        ids = self.tokenizer(texts)
        if self.text_pooled is not None:
            f = np.asarray(self.text_pooled(jnp.asarray(ids)))
        else:
            h = np.asarray(self.encode_text(jnp.asarray(ids)))
            # fallback: eos-token hidden state (argmax id = eos) — NOT the
            # CLIP embedding space; prefer text_pooled_fn with a converted
            # text_projection
            eos = ids.argmax(axis=-1)
            f = h[np.arange(len(ids)), eos]
        return f / np.linalg.norm(f, axis=-1, keepdims=True)

    def __call__(self, img_src, img_edit, text_src, text_edit):
        """Returns (sim_src, sim_edit, sim_direction, sim_image) as in the
        reference forward (clip_metrics.py:33-50)."""
        fi_s = self.image_features(img_src)
        fi_e = self.image_features(img_edit)
        ft_s = self.text_features(text_src)
        ft_e = self.text_features(text_edit)
        sim_src = (fi_s * ft_s).sum(-1)
        sim_edit = (fi_e * ft_e).sum(-1)
        di = fi_e - fi_s
        dt = ft_e - ft_s
        di /= np.linalg.norm(di, axis=-1, keepdims=True) + 1e-8
        dt /= np.linalg.norm(dt, axis=-1, keepdims=True) + 1e-8
        sim_dir = (di * dt).sum(-1)
        sim_img = (fi_s * fi_e).sum(-1)
        return sim_src, sim_edit, sim_dir, sim_img
