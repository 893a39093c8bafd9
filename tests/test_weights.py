"""Weight-converter structural tests: build diffusers/transformers-style
state dicts by inverting our own flax trees, convert them, and check the
result loads exactly (no missing/extra params, shapes restored)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dge_tpu.diffusion import weights as W
from dge_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from dge_tpu.models.unet import UNet2DConditionModel, UNetConfig
from dge_tpu.models.vae import AutoencoderKL, VAEConfig


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def invert_leaf(path, arr):
    """flax leaf -> torch-style (name_suffix, tensor)."""
    leaf = path[-1]
    if leaf == "kernel":
        if arr.ndim == 4:
            return "weight", arr.transpose(3, 2, 0, 1)
        return "weight", arr.T
    if leaf == "scale":
        return "weight", arr
    if leaf == "embedding":
        return "weight", arr
    return leaf, arr


def unet_torch_name(path):
    """our flax path -> diffusers UNet name."""
    parts = list(path[:-1])
    name = ".".join(parts)
    import re

    # flat containers back to nested indices
    name = re.sub(r"(down_blocks|up_blocks)_(\d+)_(resnets|attentions|downsamplers|upsamplers)_(\d+)", r"\1.\2.\3.\4", name)
    name = re.sub(r"mid_block_(resnets|attentions)_(\d+)", r"mid_block.\1.\2", name)
    name = name.replace("transformer_blocks_0", "transformer_blocks.0")
    name = name.replace("to_out_0", "to_out.0")
    name = name.replace("ff.net_0_proj", "ff.net.0.proj")
    name = name.replace("ff.net_2", "ff.net.2")
    return name


class TestUNetConverter:
    def test_roundtrip_structure(self):
        cfg = UNetConfig.tiny()
        model = UNet2DConditionModel(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, 8)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )["params"]
        flat = flatten(params)
        sd = {}
        for path, arr in flat.items():
            suffix, tensor = invert_leaf(path, arr)
            sd[unet_torch_name(path) + "." + suffix] = tensor
        converted = W.convert_unet(sd)
        cflat = flatten(converted)
        assert set(cflat) == set(flat), (
            sorted(set(flat) - set(cflat))[:5],
            sorted(set(cflat) - set(flat))[:5],
        )
        for k in flat:
            assert cflat[k].shape == flat[k].shape, k
            assert np.allclose(cflat[k], flat[k]), k
        # converted params actually run
        out = model.apply(
            {"params": converted},
            jnp.zeros((1, 8, 8, 8)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )
        assert out.shape == (1, 8, 8, 4)


class TestVAEConverter:
    def test_roundtrip_structure(self):
        cfg = VAEConfig.tiny()
        model = AutoencoderKL(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))[
            "params"
        ]
        flat = flatten(params)
        sd = {}
        import re

        for path, arr in flat.items():
            suffix, tensor = invert_leaf(path, arr)
            name = ".".join(path[:-1])
            name = re.sub(
                r"(down_blocks|up_blocks)_(\d+)_(resnets|downsamplers|upsamplers)_(\d+)",
                r"\1.\2.\3.\4", name,
            )
            name = re.sub(r"mid_block_(resnets|attentions)_(\d+)",
                          r"mid_block.\1.\2", name)
            name = name.replace("to_out_0", "to_out.0")
            # diffusers puts quant convs at the top level
            name = name.replace("encoder.quant_conv", "quant_conv")
            name = name.replace("decoder.post_quant_conv", "post_quant_conv")
            sd[name + "." + suffix] = tensor
        converted = W.convert_vae(sd)
        cflat = flatten(converted)
        assert set(cflat) == set(flat), (
            sorted(set(flat) - set(cflat))[:5],
            sorted(set(cflat) - set(flat))[:5],
        )
        for k in flat:
            assert np.allclose(cflat[k], flat[k]), k


class TestCLIPConverter:
    def test_roundtrip_structure(self):
        cfg = CLIPTextConfig.tiny()
        model = CLIPTextModel(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
            "params"
        ]
        flat = flatten(params)
        sd = {}
        import re

        for path, arr in flat.items():
            suffix, tensor = invert_leaf(path, arr)
            name = ".".join(path[:-1])
            if name == "token_embedding":
                name = "embeddings.token_embedding"
            name = re.sub(r"layers_(\d+)", r"encoder.layers.\1", name)
            name = name.replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2")
            if path == ("position_embedding",):
                sd["text_model.embeddings.position_embedding.weight"] = tensor
                continue
            sd["text_model." + name + "." + suffix] = tensor
        converted = W.convert_clip_text(sd)
        cflat = flatten(converted)
        assert set(cflat) == set(flat), (
            sorted(set(flat) - set(cflat))[:5],
            sorted(set(cflat) - set(flat))[:5],
        )
        for k in flat:
            assert np.allclose(cflat[k], flat[k]), k
