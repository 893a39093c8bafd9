"""Weight-conversion parity tests against real torch/transformers layouts.

The reference runs timbrooks/instruct-pix2pix + the SD CLIP text encoder
(dge_guidance.py:53-135, stable_diffusion_prompt_processor.py:72-102). The
actual pretrained checkpoints cannot enter this container (no network), so
parity is established two ways:

1. CLIP text encoder: transformers *is* available — build a randomly
   initialized torch CLIPTextModelWithProjection, convert its state dict,
   and compare activations numerically (converter + model numerics vs the
   real upstream implementation).
2. UNet / VAE: diffusers is not available, so the canonical SD-1.5 /
   InstructPix2Pix state-dict key+shape structure is reproduced here (the
   published diffusers format) with zero-memory fake tensors; the converted
   tree must cover our full-size model's parameter tree exactly — no
   missing keys, no extras, no shape drift.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _fake(shape):
    """A zero-filled ndarray view that costs no memory (all elements alias
    one byte); survives the converter's transposes (views of views)."""
    base = np.zeros(1, np.float16)
    return np.lib.stride_tricks.as_strided(
        base, shape=shape, strides=(0,) * len(shape), writeable=False
    )


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = tuple(v.shape)
    return out


# ---------------------------------------------------------------------------
# canonical diffusers state-dict generators (SD-1.5 family)
# ---------------------------------------------------------------------------

def diffusers_unet_state_dict(
    in_ch=8, out_ch=4, ch=(320, 640, 1280, 1280), layers=2, ctx=768
):
    """Key+shape structure of diffusers UNet2DConditionModel for the SD-1.5
    config (timbrooks/instruct-pix2pix differs only in conv_in: 8 input
    channels)."""
    sd = {}
    temb = ch[0] * 4

    def conv(k, o, i, ks=3):
        sd[f"{k}.weight"] = _fake((o, i, ks, ks))
        sd[f"{k}.bias"] = _fake((o,))

    def lin(k, o, i, bias=True):
        sd[f"{k}.weight"] = _fake((o, i))
        if bias:
            sd[f"{k}.bias"] = _fake((o,))

    def norm(k, c):
        sd[f"{k}.weight"] = _fake((c,))
        sd[f"{k}.bias"] = _fake((c,))

    def resnet(k, cin, cout):
        norm(f"{k}.norm1", cin)
        conv(f"{k}.conv1", cout, cin)
        lin(f"{k}.time_emb_proj", cout, temb)
        norm(f"{k}.norm2", cout)
        conv(f"{k}.conv2", cout, cout)
        if cin != cout:
            conv(f"{k}.conv_shortcut", cout, cin, ks=1)

    def transformer(k, c):
        norm(f"{k}.norm", c)
        conv(f"{k}.proj_in", c, c, ks=1)
        t = f"{k}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{t}.{n}", c)
        for a, kv in (("attn1", c), ("attn2", ctx)):
            lin(f"{t}.{a}.to_q", c, c, bias=False)
            lin(f"{t}.{a}.to_k", c, kv, bias=False)
            lin(f"{t}.{a}.to_v", c, kv, bias=False)
            lin(f"{t}.{a}.to_out.0", c, c)
        lin(f"{t}.ff.net.0.proj", c * 8, c)
        lin(f"{t}.ff.net.2", c, c * 4)
        conv(f"{k}.proj_out", c, c, ks=1)

    conv("conv_in", ch[0], in_ch)
    lin("time_embedding.linear_1", temb, ch[0])
    lin("time_embedding.linear_2", temb, temb)

    skip_chs = [ch[0]]
    prev = ch[0]
    for i, c in enumerate(ch):
        final = i == len(ch) - 1
        for j in range(layers):
            resnet(f"down_blocks.{i}.resnets.{j}", prev if j == 0 else c, c)
            if not final:
                transformer(f"down_blocks.{i}.attentions.{j}", c)
            skip_chs.append(c)
        prev = c
        if not final:
            conv(f"down_blocks.{i}.downsamplers.0.conv", c, c)
            skip_chs.append(c)

    resnet("mid_block.resnets.0", ch[-1], ch[-1])
    transformer("mid_block.attentions.0", ch[-1])
    resnet("mid_block.resnets.1", ch[-1], ch[-1])

    rev = ch[::-1]
    h_ch = ch[-1]
    for i in range(len(ch)):
        cout = rev[i]
        is_first = i == 0  # UpBlock2D (no attention)
        for j in range(layers + 1):
            skip = skip_chs.pop()
            resnet(f"up_blocks.{i}.resnets.{j}", h_ch + skip, cout)
            if not is_first:
                transformer(f"up_blocks.{i}.attentions.{j}", cout)
            h_ch = cout
        if i != len(ch) - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", cout, cout)

    norm("conv_norm_out", ch[0])
    conv("conv_out", out_ch, ch[0])
    return sd


def diffusers_vae_state_dict(ch=(128, 256, 512, 512), layers=2, latent=4):
    """Key+shape structure of diffusers AutoencoderKL (SD-1.5 config,
    modern to_q/to_k/to_v attention naming)."""
    sd = {}

    def conv(k, o, i, ks=3):
        sd[f"{k}.weight"] = _fake((o, i, ks, ks))
        sd[f"{k}.bias"] = _fake((o,))

    def lin(k, o, i):
        sd[f"{k}.weight"] = _fake((o, i))
        sd[f"{k}.bias"] = _fake((o,))

    def norm(k, c):
        sd[f"{k}.weight"] = _fake((c,))
        sd[f"{k}.bias"] = _fake((c,))

    def resnet(k, cin, cout):
        norm(f"{k}.norm1", cin)
        conv(f"{k}.conv1", cout, cin)
        norm(f"{k}.norm2", cout)
        conv(f"{k}.conv2", cout, cout)
        if cin != cout:
            conv(f"{k}.conv_shortcut", cout, cin, ks=1)

    def mid(pre, c):
        resnet(f"{pre}.mid_block.resnets.0", c, c)
        a = f"{pre}.mid_block.attentions.0"
        norm(f"{a}.group_norm", c)
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            lin(f"{a}.{n}", c, c)
        resnet(f"{pre}.mid_block.resnets.1", c, c)

    # encoder
    conv("encoder.conv_in", ch[0], 3)
    prev = ch[0]
    for i, c in enumerate(ch):
        for j in range(layers):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   prev if j == 0 else c, c)
        prev = c
        if i != len(ch) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
    mid("encoder", ch[-1])
    norm("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", 2 * latent, ch[-1])
    sd["quant_conv.weight"] = _fake((2 * latent, 2 * latent, 1, 1))
    sd["quant_conv.bias"] = _fake((2 * latent,))

    # decoder
    sd["post_quant_conv.weight"] = _fake((latent, latent, 1, 1))
    sd["post_quant_conv.bias"] = _fake((latent,))
    conv("decoder.conv_in", ch[-1], latent)
    mid("decoder", ch[-1])
    rev = ch[::-1]
    prev = ch[-1]
    for i in range(len(ch)):
        cout = rev[i]
        for j in range(layers + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   prev if j == 0 else cout, cout)
        prev = cout
        if i != len(ch) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", cout, cout)
    norm("decoder.conv_norm_out", ch[0])
    conv("decoder.conv_out", 3, ch[0])
    return sd


# ---------------------------------------------------------------------------
# full-size key/shape coverage: converted diffusers tree == our init tree
# ---------------------------------------------------------------------------

class TestKeyCoverage:
    def test_unet_full_size_ip2p(self):
        """Full SD-1.5/IP2P-shaped UNet: the converter's output must cover
        our model's parameter tree exactly (VERDICT r1 item 1)."""
        from dge_tpu.diffusion.weights import convert_unet
        from dge_tpu.models.unet import UNet2DConditionModel, UNetConfig

        theirs = _flatten(convert_unet(diffusers_unet_state_dict()))

        model = UNet2DConditionModel(UNetConfig())
        shapes = jax.eval_shape(
            model.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 8)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 768)),
        )["params"]
        ours = _flatten(
            jax.tree_util.tree_map(lambda x: x, shapes)
        )

        missing = sorted(set(ours) - set(theirs))
        extra = sorted(set(theirs) - set(ours))
        assert not missing, f"params not covered by converter: {missing[:10]}"
        assert not extra, f"converter produced unknown keys: {extra[:10]}"
        bad = {k: (ours[k], theirs[k]) for k in ours if ours[k] != theirs[k]}
        assert not bad, f"shape mismatches: {dict(list(bad.items())[:5])}"
        # sanity: this really is the full-size model
        assert len(ours) > 600, len(ours)

    def test_vae_full_size(self):
        from dge_tpu.diffusion.weights import convert_vae
        from dge_tpu.models.vae import AutoencoderKL, VAEConfig

        theirs = _flatten(convert_vae(diffusers_vae_state_dict()))

        model = AutoencoderKL(VAEConfig())
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )["params"]
        ours = _flatten(shapes)

        missing = sorted(set(ours) - set(theirs))
        extra = sorted(set(theirs) - set(ours))
        assert not missing, f"params not covered by converter: {missing[:10]}"
        assert not extra, f"converter produced unknown keys: {extra[:10]}"
        bad = {k: (ours[k], theirs[k]) for k in ours if ours[k] != theirs[k]}
        assert not bad, f"shape mismatches: {dict(list(bad.items())[:5])}"
        assert len(ours) > 200, len(ours)


# ---------------------------------------------------------------------------
# CLIP text encoder: real transformers implementation, numeric parity
# ---------------------------------------------------------------------------

class TestCLIPTextParity:
    def _torch_model(self, **kw):
        torch = pytest.importorskip("torch")
        from transformers import CLIPTextConfig as HFConfig
        from transformers import CLIPTextModelWithProjection

        cfg = HFConfig(
            vocab_size=kw.get("vocab_size", 100),
            hidden_size=kw.get("hidden_size", 32),
            intermediate_size=kw.get("intermediate_size", 64),
            num_hidden_layers=kw.get("num_layers", 2),
            num_attention_heads=kw.get("num_heads", 2),
            max_position_embeddings=kw.get("max_length", 16),
            projection_dim=kw.get("projection_dim", 24),
            hidden_act="quick_gelu",
            # our pooling is argmax(ids) (CLIP's eos = largest vocab id);
            # transformers pools at the first eos_token_id occurrence — make
            # the two coincide by using the max id in the test inputs as eos
            eos_token_id=kw.get("eos_token_id", 99),
        )
        torch.manual_seed(0)
        return CLIPTextModelWithProjection(cfg).eval(), cfg

    def _parity(self, hf_kw, ids):
        import torch

        from dge_tpu.diffusion.weights import convert_clip_text
        from dge_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

        tmodel, hf_cfg = self._torch_model(**hf_kw)
        params = convert_clip_text(tmodel.state_dict())

        cfg = CLIPTextConfig(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            max_length=hf_cfg.max_position_embeddings,
            intermediate_size=hf_cfg.intermediate_size,
            projection_dim=hf_cfg.projection_dim,
        )
        model = CLIPTextModel(cfg)
        hidden, proj = model.apply(
            {"params": params}, jnp.asarray(ids), return_pooled=True
        )

        with torch.no_grad():
            out = tmodel(torch.from_numpy(ids), output_hidden_states=False)
        t_hidden = out.last_hidden_state.numpy()
        t_proj = out.text_embeds.numpy()
        np.testing.assert_allclose(
            np.asarray(hidden), t_hidden, rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(proj), t_proj, rtol=2e-4, atol=2e-5
        )

    def test_tiny_activation_parity(self):
        pytest.importorskip("transformers")
        ids = np.array([[1, 7, 42, 99], [3, 99, 5, 6]], np.int64)
        # eos pooling parity: the largest id (99 = eos) appears exactly once
        # per row, so argmax pooling (ours) == first-eos pooling (hf)
        self._parity({}, ids)

    @pytest.mark.slow
    def test_sd15_full_size_activation_parity(self):
        """The exact SD-1.5 text-encoder shape (12 x 768, vocab 49408,
        ctx 77) through the real transformers implementation."""
        pytest.importorskip("transformers")
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 49000, size=(1, 77))
        ids[0, -1] = 49407  # eos = max id
        self._parity(
            dict(
                vocab_size=49408, hidden_size=768, intermediate_size=3072,
                num_layers=12, num_heads=12, max_length=77,
                projection_dim=768, eos_token_id=49407,
            ),
            ids.astype(np.int64),
        )

    def test_convert_handles_text_projection(self):
        pytest.importorskip("transformers")
        from dge_tpu.diffusion.weights import convert_clip_text

        tmodel, _ = self._torch_model()
        tree = convert_clip_text(tmodel.state_dict())
        assert "text_projection" in tree
        assert tree["text_projection"]["kernel"].shape == (32, 24)
