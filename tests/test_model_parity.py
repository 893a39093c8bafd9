"""WHOLE-MODEL torch activation parity for the UNet and VAE converters.

tests/test_block_parity.py pins each block's numerics at full SD-1.5 widths;
these tests pin the WIRING — skip-connection order, time-embedding
sin/cos flip, down/mid/up block sequencing, quant convs, epsilons — by
hand-assembling complete tiny diffusers-module-tree twins in torch (exact
diffusers attribute paths, so state_dict() keys match the released
checkpoints the reference loads at dge_guidance.py:53-135), converting the
state dict through the production convert_unet/convert_vae, and asserting
end-to-end activation equality on fixed inputs.

Tiny widths (the per-block math is already parity-tested at full width);
groups=8 exercises the GroupNorm grouping generically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from dge_tpu.diffusion.weights import convert_unet, convert_vae
from tests.test_block_parity import (
    TorchResnetBlock2D,
    TorchTransformer2DModel,
    TorchVAEAttention,
    _nchw,
    _nhwc,
)

CH = (32, 64)
LAYERS = 1
GROUPS = 8
HEADS = 2
CTX = 32
TEMB = CH[0] * 4


class TorchTimestepEmbedding(tnn.Module):
    def __init__(self, cin, out):
        super().__init__()
        self.linear_1 = tnn.Linear(cin, out)
        self.linear_2 = tnn.Linear(out, out)

    def forward(self, x):
        return self.linear_2(tF.silu(self.linear_1(x)))


def torch_timestep_embedding(t, dim):
    """diffusers get_timestep_embedding with the SD flags
    (flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    freqs = torch.exp(
        -torch.log(torch.tensor(10000.0))
        * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class _Down(tnn.Module):
    """CrossAttnDownBlock2D / DownBlock2D."""

    def __init__(self, cin, cout, attn, downsample):
        super().__init__()
        self.resnets = tnn.ModuleList([
            TorchResnetBlock2D(cin if j == 0 else cout, cout, TEMB, GROUPS)
            for j in range(LAYERS)
        ])
        if attn:
            self.attentions = tnn.ModuleList([
                TorchTransformer2DModel(cout, HEADS, cout // HEADS, CTX, GROUPS)
                for _ in range(LAYERS)
            ])
        if downsample:
            ds = tnn.Module()
            ds.conv = tnn.Conv2d(cout, cout, 3, stride=2, padding=1)
            self.downsamplers = tnn.ModuleList([ds])

    def forward(self, x, temb, ctx):
        skips = []
        for j, res in enumerate(self.resnets):
            x = res(x, temb)
            if hasattr(self, "attentions"):
                x = self.attentions[j](x, ctx)
            skips.append(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0].conv(x)
            skips.append(x)
        return x, skips


class _Up(tnn.Module):
    """UpBlock2D / CrossAttnUpBlock2D."""

    def __init__(self, skip_chs, cout, attn, upsample, h_ch):
        super().__init__()
        self.resnets = tnn.ModuleList()
        cin = h_ch
        for skip in skip_chs:
            self.resnets.append(
                TorchResnetBlock2D(cin + skip, cout, TEMB, GROUPS)
            )
            cin = cout
        if attn:
            self.attentions = tnn.ModuleList([
                TorchTransformer2DModel(cout, HEADS, cout // HEADS, CTX, GROUPS)
                for _ in skip_chs
            ])
        if upsample:
            us = tnn.Module()
            us.conv = tnn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = tnn.ModuleList([us])

    def forward(self, x, skips, temb, ctx):
        for j, res in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = res(x, temb)
            if hasattr(self, "attentions"):
                x = self.attentions[j](x, ctx)
        if hasattr(self, "upsamplers"):
            x = tF.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class _Mid(tnn.Module):
    def __init__(self, c, temb_dim=TEMB, groups=GROUPS, attn="cross", eps=1e-5):
        super().__init__()
        self.resnets = tnn.ModuleList([
            TorchResnetBlock2D(c, c, temb_dim, groups, eps=eps)
            for _ in range(2)
        ])
        if attn == "cross":
            self.attentions = tnn.ModuleList([
                TorchTransformer2DModel(c, HEADS, c // HEADS, CTX, groups)
            ])
        else:  # VAE single-head spatial attention
            self.attentions = tnn.ModuleList([TorchVAEAttention(c, groups)])

    def forward(self, x, temb=None, ctx=None):
        x = self.resnets[0](x, temb)
        a = self.attentions[0]
        x = a(x, ctx) if ctx is not None else a(x)
        return self.resnets[1](x, temb)


class TorchTinyUNet(tnn.Module):
    """UNet2DConditionModel twin: ch=(32, 64), 1 layer/block, ctx 32."""

    def __init__(self):
        super().__init__()
        self.conv_in = tnn.Conv2d(8, CH[0], 3, padding=1)
        self.time_embedding = TorchTimestepEmbedding(CH[0], TEMB)
        self.down_blocks = tnn.ModuleList([
            _Down(CH[0], CH[0], attn=True, downsample=True),
            _Down(CH[0], CH[1], attn=False, downsample=False),
        ])
        self.mid_block = _Mid(CH[1])
        # up path: reversed channels; first block is UpBlock2D (no attn)
        self.up_blocks = tnn.ModuleList([
            _Up([CH[1], CH[0]], CH[1], attn=False, upsample=True, h_ch=CH[1]),
            _Up([CH[0], CH[0]], CH[0], attn=True, upsample=False, h_ch=CH[1]),
        ])
        self.conv_norm_out = tnn.GroupNorm(GROUPS, CH[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(CH[0], 4, 3, padding=1)

    def forward(self, x, t, ctx):
        temb = self.time_embedding(torch_timestep_embedding(t, CH[0]))
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            h, s = blk(h, temb, ctx)
            skips += s
        h = self.mid_block(h, temb, ctx)
        for blk in self.up_blocks:
            h = blk(h, skips, temb, ctx)
        return self.conv_out(tF.silu(self.conv_norm_out(h)))


class _VAEDown(tnn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        self.resnets = tnn.ModuleList([
            TorchResnetBlock2D(cin if j == 0 else cout, cout, 0, GROUPS,
                               eps=1e-6)
            for j in range(LAYERS)
        ])
        if downsample:
            ds = tnn.Module()
            # VAE downsampler: padding=0 + asymmetric (0,1,0,1) pad
            ds.conv = tnn.Conv2d(cout, cout, 3, stride=2, padding=0)
            self.downsamplers = tnn.ModuleList([ds])

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0].conv(tF.pad(x, (0, 1, 0, 1)))
        return x


class _VAEUp(tnn.Module):
    def __init__(self, cin, cout, upsample):
        super().__init__()
        self.resnets = tnn.ModuleList([
            TorchResnetBlock2D(cin if j == 0 else cout, cout, 0, GROUPS,
                               eps=1e-6)
            for j in range(LAYERS + 1)
        ])
        if upsample:
            us = tnn.Module()
            us.conv = tnn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = tnn.ModuleList([us])

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if hasattr(self, "upsamplers"):
            x = tF.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TorchTinyVAE(tnn.Module):
    """AutoencoderKL twin: ch=(32, 64), 1 layer/block, latent 4."""

    LATENT = 4

    def __init__(self):
        super().__init__()
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, CH[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList([
            _VAEDown(CH[0], CH[0], downsample=True),
            _VAEDown(CH[0], CH[1], downsample=False),
        ])
        enc.mid_block = _Mid(CH[1], temb_dim=0, attn="vae", eps=1e-6)
        enc.conv_norm_out = tnn.GroupNorm(GROUPS, CH[1], eps=1e-6)
        enc.conv_out = tnn.Conv2d(CH[1], 2 * self.LATENT, 3, padding=1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(2 * self.LATENT, 2 * self.LATENT, 1)

        self.post_quant_conv = tnn.Conv2d(self.LATENT, self.LATENT, 1)
        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(self.LATENT, CH[1], 3, padding=1)
        dec.mid_block = _Mid(CH[1], temb_dim=0, attn="vae", eps=1e-6)
        dec.up_blocks = tnn.ModuleList([
            _VAEUp(CH[1], CH[1], upsample=True),
            _VAEUp(CH[1], CH[0], upsample=False),
        ])
        dec.conv_norm_out = tnn.GroupNorm(GROUPS, CH[0], eps=1e-6)
        dec.conv_out = tnn.Conv2d(CH[0], 3, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            h = blk(h)
        h = e.mid_block(h)
        h = e.conv_out(tF.silu(e.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block(h)
        for blk in d.up_blocks:
            h = blk(h)
        return d.conv_out(tF.silu(d.conv_norm_out(h)))


def _our_unet_config():
    from dge_tpu.models.unet import UNetConfig

    return UNetConfig(
        in_channels=8, out_channels=4, block_out_channels=CH,
        layers_per_block=LAYERS, cross_attention_dim=CTX,
        attention_heads=HEADS, norm_groups=GROUPS,
    )


def test_unet_whole_model_parity():
    """Full forward of the complete UNet twin == our flax UNet with the
    converted state dict (wiring + numerics end to end)."""
    from dge_tpu.models.unet import UNet2DConditionModel

    torch.manual_seed(0)
    twin = TorchTinyUNet().eval()
    params = convert_unet(twin.state_dict())

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    ctx = rng.normal(size=(2, 7, CTX)).astype(np.float32)
    t = np.array([37, 912], np.int64)

    with torch.no_grad():
        theirs = _nhwc(twin(_nchw(x), torch.from_numpy(t),
                            torch.from_numpy(ctx)))

    model = UNet2DConditionModel(_our_unet_config())
    ours = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5, rtol=1e-4)


def test_vae_whole_model_parity():
    """Encoder moments and decoder output of the complete VAE twin == ours
    with the converted state dict."""
    from dge_tpu.models.vae import AutoencoderKL, VAEConfig

    torch.manual_seed(0)
    twin = TorchTinyVAE().eval()
    params = convert_vae(twin.state_dict())

    cfg = VAEConfig(block_out_channels=CH, layers_per_block=LAYERS,
                    norm_groups=GROUPS)
    model = AutoencoderKL(cfg)

    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    z = rng.normal(size=(2, 4, 4, TorchTinyVAE.LATENT)).astype(np.float32)

    with torch.no_grad():
        t_mom = _nhwc(twin.encode_moments(_nchw(img)))
        t_dec = _nhwc(twin.decode(_nchw(z)))

    mean, logvar = model.apply(
        {"params": params}, jnp.asarray(img), method=AutoencoderKL.encode_moments
    )
    ours_mom = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)
    np.testing.assert_allclose(ours_mom, t_mom, atol=3e-5, rtol=1e-4)

    dec = model.apply(
        {"params": params},
        jnp.asarray(z) * cfg.scaling_factor,  # decode() divides it back out
        method=AutoencoderKL.decode,
    )
    np.testing.assert_allclose(np.asarray(dec), t_dec, atol=3e-5, rtol=1e-4)


def test_timestep_values_match_reference_schedule():
    """The sinusoidal embedding twins agree across the whole 0..999 range
    (the flip and freq-shift conventions matter at both extremes)."""
    from dge_tpu.models.layers import timestep_embedding

    t = np.array([0, 1, 100, 541, 999], np.int64)
    theirs = torch_timestep_embedding(torch.from_numpy(t), CH[0]).numpy()
    ours = np.asarray(timestep_embedding(jnp.asarray(t), CH[0]))
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)
