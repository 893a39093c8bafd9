"""FULL-SIZE whole-model VAE parity (VERDICT r4 item 6).

The UNet got a full-size whole-model twin in round 4
(tests/test_fullsize_parity.py, max|d|=3.10e-06); the VAE and CLIP towers
had full-width block/key coverage plus tiny whole-model twins only. The
decoder's asymmetric downsample pad and the eps=1e-6 resnets were exactly
the class of bug only whole-model runs caught historically (repo commit
59a40a3), so this assembles the complete SD-1.5 AutoencoderKL twin at
release widths — ch (128, 256, 512, 512), 2 layers/block, groups 32,
latent 4 (the VAE the reference pipeline loads at dge_guidance.py:53-135)
— converts through the production convert_vae, and runs ONE fp32 CPU
encode (512^2 -> 64^2 moments) and decode (64^2 -> 512^2) against our
flax AutoencoderKL.

Measured on this box (2 vCPU, fp32): see the printed max|d| lines; the
run is slow-marked.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from dge_tpu.diffusion.weights import convert_vae
from tests.test_block_parity import (
    TorchResnetBlock2D,
    TorchVAEAttention,
    _nchw,
    _nhwc,
)

CH = (128, 256, 512, 512)
LAYERS = 2
GROUPS = 32
LATENT = 4
EPS = 1e-6


class _VAEDown(tnn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        self.resnets = tnn.ModuleList([
            TorchResnetBlock2D(cin if j == 0 else cout, cout, 0, GROUPS,
                               eps=EPS)
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
                               eps=EPS)
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


class _VAEMid(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = tnn.ModuleList([
            TorchResnetBlock2D(c, c, 0, GROUPS, eps=EPS) for _ in range(2)
        ])
        self.attentions = tnn.ModuleList([TorchVAEAttention(c, GROUPS)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TorchFullVAE(tnn.Module):
    """SD-1.5 AutoencoderKL twin at release widths (diffusers attribute
    paths -> state_dict keys match the released checkpoint layout)."""

    def __init__(self):
        super().__init__()
        n = len(CH)
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, CH[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList([
            _VAEDown(CH[max(i - 1, 0)], CH[i], downsample=i < n - 1)
            for i in range(n)
        ])
        enc.mid_block = _VAEMid(CH[-1])
        enc.conv_norm_out = tnn.GroupNorm(GROUPS, CH[-1], eps=EPS)
        enc.conv_out = tnn.Conv2d(CH[-1], 2 * LATENT, 3, padding=1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(2 * LATENT, 2 * LATENT, 1)

        self.post_quant_conv = tnn.Conv2d(LATENT, LATENT, 1)
        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(LATENT, CH[-1], 3, padding=1)
        dec.mid_block = _VAEMid(CH[-1])
        rev = list(reversed(CH))  # (512, 512, 256, 128)
        dec.up_blocks = tnn.ModuleList([
            _VAEUp(rev[max(i - 1, 0)], rev[i], upsample=i < n - 1)
            for i in range(n)
        ])
        dec.conv_norm_out = tnn.GroupNorm(GROUPS, CH[0], eps=EPS)
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


@pytest.mark.slow
def test_vae_full_size_whole_model_parity():
    from dge_tpu.models.vae import AutoencoderKL, VAEConfig

    torch.manual_seed(0)
    twin = TorchFullVAE().eval()
    n_params = sum(p.numel() for p in twin.parameters())
    # the released SD-1.5 AutoencoderKL is ~83.7M params; the twin must be
    # the same network, not a shrunken one
    assert 80e6 < n_params < 90e6, n_params

    params = convert_vae(twin.state_dict())
    cfg = VAEConfig()  # release defaults
    model = AutoencoderKL(cfg)

    rng = np.random.default_rng(3)
    img = rng.uniform(-1, 1, size=(1, 512, 512, 3)).astype(np.float32)
    z = rng.normal(size=(1, 64, 64, LATENT)).astype(np.float32)

    with torch.no_grad():
        t_mom = _nhwc(twin.encode_moments(_nchw(img)))
    mean, logvar = model.apply(
        {"params": params}, jnp.asarray(img),
        method=AutoencoderKL.encode_moments,
    )
    ours_mom = np.concatenate([np.asarray(mean), np.asarray(logvar)], -1)
    d_enc = np.max(np.abs(ours_mom - t_mom))
    print(f"full-size VAE encode moments max|d| = {d_enc:.2e}")
    np.testing.assert_allclose(ours_mom, t_mom, atol=5e-4, rtol=1e-3)

    with torch.no_grad():
        t_dec = _nhwc(twin.decode(_nchw(z)))
    dec = model.apply(
        {"params": params},
        jnp.asarray(z) * cfg.scaling_factor,  # decode() divides it back out
        method=AutoencoderKL.decode,
    )
    d_dec = np.max(np.abs(np.asarray(dec) - t_dec))
    print(f"full-size VAE decode max|d| = {d_dec:.2e}")
    np.testing.assert_allclose(np.asarray(dec), t_dec, atol=5e-4, rtol=1e-3)
