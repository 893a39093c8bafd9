"""Torch-side ACTIVATION parity for the UNet/VAE weight converters.

tests/test_weight_parity.py proves key+shape coverage of the converted
diffusers checkpoints; these tests pin the NUMERICS (VERDICT r2 item 3): a
transposed conv axis, a wrong GroupNorm epsilon, a tanh-vs-erf gelu, or a
mis-aligned downsample pad all pass key/shape tests and silently destroy
edit quality.

diffusers is not in the container, but torch is — each block twin below is
hand-assembled from torch.nn following the published diffusers module math
(the modules the reference loads at dge_guidance.py:53-135 via
UNet2DConditionModel / AutoencoderKL):

- ResnetBlock2D: GroupNorm(32, eps 1e-5) -> silu -> conv3x3 ->
  + time_emb_proj(silu(temb)) -> GroupNorm -> silu -> conv3x3, 1x1
  conv_shortcut residual when channels change (resnet.py ResnetBlock2D)
- Transformer2DModel (use_linear_projection=False): GroupNorm(32, eps 1e-6)
  -> 1x1 conv proj_in -> BasicTransformerBlock (LayerNorm eps 1e-5; attn1
  self; attn2 cross; GEGLU ff with ERF gelu) -> 1x1 conv proj_out ->
  +residual (transformer_2d.py, attention.py)
- Downsample2D: stride-2 conv; SD UNet uses symmetric padding=1, the VAE
  encoder uses padding=0 with an F.pad (0,1,0,1) in forward — same output
  shape, DIFFERENT window alignment (downsampling.py)
- Upsample2D: nearest 2x -> conv3x3 pad 1 (upsampling.py)
- VAE mid attention: GroupNorm(32, eps 1e-6), single-head to_q/k/v/to_out.0
  with bias, 1/sqrt(C) scale, residual (attention_processor.Attention)

Each twin's state dict is keyed exactly as the released checkpoints are, and
converted through the SAME convert_unet / convert_vae entry points used by
load_ip2p_checkpoint — so a converter regression fails here, not in
production. Widths are full SD-1.5 (320/640/1280 UNet, 512 VAE); spatial
dims are small to keep CPU time sane (conv/norm math is per-pixel, so
alignment bugs show at any H x W).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from dge_tpu.diffusion.weights import convert_unet, convert_vae


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _assert_close(ours, theirs, atol=1e-5, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=atol, rtol=rtol)


def _prefixed_sd(module: tnn.Module, prefix: str):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# torch twins of the diffusers blocks (hand-assembled, no diffusers import)
# ---------------------------------------------------------------------------


class TorchResnetBlock2D(tnn.Module):
    def __init__(self, cin, cout, temb_dim=1280, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        # diffusers VAE resnets have temb_channels=None -> no time_emb_proj
        if temb_dim:
            self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        h = self.conv1(tF.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(tF.silu(temb))[:, :, None, None]
        h = self.conv2(tF.silu(self.norm2(h)))
        s = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return s + h


class TorchAttention(tnn.Module):
    """diffusers Attention (to_q/to_k/to_v bias-free, to_out.0 with bias)."""

    def __init__(self, dim, heads, dim_head, ctx_dim=None):
        super().__init__()
        inner = heads * dim_head
        ctx = dim if ctx_dim is None else ctx_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx, inner, bias=False)
        self.to_v = tnn.Linear(ctx, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, dim)])

    def forward(self, x, context=None):
        c = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(c), self.to_v(c)

        def split(t):
            b, s, _ = t.shape
            return t.view(b, s, self.heads, self.dim_head).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        attn = torch.softmax(q @ k.transpose(-1, -2) / self.dim_head**0.5, -1)
        out = (attn @ v).transpose(1, 2).reshape(x.shape[0], x.shape[1], -1)
        return self.to_out[0](out)


class TorchGEGLUFeedForward(tnn.Module):
    class _Net0(tnn.Module):
        def __init__(self, dim, inner):
            super().__init__()
            self.proj = tnn.Linear(dim, inner * 2)

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = tnn.ModuleList(
            [self._Net0(dim, inner), tnn.Identity(), tnn.Linear(inner, dim)]
        )

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        # diffusers GEGLU: exact (erf) gelu
        return self.net[2](h * tF.gelu(gate))


class TorchBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, dim_head, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)  # torch default eps 1e-5
        self.attn1 = TorchAttention(dim, heads, dim_head)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, heads, dim_head, ctx_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TorchGEGLUFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TorchTransformer2DModel(tnn.Module):
    def __init__(self, c, heads, dim_head, ctx_dim, groups=32):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = tnn.Conv2d(c, c, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TorchBasicTransformerBlock(c, heads, dim_head, ctx_dim)]
        )
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.transformer_blocks[0](y, ctx)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


class TorchVAEAttention(tnn.Module):
    def __init__(self, c, groups=32):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        y = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(q @ k.transpose(-1, -2) / c**0.5, -1)
        y = self.to_out[0](attn @ v)
        return y.transpose(1, 2).view(b, c, h, w) + res


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _unet_subtree(sd, key):
    """Convert a diffusers-keyed state dict through convert_unet and pull
    out the named flat block subtree."""
    return convert_unet(sd)[key]


@pytest.mark.parametrize("cin,cout", [(320, 320), (320, 640)])
def test_resnet_block_parity(cin, cout):
    """Full-width ResnetBlock2D incl. time embedding + conv_shortcut."""
    from dge_tpu.models.layers import ResnetBlock2D

    torch.manual_seed(0)
    twin = TorchResnetBlock2D(cin, cout).eval()
    params = _unet_subtree(
        _prefixed_sd(twin, "down_blocks.1.resnets.0"), "down_blocks_1_resnets_0"
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, cin)).astype(np.float32)
    temb = rng.normal(size=(2, 1280)).astype(np.float32)

    ours = ResnetBlock2D(cout).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(temb)
    )
    with torch.no_grad():
        theirs = _nhwc(twin(_nchw(x), torch.from_numpy(temb)))
    _assert_close(ours, theirs, atol=2e-5)


def test_transformer_block_parity_full_width():
    """Transformer2DModel at SD-1.5 down_block_0 width (c=320, 8 heads x 40,
    ctx 768): GroupNorm eps 1e-6, 1x1 conv projections, LayerNorm eps 1e-5,
    self+cross attention, ERF-gelu GEGLU."""
    from dge_tpu.models.layers import Transformer2DModel

    torch.manual_seed(1)
    c, heads, dh, ctx_dim = 320, 8, 40, 768
    twin = TorchTransformer2DModel(c, heads, dh, ctx_dim).eval()
    params = _unet_subtree(
        _prefixed_sd(twin, "down_blocks.0.attentions.0"),
        "down_blocks_0_attentions_0",
    )

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, c)).astype(np.float32)
    ctx = rng.normal(size=(2, 7, ctx_dim)).astype(np.float32)

    ours = Transformer2DModel(c, heads, dh, ctx_dim).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ctx)
    )
    with torch.no_grad():
        theirs = _nhwc(twin(_nchw(x), torch.from_numpy(ctx)))
    # one attention softmax + 4 matmuls of width 320: slightly looser atol
    _assert_close(ours, theirs, atol=1e-4, rtol=5e-4)


def test_unet_downsample_symmetric_pad_parity():
    """SD UNet Downsample2D = stride-2 conv, symmetric padding=1 — NOT the
    VAE's (0,1,0,1) pad. Same output shape, different window alignment; the
    round-2 code used the VAE pad for both (caught by this test)."""
    from dge_tpu.models.layers import Downsample2D

    torch.manual_seed(2)
    c = 320
    conv = tnn.Conv2d(c, c, 3, stride=2, padding=1).eval()
    params = _unet_subtree(
        _prefixed_sd(conv, "down_blocks.0.downsamplers.0.conv"),
        "down_blocks_0_downsamplers_0",
    )

    x = np.random.default_rng(2).normal(size=(1, 16, 16, c)).astype(np.float32)
    ours = Downsample2D(c, padding=1).apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = _nhwc(conv(_nchw(x)))
    _assert_close(ours, theirs, atol=2e-5)


def test_vae_downsample_asymmetric_pad_parity():
    """VAE encoder Downsample2D: padding=0 conv after an F.pad (0,1,0,1)."""
    from dge_tpu.models.layers import Downsample2D

    torch.manual_seed(3)
    c = 128
    conv = tnn.Conv2d(c, c, 3, stride=2, padding=0).eval()
    tree = convert_vae(
        _prefixed_sd(conv, "encoder.down_blocks.0.downsamplers.0.conv")
    )
    params = tree["encoder"]["down_blocks_0_downsamplers_0"]

    x = np.random.default_rng(3).normal(size=(1, 16, 16, c)).astype(np.float32)
    ours = Downsample2D(c, padding=0).apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        xt = tF.pad(_nchw(x), (0, 1, 0, 1))
        theirs = _nhwc(conv(xt))
    _assert_close(ours, theirs, atol=2e-5)


def test_upsample_parity():
    """Upsample2D: nearest 2x then conv3x3 pad 1."""
    from dge_tpu.models.layers import Upsample2D

    torch.manual_seed(4)
    c = 640
    conv = tnn.Conv2d(c, c, 3, padding=1).eval()
    params = _unet_subtree(
        _prefixed_sd(conv, "up_blocks.1.upsamplers.0.conv"),
        "up_blocks_1_upsamplers_0",
    )

    x = np.random.default_rng(4).normal(size=(1, 6, 6, c)).astype(np.float32)
    ours = Upsample2D(c).apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = _nhwc(conv(tF.interpolate(_nchw(x), scale_factor=2,
                                           mode="nearest")))
    _assert_close(ours, theirs, atol=2e-5)


def test_vae_mid_attention_parity():
    """VAE mid-block attention at full width (c=512): single head, biased
    q/k/v, 1/sqrt(C) scale, GroupNorm eps 1e-6, residual."""
    from dge_tpu.models.vae import VAEAttention

    torch.manual_seed(5)
    c = 512
    twin = TorchVAEAttention(c).eval()
    sd = {
        k.replace("to_out.0", "to_out.0"): v
        for k, v in _prefixed_sd(twin, "encoder.mid_block.attentions.0").items()
    }
    tree = convert_vae(sd)
    params = tree["encoder"]["mid_block_attentions_0"]

    x = np.random.default_rng(5).normal(size=(1, 8, 8, c)).astype(np.float32)
    ours = VAEAttention(c).apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = _nhwc(twin(_nchw(x)))
    _assert_close(ours, theirs, atol=5e-5, rtol=2e-4)


def test_timestep_embedding_parity():
    """Sinusoidal embedding + the 2-linear time MLP vs the diffusers
    get_timestep_embedding formula (flip_sin_to_cos=True, shift=0) done in
    torch."""
    from dge_tpu.models.layers import TimestepEmbedding, timestep_embedding

    dim, temb_dim = 320, 1280
    t = np.array([0, 1, 541, 999], np.int32)

    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float64) / half
    emb = t[:, None].astype(np.float64) * np.exp(exponent)[None, :]
    ref = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1).astype(np.float32)
    ours_emb = timestep_embedding(jnp.asarray(t), dim)
    # ours evaluates sin/cos in f32 (t up to 999 * freq): ~5e-5 rounding
    _assert_close(ours_emb, ref, atol=1e-4, rtol=1e-3)

    torch.manual_seed(6)
    lin1 = tnn.Linear(dim, temb_dim)
    lin2 = tnn.Linear(temb_dim, temb_dim)
    sd = {}
    sd.update(_prefixed_sd(lin1, "time_embedding.linear_1"))
    sd.update(_prefixed_sd(lin2, "time_embedding.linear_2"))
    params = convert_unet(sd)["time_embedding"]
    ours = TimestepEmbedding(temb_dim).apply(
        {"params": params}, jnp.asarray(ref)
    )
    with torch.no_grad():
        theirs = lin2(tF.silu(lin1(torch.from_numpy(ref)))).numpy()
    _assert_close(ours, theirs, atol=2e-5)
