"""Shared diffusion-model building blocks (flax.linen, NHWC).

Architecture follows Stable Diffusion 1.5's UNet/VAE family so that released
checkpoints (incl. timbrooks/instruct-pix2pix) convert weight-for-weight —
but the *cross-view* attention is a first-class functional mode here, not a
runtime monkey patch like the reference's attention surgery
(threestudio/utils/dge_utils.py:272-356 register_extended_attention,
:369-610 make_dge_block).

Cross-view modes on BasicTransformerBlock.attn1:
- "plain": per-frame self-attention (the reference's use_normal_attn path,
  active below timestep 100)
- "extended": K/V concatenated across the view axis per CFG chunk
- "pivot_record": extended + records normed hidden states and attn output
  into the "pivot" variable collection (the KV-cache-like pivotal pass)
- "pivot_reuse": epipolar-constrained cosine-argmax gather of the recorded
  pivot attention outputs (TokenFlow-style pivotal propagation)

Naming mirrors diffusers module paths with '.' replaced by '_' so the weight
converter is mechanical.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CrossViewState:
    """Per-batch cross-view attention inputs, computed once per UNet call
    (the reference recomputes closest cams/epipolar gathers per block;
    here they are hoisted out of the network)."""

    # int32 [F, n_key]: indices of the 1-2 closest key (pivot) cameras
    closest_cam: Optional[jnp.ndarray] = None
    # f32 [F]: blend weight for the closest cam, sigmoid(d2/(d1+d2))
    # (make_dge_block, dge_utils.py:557-566); 1.0 when n_key == 1
    blend_w1: Optional[jnp.ndarray] = None
    # dict seq_len -> bool [F, n_key, S, S] epipolar *violation* masks,
    # already gathered per closest cam, pivot frame rows cleared. Dense
    # oracle path — O(S^2) memory, only for small latents/tests.
    epipolar: Optional[Dict[int, jnp.ndarray]] = struct.field(
        pytree_node=True, default=None
    )
    # banded form (SURVEY.md §7 hard part 5): seq_len -> f32 [F, n_key, S, 3]
    # normalized epipolar-line coefficients per *query* token in the key
    # image's pixel space (pivot frame rows zeroed -> distance 0 -> never
    # violating), evaluated blockwise on the fly inside pivot_reuse. 3 floats
    # per pair-set row instead of S booleans; nothing S x S materializes.
    epi_lines: Optional[Dict[int, jnp.ndarray]] = struct.field(
        pytree_node=True, default=None
    )
    # seq_len -> f32 [S, 3] homogeneous key-token pixel coords (raster order)
    epi_pts: Optional[Dict[int, jnp.ndarray]] = struct.field(
        pytree_node=True, default=None
    )
    n_key: int = struct.field(pytree_node=False, default=1)
    # violation threshold in pixels (compute_epipolar_constrains' 1px,
    # dge_utils.py:154-187); static — baked into the jitted kernel
    epi_threshold: float = struct.field(pytree_node=False, default=1.0)


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0,
    flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding
    semantics for SD: flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    return emb


class TimestepEmbedding(nn.Module):
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(x)


class Attention(nn.Module):
    """Multi-head attention (diffusers Attention): to_q/to_k/to_v/to_out_0."""

    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: Any = jnp.float32

    def qkv(self, x, context=None):
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        c = x if context is None else context
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(c)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(c)
        return q, k, v

    def out_proj(self, x):
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(x)

    # beyond this many logits entries per head-batch, switch to the
    # online-softmax scan (the [B, H, Sq, Sk] tensor would not fit HBM at
    # production sizes: extended attention at S=4096 with 5 frames is
    # 15 x 8 x 4096 x 20480 — 40 GB in f32)
    CHUNKED_LOGITS_THRESHOLD = 1 << 24

    @staticmethod
    def _attend(q, k, v, heads, dim_head, k_chunk: int = 512):
        """q [B, Sq, H*D], k/v [B, Sk, H*D] -> [B, Sq, H*D]."""

        def split(x):
            b, s, _ = x.shape
            return x.reshape(b, s, heads, dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        if q.shape[1] * k.shape[1] > Attention.CHUNKED_LOGITS_THRESHOLD:
            out = Attention._attend_chunked(qh, kh, vh, dim_head,
                                            k_chunk=k_chunk)
        else:
            scale = 1.0 / math.sqrt(dim_head)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) * scale
            probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        b, h, s, d = out.shape
        return out.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    @staticmethod
    def _attend_chunked(qh, kh, vh, dim_head, k_chunk: int = 512):
        """Online-softmax attention scanned over key blocks (flash-attention
        recurrence): peak memory is one [B, H, Sq, k_chunk] logits block +
        f32 accumulators, exact softmax semantics. This is what lets the
        full-size extended attention (K/V concatenated across frames,
        dge_utils.py:295-330) run at 64x64 latents on one chip — the
        reference bounds the same blow-up with a per-head fp16 loop on GPU
        (dge_utils.py:333-340)."""
        b, h, sq, d = qh.shape
        sk = kh.shape[2]
        scale = 1.0 / math.sqrt(dim_head)
        k_chunk = min(k_chunk, sk)
        nb = -(-sk // k_chunk)
        pad = nb * k_chunk - sk
        if pad:
            kh = jnp.pad(kh, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vh = jnp.pad(vh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kb = kh.reshape(b, h, nb, k_chunk, d).transpose(2, 0, 1, 3, 4)
        vb = vh.reshape(b, h, nb, k_chunk, d).transpose(2, 0, 1, 3, 4)
        kpos = (jnp.arange(nb * k_chunk) >= sk).reshape(nb, k_chunk)

        def body(carry, xs):
            m, l, acc = carry
            kblk, vblk, padblk = xs
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kblk,
                preferred_element_type=jnp.float32,
            ) * scale
            logits = jnp.where(padblk[None, None, None, :], -jnp.inf, logits)
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[..., None])
            l = l * corr + jnp.sum(p, axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(vblk.dtype), vblk,
                preferred_element_type=jnp.float32,
            )
            return (m_new, l, acc), None

        init = (
            jnp.full((b, h, sq), -jnp.inf, jnp.float32),
            jnp.zeros((b, h, sq), jnp.float32),
            jnp.zeros((b, h, sq, d), jnp.float32),
        )
        (m, l, acc), _ = jax.lax.scan(body, init, (kb, vb, kpos))
        return (acc / l[..., None]).astype(qh.dtype)

    @nn.compact
    def __call__(self, x, context=None, extended_frames: int = 0):
        """extended_frames > 0 enables extended attention: x is
        [n_chunks * F, S, D] and K/V are concatenated across the F frames of
        each chunk (register_extended_attention, dge_utils.py:282-356)."""
        q, k, v = self.qkv(x, context)
        if extended_frames:
            # the chunk reshape below assumes q and k/v share a sequence
            # length — true only for self-attention. Make the contract
            # explicit instead of failing inside k.reshape.
            if context is not None and context.shape[1] != x.shape[1]:
                raise ValueError(
                    "extended_frames requires self-attention (context seq "
                    f"len {context.shape[1]} != query seq len {x.shape[1]})"
                )
            # within each CFG chunk, every frame attends to all frames' K/V
            # — which is exactly full self-attention over the frames'
            # concatenated tokens. Batch per CFG chunk instead of repeating
            # K/V per frame: same math (softmax key order is irrelevant),
            # no F-fold K/V materialization, larger (better-tiled) matmuls
            # — measured 197 -> 182 ms per S=4096 extended block.
            f = extended_frames
            b, s, d = q.shape
            chunks = b // f
            out = self._attend(
                q.reshape(chunks, f * s, d),
                k.reshape(chunks, f * s, d),
                v.reshape(chunks, f * s, d),
                self.heads,
                self.dim_head,
                k_chunk=1024,
            ).reshape(b, s, -1)
        else:
            out = self._attend(q, k, v, self.heads, self.dim_head)
        return self.out_proj(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses exact (erf) gelu; flax default is tanh-approx
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


def epi_blockwise_argmax(
    img: jnp.ndarray,  # [F, S, D] normalized query tokens (image CFG chunk)
    piv_img: jnp.ndarray,  # [F, K, S, D] normalized pivot tokens
    lines: jnp.ndarray,  # [F, K, S, 3] normalized epipolar lines per query
    pts: jnp.ndarray,  # [S, 3] homogeneous key-token pixel coords
    threshold: float,
    block: int = 512,
) -> jnp.ndarray:
    """Epipolar-masked cosine-argmax over pivot tokens without materializing
    any [S, S] array: scans key-token blocks, evaluating the line-distance
    test on the fly (the banded replacement for the reference's dense
    compute_epipolar_constrains masks, dge_utils.py:154-187 + 444-493).

    Reference zeroing semantics are preserved exactly: violating pairs
    contribute similarity 0 (not -inf), and query rows whose *every* pivot
    token violates are exempted from the mask (dge_utils.py:489-493).
    Returns int32 [F, K, S] argmax indices."""
    f, k, s, d = piv_img.shape
    block = min(block, s)
    nb = -(-s // block)
    pad = nb * block - s
    if pad:
        piv_img = jnp.pad(piv_img, ((0, 0), (0, 0), (0, pad), (0, 0)))
        pts = jnp.pad(pts, ((0, pad), (0, 0)))

    neg_inf = jnp.float32(-jnp.inf)
    init = (
        jnp.full((f, k, s), neg_inf),  # best masked value
        jnp.zeros((f, k, s), jnp.int32),  # best masked index
        jnp.full((f, k, s), neg_inf),  # best raw value
        jnp.zeros((f, k, s), jnp.int32),  # best raw index
        jnp.ones((f, k, s), bool),  # all pivot tokens violating so far
    )

    def body(i, carry):
        bm_val, bm_idx, br_val, br_idx, all_bad = carry
        off = i * block
        blk = jax.lax.dynamic_slice_in_dim(piv_img, off, block, axis=2)
        pts_b = jax.lax.dynamic_slice_in_dim(pts, off, block, axis=0)
        sim = jnp.einsum(
            "fsd,fktd->fkst", img, blk, preferred_element_type=jnp.float32
        )  # [F, K, S, B]
        dist = jnp.abs(jnp.einsum("fksc,tc->fkst", lines, pts_b))
        pad_tok = (off + jnp.arange(block)) >= s  # [B]
        viol = (dist > threshold) | pad_tok
        sim_raw = jnp.where(pad_tok, neg_inf, sim)
        sim_m = jnp.where(viol, 0.0, sim)
        sim_m = jnp.where(pad_tok, neg_inf, sim_m)

        def upd(best_val, best_idx, vals):
            v = jnp.max(vals, axis=-1)
            ix = jnp.argmax(vals, axis=-1).astype(jnp.int32) + off
            better = v > best_val
            return (
                jnp.where(better, v, best_val),
                jnp.where(better, ix, best_idx),
            )

        bm_val, bm_idx = upd(bm_val, bm_idx, sim_m)
        br_val, br_idx = upd(br_val, br_idx, sim_raw)
        all_bad = all_bad & jnp.all(viol, axis=-1)
        return bm_val, bm_idx, br_val, br_idx, all_bad

    bm_val, bm_idx, br_val, br_idx, all_bad = jax.lax.fori_loop(
        0, nb, body, init
    )
    # rows where every real pivot token violates fall back to the unmasked
    # argmax (the reference's all-violating-row exemption)
    return jnp.where(all_bad, br_idx, bm_idx)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context,
        *,
        mode: str = "plain",
        cross_view: Optional[CrossViewState] = None,
    ):
        """x: [B, S, D] with B = 3 * F (CFG chunks text/image/uncond) when a
        cross-view mode is active; context: [B, S_ctx, D_ctx]."""
        attn1 = Attention(
            self.dim, self.heads, self.dim_head, dtype=self.dtype, name="attn1"
        )
        # torch LayerNorm default eps is 1e-5 (diffusers BasicTransformerBlock)
        norm_h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        if mode == "plain":
            attn_out = attn1(norm_h)
        elif mode in ("extended", "pivot_record"):
            f = x.shape[0] // 3
            attn_out = attn1(norm_h, extended_frames=f)
            if mode == "pivot_record":
                # the pivotal pass stores normed hidden states + attn output
                # (make_dge_block, dge_utils.py:400-405, 526-533)
                self.sow("pivot", "hidden", norm_h)
                self.sow("pivot", "attn_out", attn_out)
        elif mode == "pivot_reuse":
            attn_out = self._pivot_reuse(norm_h, cross_view)
        else:
            raise ValueError(f"unknown attention mode {mode}")

        x = x + attn_out
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            self.dim,
            self.heads,
            self.dim_head,
            context_dim=self.context_dim,
            dtype=self.dtype,
            name="attn2",
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x

    def _pivot_reuse(self, norm_h, cv: CrossViewState):
        """Epipolar-constrained nearest-token gather of pivot attention
        outputs (make_dge_block, dge_utils.py:407-571)."""
        piv_h = self.get_variable("pivot", "hidden")  # [3*Fk, S, D] (tuple from sow)
        piv_attn = self.get_variable("pivot", "attn_out")
        if isinstance(piv_h, tuple):
            piv_h = piv_h[0]
        if isinstance(piv_attn, tuple):
            piv_attn = piv_attn[0]

        b, s, d = norm_h.shape
        f = b // 3
        fk = piv_h.shape[0] // 3
        piv_h = piv_h.reshape(3, fk, s, d)
        piv_attn = piv_attn.reshape(3, fk, s, d)
        cur = norm_h.reshape(3, f, s, d)

        closest = cv.closest_cam  # [F, n_key]
        # cosine similarity on the *image* CFG chunk only (dge_utils.py:428)
        img = cur[1]
        img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-6)
        piv_img = piv_h[1][closest]  # [F, n_key, S, D]
        piv_img = piv_img / (jnp.linalg.norm(piv_img, axis=-1, keepdims=True) + 1e-6)

        if cv.epi_lines is not None and s in cv.epi_lines:
            # banded path: no [S, S] array ever materializes
            idx = epi_blockwise_argmax(
                img, piv_img, cv.epi_lines[s], cv.epi_pts[s],
                cv.epi_threshold,
            )
        else:
            sim = jnp.einsum(
                "fsd,fktd->fkst", img, piv_img,
                preferred_element_type=jnp.float32,
            )  # [F, n_key, S, S]
            if cv.epipolar is not None and s in cv.epipolar:
                violation = cv.epipolar[s]  # [F, n_key, S, S] bool
                # rows where every pivot token violates are exempted
                all_bad = jnp.all(violation, axis=-1, keepdims=True)
                violation = violation & ~all_bad
                sim = jnp.where(violation, 0.0, sim)
            idx = jnp.argmax(sim, axis=-1)  # [F, n_key, S]
        # gather pivot attn output at matched tokens for all 3 CFG chunks
        piv_sel = piv_attn[:, closest]  # [3, F, n_key, S, D]
        gathered = jnp.take_along_axis(
            piv_sel, idx[None, :, :, :, None].repeat(3, 0), axis=3
        )  # [3, F, n_key, S, D] gathered along token axis

        if cv.n_key == 2:
            w1 = cv.blend_w1.reshape(1, f, 1, 1)
            out = w1 * gathered[:, :, 0] + (1.0 - w1) * gathered[:, :, 1]
        else:
            out = gathered[:, :, 0]
        return out.reshape(b, s, d).astype(norm_h.dtype)


class Transformer2DModel(nn.Module):
    channels: int
    heads: int
    dim_head: int
    context_dim: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, *, mode="plain", cross_view=None):
        """x: [B, H, W, C] -> same."""
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm")(x)
        # SD-1.5 uses 1x1 conv proj (use_linear_projection=False)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        x = BasicTransformerBlock(
            self.channels,
            self.heads,
            self.dim_head,
            self.context_dim,
            dtype=self.dtype,
            name="transformer_blocks_0",
        )(x, context, mode=mode, cross_view=cross_view)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D. ``eps``: the UNet builds its resnets with
    norm_eps=1e-5 (UNet2DConditionModel default), the VAE with
    resnet_eps=1e-6 (AutoencoderKL Encoder/Decoder) — a silent 5e-6-class
    activation skew if shared (caught by tests/test_model_parity.py)."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return h + residual


class Downsample2D(nn.Module):
    """Stride-2 conv downsampler. diffusers semantics: the VAE encoder
    builds it with padding=0 and applies an asymmetric (0,1,0,1) pad in
    forward; the SD UNet builds it with padding=1 (symmetric). Same output
    shape on even inputs but DIFFERENT window alignment — converted UNet
    weights are wrong under the asymmetric pad (caught by the torch
    activation-parity tests, tests/test_block_parity.py)."""

    channels: int
    padding: int = 0  # 0 = asymmetric (0,1,0,1) pad (VAE); 1 = symmetric (UNet)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.padding == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = self.padding
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding=pad, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)
