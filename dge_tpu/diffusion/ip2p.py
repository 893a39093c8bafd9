"""InstructPix2Pix pipeline (functional, jit-friendly).

Reference analog: the diffusers StableDiffusionInstructPix2PixPipeline the
guidance wraps (dge_guidance.py:53-135) plus its latent helpers
(encode_images :190-199, encode_cond_images :201-218 with the 3-way
[img, img, zeros] conditioning, decode_latents :221-235).

The UNet input is ``concat([noisy_latent, cond_latent], channel)`` (8ch) and
classifier-free guidance is IP2P's 3-way form
(edit_latents, dge_guidance.py:362-368):

    eps = eps_uncond + s_text * (eps_text - eps_image)
                     + s_image * (eps_image - eps_uncond)
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dge_tpu.diffusion import ddim
from dge_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from dge_tpu.models.unet import UNet2DConditionModel, UNetConfig
from dge_tpu.models.vae import AutoencoderKL, VAEConfig


class IP2PModels(NamedTuple):
    unet: UNet2DConditionModel
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    unet_params: Any
    vae_params: Any
    text_params: Any
    schedule: ddim.DDIMSchedule


def build_models(
    unet_cfg: Optional[UNetConfig] = None,
    vae_cfg: Optional[VAEConfig] = None,
    text_cfg: Optional[CLIPTextConfig] = None,
    dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
    params: Optional[Dict[str, Any]] = None,
) -> IP2PModels:
    """Construct model defs + params. ``params`` (from the weight converter)
    wins; otherwise random init (tests / smoke runs)."""
    unet_cfg = unet_cfg or UNetConfig()
    vae_cfg = vae_cfg or VAEConfig()
    text_cfg = text_cfg or CLIPTextConfig()
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    text = CLIPTextModel(text_cfg, dtype=dtype)
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2, r3 = jax.random.split(rng, 3)
        latent_hw = 8 * (2 ** (len(vae_cfg.block_out_channels) - 1))
        unet_params = unet.init(
            r1,
            jnp.zeros((1, 8, 8, unet_cfg.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, unet_cfg.cross_attention_dim)),
        )["params"]
        vae_params = vae.init(r2, jnp.zeros((1, latent_hw, latent_hw, 3)))["params"]
        text_params = text.init(r3, jnp.zeros((1, 4), jnp.int32))["params"]
    else:
        unet_params = params["unet"]
        vae_params = params["vae"]
        text_params = params["text_encoder"]
    return IP2PModels(
        unet=unet,
        vae=vae,
        text_encoder=text,
        unet_params=unet_params,
        vae_params=vae_params,
        text_params=text_params,
        schedule=ddim.make_schedule(),
    )


def encode_text(models: IP2PModels, input_ids: jnp.ndarray) -> jnp.ndarray:
    return models.text_encoder.apply({"params": models.text_params}, input_ids)


def _batched(fn, x, chunk: Optional[int]):
    """Apply fn over leading-axis chunks (one compile per chunk shape).
    Full-size VAE activations at 512^2 are ~1.3 GB per conv buffer per 20
    images — batch-20 decode does not compile on one chip; chunking keeps
    the per-call batch small with identical results."""
    b = x.shape[0]
    if not chunk or b <= chunk:
        return fn(x)
    outs = []
    for i in range(0, b, chunk):
        outs.append(fn(x[i : i + chunk]))
    return jnp.concatenate(outs, axis=0)


# linen Modules are immutable/hashable, so the jitted VAE entry points can
# be cached per module instance. Running vae.apply eagerly dispatched every
# primitive through the axon relay one by one — measured 8.7 s for the
# 20-view encode pass that is ~0.6 s of MXU work.
@lru_cache(maxsize=8)
def _enc_sample_fn(vae):
    @jax.jit
    def f(params, x, r):
        return vae.apply({"params": params}, x * 2.0 - 1.0, r,
                         method=vae.encode)
    return f


@lru_cache(maxsize=8)
def _enc_mode_fn(vae):
    @jax.jit
    def f(params, x):
        return vae.apply({"params": params}, x * 2.0 - 1.0, None,
                         method=vae.encode)
    return f


@lru_cache(maxsize=8)
def _dec_fn(vae):
    @jax.jit
    def f(params, z):
        img = vae.apply({"params": params}, z, method=vae.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
    return f


def encode_images(
    models: IP2PModels, rgb: jnp.ndarray, rng, chunk: Optional[int] = None
) -> jnp.ndarray:
    """[B, H, W, 3] in [0,1] -> sampled scaled latents [B, H/8, W/8, 4]
    (encode_images, dge_guidance.py:190-199)."""
    enc = _enc_sample_fn(models.vae)

    b = rgb.shape[0]
    if not chunk or b <= chunk:
        return enc(models.vae_params, rgb, rng)
    # independent posterior noise per chunk (fold_in keeps it deterministic
    # in the chunking layout)
    return jnp.concatenate(
        [
            enc(models.vae_params, rgb[i : i + chunk],
                jax.random.fold_in(rng, i))
            for i in range(0, b, chunk)
        ],
        axis=0,
    )


def encode_cond_images(
    models: IP2PModels, rgb: jnp.ndarray, chunk: Optional[int] = None
) -> jnp.ndarray:
    """Conditioning latents: distribution mode, tripled [img, img, zeros]
    (encode_cond_images, dge_guidance.py:201-218)."""
    f = _enc_mode_fn(models.vae)
    lat = _batched(lambda x: f(models.vae_params, x), rgb, chunk)
    return jnp.concatenate([lat, lat, jnp.zeros_like(lat)], axis=0)


def decode_latents(
    models: IP2PModels, latents: jnp.ndarray, chunk: Optional[int] = None
) -> jnp.ndarray:
    f = _dec_fn(models.vae)
    return _batched(lambda z: f(models.vae_params, z), latents, chunk)


def cfg_combine(
    eps_text: jnp.ndarray,
    eps_image: jnp.ndarray,
    eps_uncond: jnp.ndarray,
    guidance_scale: float,
    condition_scale: float,
) -> jnp.ndarray:
    return (
        eps_uncond
        + guidance_scale * (eps_text - eps_image)
        + condition_scale * (eps_image - eps_uncond)
    )


def triple(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, x, x], axis=0)


def edit_images_single_view(
    models: IP2PModels,
    rgb: jnp.ndarray,  # [B, H, W, 3] in [0, 1]
    cond_rgb: jnp.ndarray,  # [B, H, W, 3]
    text_emb_pos: jnp.ndarray,  # [B, S, D]
    text_emb_neg: jnp.ndarray,  # [B, S, D]
    rng: jax.Array,
    *,
    t_start: int = 999,
    num_steps: int = 20,
    guidance_scale: float = 7.5,
    condition_scale: float = 1.5,
) -> jnp.ndarray:
    """Per-view IP2P editing with no cross-view attention — BASELINE.json
    config 3. Returns edited [B, H, W, 3]."""
    r_lat, r_noise = jax.random.split(rng)
    latents = encode_images(models, rgb, r_lat)
    cond_lat = encode_cond_images(models, cond_rgb)
    text_emb = jnp.concatenate([text_emb_pos, text_emb_neg, text_emb_neg], axis=0)

    # truncated schedule over [0, t_start] where t_start = max_step - 1
    # (edit_latents sets num_train_timesteps to the sampled t and noises at
    # the same t, dge_guidance.py:267-296; __call__ samples
    # t = max_step - 1, :538-546)
    sched = models.schedule._replace(num_train_timesteps=max(t_start, num_steps))
    ts = ddim.inference_timesteps(sched, num_steps)
    noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
    latents = ddim.add_noise(
        sched, latents, noise, jnp.full((latents.shape[0],), t_start)
    )

    @jax.jit
    def one_step(latents, t):
        lat3 = triple(latents)
        inp = jnp.concatenate([lat3, cond_lat], axis=-1)
        eps = models.unet.apply(
            {"params": models.unet_params}, inp,
            jnp.full((inp.shape[0],), t), text_emb,
        )
        e_text, e_img, e_unc = jnp.split(eps, 3, axis=0)
        eps_final = cfg_combine(
            e_text, e_img, e_unc, guidance_scale, condition_scale
        )
        return ddim.step(sched, eps_final, t, latents, num_steps)

    for t in ts:
        latents = one_step(latents, jnp.asarray(int(t)))
    return decode_latents(models, latents)


def resize_to_64_multiple(h: int, w: int, target: int = 512) -> Tuple[int, int]:
    """The guidance's 64-multiple resize rule (dge_guidance.py:505-511):
    scale the long side to ~``target`` and round to 64 multiples."""
    factor = target / max(w, h)
    factor = math.ceil(min(w, h) * factor / 64) * 64 / min(w, h)
    width = int((w * factor) // 64) * 64
    height = int((h * factor) // 64) * 64
    return height, width
