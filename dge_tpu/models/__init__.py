"""Neural model zoo (flax.linen, NHWC, bf16-friendly): SD UNet (unet.py),
VAE (vae.py), CLIP text encoder (clip_text.py), VGG/LPIPS perceptual loss
(lpips.py). Weight converters from torch/diffusers checkpoints live in
dge_tpu/diffusion/weights.py."""
