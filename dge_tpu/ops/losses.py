"""Image losses: L1, windowed SSIM, PSNR.

Reference analogs: l1_loss / ssim (gaussiansplatting/utils/loss_utils.py:17-63,
11x11 Gaussian window, sigma 1.5, C1=0.01^2, C2=0.03^2) and psnr
(utils/image_utils.py:17). Images are [H, W, C] or [B, H, W, C] float in
[0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable same-padded Gaussian blur over H, W of [H, W, C]."""
    k = window.shape[0]
    pad = k // 2
    # depthwise via vectorized 1D convs along each spatial axis
    def conv_axis(x, axis):
        xp = jnp.moveaxis(x, axis, -1)  # [..., L]
        xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(pad, pad)])
        out = jnp.zeros_like(xp[..., pad:-pad] if pad else xp)
        for i in range(k):
            out = out + window[i] * jax.lax.dynamic_slice_in_dim(
                xp, i, out.shape[-1], axis=-1
            )
        return jnp.moveaxis(out, -1, axis)

    return conv_axis(conv_axis(img, 0), 1)


def ssim_map(
    a: jnp.ndarray, b: jnp.ndarray, window_size: int = 11
) -> jnp.ndarray:
    """Per-pixel SSIM map with torch-style zero 'same' padding
    (loss_utils.py:38-63). Shape-preserving over [H, W, C]."""
    w = jnp.asarray(_gaussian_window(window_size))
    c1, c2 = 0.01**2, 0.03**2
    mu1, mu2 = _blur(a, w), _blur(b, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = _blur(a * a, w) - mu1_sq
    sigma2 = _blur(b * b, w) - mu2_sq
    sigma12 = _blur(a * b, w) - mu12
    return ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2)
    )


def ssim(a: jnp.ndarray, b: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM (loss_utils.py:38-63)."""
    return jnp.mean(ssim_map(a, b, window_size))


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    max_steps: int,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
):
    """Log-linear LR interpolation with optional delayed warmup.

    Reference: get_expon_lr_func (utils/general_utils.py:29-62). Returns an
    optax-compatible schedule fn of step -> lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(jnp.maximum(lr_init, 1e-30)) * (1 - t)
            + jnp.log(jnp.maximum(lr_final, 1e-30)) * t
        )
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        lr = delay_rate * log_lerp
        # the reference returns 0 for step<0 / lr 0.0 disables the group
        return jnp.where((lr_init == 0.0) & (lr_final == 0.0), 0.0, lr)

    return schedule
