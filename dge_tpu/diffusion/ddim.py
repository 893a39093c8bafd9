"""DDIM scheduler (functional).

Reference analog: the DDIMScheduler the guidance loads from SD-1.4's
scheduler config (dge_guidance.py:75-135): scaled-linear betas
0.00085 -> 0.012 over 1000 train steps, steps_offset=1, clip_sample=False,
set_alpha_to_one=False, 20 inference steps, eta=0 (deterministic).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DDIMSchedule(NamedTuple):
    betas: jnp.ndarray  # [T]
    alphas_cumprod: jnp.ndarray  # [T]
    final_alpha_cumprod: jnp.ndarray  # scalar
    num_train_timesteps: int
    steps_offset: int


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    set_alpha_to_one: bool = False,
    steps_offset: int = 1,
) -> DDIMSchedule:
    # scaled_linear: linspace in sqrt-beta space
    betas = (
        np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
    ).astype(np.float32)
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = np.float32(1.0) if set_alpha_to_one else alphas_cumprod[0]
    return DDIMSchedule(
        betas=jnp.asarray(betas),
        alphas_cumprod=jnp.asarray(alphas_cumprod),
        final_alpha_cumprod=jnp.asarray(final),
        num_train_timesteps=num_train_timesteps,
        steps_offset=steps_offset,
    )


def inference_timesteps(
    sched: DDIMSchedule, num_inference_steps: int
) -> np.ndarray:
    """Descending timesteps (diffusers set_timesteps 'leading' spacing +
    steps_offset)."""
    ratio = sched.num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int64)
    return ts + sched.steps_offset


def add_noise(
    sched: DDIMSchedule, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    a = sched.alphas_cumprod[t]
    sqrt_a = jnp.sqrt(a).reshape((-1,) + (1,) * (x0.ndim - 1))
    sqrt_1ma = jnp.sqrt(1.0 - a).reshape((-1,) + (1,) * (x0.ndim - 1))
    return sqrt_a * x0 + sqrt_1ma * noise


def step(
    sched: DDIMSchedule,
    model_output: jnp.ndarray,  # predicted epsilon
    t: jnp.ndarray,  # current timestep (scalar int)
    sample: jnp.ndarray,
    num_inference_steps: int,
    eta: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One deterministic DDIM update x_t -> x_{t_prev} (epsilon
    parameterization, clip_sample=False)."""
    ratio = sched.num_train_timesteps // num_inference_steps
    prev_t = t - ratio
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(
        prev_t >= 0, sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
        sched.final_alpha_cumprod,
    )
    pred_x0 = (sample - jnp.sqrt(1.0 - a_t) * model_output) / jnp.sqrt(a_t)

    if eta > 0.0:
        var = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        sigma = eta * jnp.sqrt(var)
    else:
        sigma = 0.0
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * model_output
    prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    if eta > 0.0 and noise is not None:
        prev = prev + sigma * noise
    return prev


def pred_x0(
    sched: DDIMSchedule, model_output: jnp.ndarray, t: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    a_t = sched.alphas_cumprod[t]
    return (sample - jnp.sqrt(1.0 - a_t) * model_output) / jnp.sqrt(a_t)
