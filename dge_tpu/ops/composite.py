"""Front-to-back alpha compositing over capped per-tile lists.

Differentiable jnp re-implementation of the reference render kernel
(cuda_rasterizer/forward.cu:261-379). The CUDA kernel walks Gaussians
sequentially per pixel; here each tile processes its depth-ordered list in
chunks with an (exclusive) cumulative product of transmittance along the
Gaussian axis — mathematically identical, fully vectorized, and XLA-autodiff
gives the exact gradients of backward.cu:400-557 for free (threshold masks
are piecewise-constant, zero-gradient a.e., same as the CUDA backward which
treats skip decisions as constants).

Early-exit semantics match the CUDA loop exactly: a Gaussian's contribution
is applied iff the *hypothetical* post-multiply transmittance
``T * (1 - alpha) >= 1e-4`` — because transmittance is monotone
non-increasing, the mask form equals the sequential break (forward.cu:349-354).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99


class CompositeOut(NamedTuple):
    color: jnp.ndarray  # [H, W, 3]
    depth: jnp.ndarray  # [H, W] expected depth (DGE fork's out_depth delta)
    final_T: jnp.ndarray  # [H, W] residual transmittance
    spill: jnp.ndarray  # scalar int32 from binning


def _pixel_coords(num_tiles, tiles_x, tile_px, dtype=jnp.float32):
    p = tile_px * tile_px
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    ox = (tile_ids % tiles_x) * tile_px
    oy = (tile_ids // tiles_x) * tile_px
    col = jnp.arange(p, dtype=jnp.int32) % tile_px
    row = jnp.arange(p, dtype=jnp.int32) // tile_px
    px = (ox[:, None] + col[None, :]).astype(dtype)  # [T, P]
    py = (oy[:, None] + row[None, :]).astype(dtype)
    return px, py


def _effective_alpha(cm, cc, cop, valid, px, py):
    """Per-(tile, gaussian, pixel) effective alpha with the CUDA skip rules
    (forward.cu:335-348). cm [T,C,2], cc [T,C,3], cop [T,C], valid [T,C]."""
    dx = cm[..., 0][:, :, None] - px[:, None, :]  # [T, C, P]
    dy = cm[..., 1][:, :, None] - py[:, None, :]
    a = cc[..., 0][:, :, None]
    b = cc[..., 1][:, :, None]
    c = cc[..., 2][:, :, None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, cop[..., None] * jnp.exp(power))
    keep = (power <= 0.0) & (alpha >= ALPHA_EPS) & valid[..., None]
    return jnp.where(keep, alpha, 0.0)


def _tiles_to_image(x: jnp.ndarray, tiles_x, tiles_y, tile_px, height, width):
    """[T, P, ...] tile-major -> [H, W, ...] image, cropping pad pixels."""
    trailing = x.shape[2:]
    img = x.reshape((tiles_y, tiles_x, tile_px, tile_px) + trailing)
    img = jnp.swapaxes(img, 1, 2).reshape(
        (tiles_y * tile_px, tiles_x * tile_px) + trailing
    )
    return img[:height, :width]


def composite(
    lists: jnp.ndarray,
    counts: jnp.ndarray,
    mean2d_s: jnp.ndarray,
    conic_s: jnp.ndarray,
    rgb_s: jnp.ndarray,
    depth_s: jnp.ndarray,
    opac_s: jnp.ndarray,
    *,
    height: int,
    width: int,
    tiles_x: int,
    tiles_y: int,
    tile_px: int,
    bg: jnp.ndarray,
    spill: Optional[jnp.ndarray] = None,
    chunk: int = 64,
) -> CompositeOut:
    """Composite depth-sorted, tile-binned Gaussians into an image.

    ``*_s`` arrays are in depth-sorted order; ``lists``/``counts`` from
    ``bin_gaussians``. bg: [3].
    """
    num_tiles, k = lists.shape
    p = tile_px * tile_px
    steps = -(-k // chunk)
    kp = steps * chunk
    if kp != k:  # pad cap to chunk multiple
        padc = kp - k
        lists = jnp.pad(lists, ((0, 0), (0, padc)))
    idx = jax.lax.stop_gradient(lists)

    g_mean = mean2d_s[idx]  # [T, Kp, 2]
    g_conic = conic_s[idx]
    g_rgb = rgb_s[idx]
    g_depth = depth_s[idx]
    g_op = opac_s[idx]

    px, py = _pixel_coords(num_tiles, tiles_x, tile_px)
    slots = jnp.arange(kp, dtype=jnp.int32).reshape(steps, chunk)

    def reshape_steps(x):
        return jnp.swapaxes(
            x.reshape((num_tiles, steps, chunk) + x.shape[2:]), 0, 1
        )

    xs = (
        reshape_steps(g_mean),
        reshape_steps(g_conic),
        reshape_steps(g_rgb),
        reshape_steps(g_depth),
        reshape_steps(g_op),
        slots,
    )

    @jax.checkpoint
    def body(carry, x):
        trans, color, dacc = carry
        cm, cc, crgb, cd, cop, cslot = x
        valid = cslot[None, :] < counts[:, None]
        eff = _effective_alpha(cm, cc, cop, valid, px, py)  # [T, C, P]
        one_minus = 1.0 - eff
        cp = jnp.cumprod(one_minus, axis=1)
        ex = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        t_hyp = trans[:, None, :] * cp
        applied = (t_hyp >= T_EPS).astype(eff.dtype)
        w = eff * trans[:, None, :] * ex * applied  # [T, C, P]
        color = color + jnp.einsum(
            "tcp,tcd->tpd",
            w,
            crgb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        dacc = dacc + jnp.sum(w * cd[..., None], axis=1)
        trans = trans * jnp.prod(jnp.where(applied > 0, one_minus, 1.0), axis=1)
        return (trans, color, dacc), None

    trans0 = jnp.ones((num_tiles, p), jnp.float32)
    color0 = jnp.zeros((num_tiles, p, 3), jnp.float32)
    dacc0 = jnp.zeros((num_tiles, p), jnp.float32)
    (trans, color, dacc), _ = jax.lax.scan(body, (trans0, color0, dacc0), xs)

    color = color + trans[..., None] * bg[None, None, :]
    img = _tiles_to_image(color, tiles_x, tiles_y, tile_px, height, width)
    dimg = _tiles_to_image(dacc, tiles_x, tiles_y, tile_px, height, width)
    timg = _tiles_to_image(trans, tiles_x, tiles_y, tile_px, height, width)
    return CompositeOut(
        color=img,
        depth=dimg,
        final_T=timg,
        spill=spill if spill is not None else jnp.int32(0),
    )


def lift_weights(
    lists: jnp.ndarray,
    counts: jnp.ndarray,
    order: jnp.ndarray,
    mean2d_s: jnp.ndarray,
    conic_s: jnp.ndarray,
    opac_s: jnp.ndarray,
    mask_img: jnp.ndarray,
    *,
    num_gaussians: int,
    height: int,
    width: int,
    tiles_x: int,
    tiles_y: int,
    tile_px: int,
    chunk: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lift a per-pixel mask to per-Gaussian (weight, count) accumulators.

    Reference analog: the DGE-specific apply_weights kernel
    (cuda_rasterizer/apply_weights.cu:239-398): every Gaussian that
    *contributes* to a pixel (same skip/stop rules as rendering) accumulates
    the pixel's mask value and a hit count. Returns ([N], [N]) in original
    (unsorted) Gaussian index space.
    """
    num_tiles, k = lists.shape
    p = tile_px * tile_px
    steps = -(-k // chunk)
    kp = steps * chunk
    if kp != k:
        lists = jnp.pad(lists, ((0, 0), (0, kp - k)))

    g_mean = mean2d_s[lists]
    g_conic = conic_s[lists]
    g_op = opac_s[lists]
    px, py = _pixel_coords(num_tiles, tiles_x, tile_px)

    # per-tile mask pixels (pad image to tile grid first)
    hp, wp = tiles_y * tile_px, tiles_x * tile_px
    m = jnp.pad(mask_img, ((0, hp - height), (0, wp - width)))
    m = m.reshape(tiles_y, tile_px, tiles_x, tile_px)
    m = jnp.swapaxes(m, 1, 2).reshape(num_tiles, p)  # [T, P]

    slots = jnp.arange(kp, dtype=jnp.int32).reshape(steps, chunk)

    def reshape_steps(x):
        return jnp.swapaxes(x.reshape((num_tiles, steps, chunk) + x.shape[2:]), 0, 1)

    xs = (reshape_steps(g_mean), reshape_steps(g_conic), reshape_steps(g_op), slots)

    def body(trans, x):
        cm, cc, cop, cslot = x
        valid = cslot[None, :] < counts[:, None]
        eff = _effective_alpha(cm, cc, cop, valid, px, py)
        one_minus = 1.0 - eff
        cp = jnp.cumprod(one_minus, axis=1)
        t_hyp = trans[:, None, :] * cp
        contrib = (t_hyp >= T_EPS) & (eff > 0.0)  # [T, C, P]
        cf = contrib.astype(jnp.float32)
        wsum = jnp.einsum("tcp,tp->tc", cf, m, preferred_element_type=jnp.float32)
        csum = jnp.sum(cf, axis=2)
        applied = t_hyp >= T_EPS
        trans = trans * jnp.prod(jnp.where(applied, one_minus, 1.0), axis=1)
        return trans, (wsum, csum)

    trans0 = jnp.ones((num_tiles, p), jnp.float32)
    _, (wacc, cacc) = jax.lax.scan(body, trans0, xs)

    w_tk = jnp.swapaxes(wacc, 0, 1).reshape(num_tiles, kp)
    c_tk = jnp.swapaxes(cacc, 0, 1).reshape(num_tiles, kp)

    orig_idx = lists if order is None else order[lists]  # original ids
    weights = jnp.zeros((num_gaussians,), jnp.float32).at[orig_idx.reshape(-1)].add(
        w_tk.reshape(-1)
    )
    hits = jnp.zeros((num_gaussians,), jnp.float32).at[orig_idx.reshape(-1)].add(
        c_tk.reshape(-1)
    )
    return weights, hits
