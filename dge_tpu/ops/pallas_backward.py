"""Custom-VJP pair-stream compositing: Pallas forward AND backward.

Reference analog: the CUDA backward render kernel
(cuda_rasterizer/backward.cu:400-557): re-walk the per-tile list, recover
the running transmittance, accumulate the suffix color term (accum_rec), and
chain through alpha to per-Gaussian gradients — here with the cumprod
formulation and a two-pass scheme:

- pass 1 (forward recompute over the pair stream): per-chunk entry
  transmittance ``boundary_T`` and per-chunk totals of ``w * g`` where
  ``g = c . dL/dC + d . dL/dD`` (the suffix accumulator decomposes into a
  within-chunk reverse scan + a cross-chunk suffix sum, done in jnp).
- pass 2 (backward): recompute per-chunk alphas from ``boundary_T``,
  reverse-scan the local suffix, and emit per-(tile, slot) gradients for
  [mean2d, conic, opacity, rgb, depth]; a single scatter-add folds the pair
  stream back to per-Gaussian cotangents.

The analytic gradient identity (verified against jnp autodiff in
tests/test_pallas.py):

  dL/da_i = T_{i-1} g_i - (S_i + dL/dT_fin * T_fin) / (1 - a_i)

with S_i the suffix sum of w_j g_j over j > i; threshold masks (skip /
clamp / early-exit) are piecewise-constant, matching CUDA's treatment.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dge_tpu.ops.composite import ALPHA_EPS, ALPHA_MAX, T_EPS
from dge_tpu.ops.pallas_composite import (
    FEAT,
    _CA,
    _CB,
    _CC,
    _D,
    _G,
    _B,
    _MX,
    _MY,
    _OP,
    _R,
    _hillis_steele_cumprod,
    composite_pairs_pallas,
)


def _hillis_steele_rev_cumsum(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive reverse cumulative sum along axis 0 (suffix sums)."""
    shift = 1
    while shift < n:
        # rolled[i] = x[i + shift] via a positive circular shift of n - shift
        # (Mosaic's roll rejects negative shifts)
        rolled = pltpu.roll(x, n - shift, axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = x + jnp.where(row < n - shift, rolled, 0.0)
        shift *= 2
    return x


def _chunk_state(data, start, count, base, trans, tile_px, tiles_x, t, chunk):
    """Recompute the forward per-chunk quantities from the entering
    transmittance (shared by both passes)."""
    p = tile_px * tile_px
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    ox = (t % tiles_x) * tile_px
    oy = (t // tiles_x) * tile_px
    px = (ox + pid % tile_px).astype(jnp.float32)
    py = (oy + pid // tile_px).astype(jnp.float32)

    def row(i):
        return data[i, :].reshape(chunk, 1)

    a_c, b_c, c_c = row(_CA), row(_CB), row(_CC)
    mx, my = row(_MX), row(_MY)
    dx = mx - px
    dy = my - py
    power = -0.5 * (a_c * dx * dx + c_c * dy * dy) - b_c * dx * dy
    raw = row(_OP) * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, raw)
    pair_idx = base + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    keep = (
        (power <= 0.0)
        & (alpha >= ALPHA_EPS)
        & (pair_idx >= start)
        & (pair_idx < start + count)
    )
    eff = jnp.where(keep, alpha, 0.0)
    one_minus = 1.0 - eff
    cp = _hillis_steele_cumprod(one_minus, chunk)
    ex = cp / one_minus  # exclusive cumprod
    t_hyp = trans * cp
    applied = (t_hyp >= T_EPS).astype(jnp.float32)
    w = eff * trans * ex * applied
    t_out = trans * jnp.min(jnp.where(applied > 0, cp, 1.0), axis=0,
                            keepdims=True)
    return dict(
        row=row, dx=dx, dy=dy, power=power, raw=raw, eff=eff, keep=keep,
        one_minus=one_minus, ex=ex, applied=applied, w=w, t_out=t_out,
        a=a_c, b=b_c, c=c_c,
    )


def _pass1_kernel(
    starts_ref, counts_ref, startblk_ref,
    data_ref, cot_ref,
    bt_ref, cg_ref,  # outputs: boundary T [1,1,P], chunk g-total [1,1,P]
    trans_scr,
    *, tile_px, tiles_x, chunk, max_blk,
):
    t = pl.program_id(0)
    k = pl.program_id(1)
    p = tile_px * tile_px

    @pl.when(k == 0)
    def _init():
        trans_scr[...] = jnp.ones_like(trans_scr)

    start = starts_ref[t]
    count = counts_ref[t]
    blk = jnp.minimum(startblk_ref[t] + k, max_blk)
    base = blk * chunk
    trans = trans_scr[0:1, :]
    krow = k % 8  # aux buffers use (1, 8, P) blocks; one row per k step
    bt_ref[0, krow, :] = trans[0]

    live = jnp.logical_and(base < start + count, jnp.max(trans) >= T_EPS)

    @pl.when(live)
    def _work():
        st = _chunk_state(
            data_ref[...], start, count, base, trans, tile_px, tiles_x, t,
            chunk,
        )
        cot = cot_ref[0]  # [5, P]: dLdC r,g,b + dLdD + dLdT
        g = (
            st["row"](_R) * cot[0:1, :]
            + st["row"](_G) * cot[1:2, :]
            + st["row"](_B) * cot[2:3, :]
            + st["row"](_D) * cot[3:4, :]
        )  # [C, P]
        cg_ref[0, krow, :] = jnp.sum(st["w"] * g, axis=0)
        trans_scr[...] = st["t_out"]

    @pl.when(jnp.logical_not(live))
    def _dead():
        cg_ref[0, krow, :] = jnp.zeros((p,), jnp.float32)


def _pass2_kernel(
    starts_ref, counts_ref, startblk_ref,
    data_ref, cot_ref, bt_ref, suf_ref, tfin_ref,
    grad_ref,  # output [1, 1, FEAT, chunk]
    *, tile_px, tiles_x, chunk, max_blk,
):
    t = pl.program_id(0)
    k = pl.program_id(1)
    start = starts_ref[t]
    count = counts_ref[t]
    blk = jnp.minimum(startblk_ref[t] + k, max_blk)
    base = blk * chunk
    krow = k % 8
    trans = bt_ref[0, krow, :].reshape(1, -1)

    grad_ref[...] = jnp.zeros_like(grad_ref)
    live = jnp.logical_and(base < start + count, jnp.max(trans) >= T_EPS)

    @pl.when(live)
    def _work():
        st = _chunk_state(
            data_ref[...], start, count, base, trans, tile_px, tiles_x, t,
            chunk,
        )
        cot = cot_ref[0]  # [5, P]
        g = (
            st["row"](_R) * cot[0:1, :]
            + st["row"](_G) * cot[1:2, :]
            + st["row"](_B) * cot[2:3, :]
            + st["row"](_D) * cot[3:4, :]
        )
        wg = st["w"] * g
        # suffix within chunk beyond i: inclusive reverse cumsum shifted
        suf_in = _hillis_steele_rev_cumsum(wg, chunk) - wg
        s_total = suf_in + suf_ref[0, krow, :].reshape(1, -1)  # + later chunks
        # dL/dT_fin term rides with the suffix: both divide by (1 - a_i)
        tfin_term = tfin_ref[0, krow, :].reshape(1, -1)
        t_prefix = trans * st["ex"]
        contrib = (st["eff"] > 0.0) & (st["applied"] > 0)
        da = jnp.where(
            contrib,
            t_prefix * g - (s_total + tfin_term) / st["one_minus"],
            0.0,
        )  # [C, P]

        # chain: alpha = min(0.99, op * exp(power))
        unclamped = st["raw"] < ALPHA_MAX
        da_eff = jnp.where(unclamped & st["keep"], da, 0.0)
        dop = jnp.sum(da_eff * jnp.exp(st["power"]), axis=1)  # [C]
        dpow = da_eff * st["raw"]  # [C, P]
        dx, dy = st["dx"], st["dy"]
        d_ca = jnp.sum(dpow * (-0.5) * dx * dx, axis=1)
        d_cb = jnp.sum(dpow * (-(dx * dy)), axis=1)
        d_cc = jnp.sum(dpow * (-0.5) * dy * dy, axis=1)
        ddx = dpow * (-(st["a"] * dx + st["b"] * dy))
        ddy = dpow * (-(st["c"] * dy + st["b"] * dx))
        d_mx = jnp.sum(ddx, axis=1)
        d_my = jnp.sum(ddy, axis=1)
        # color/depth grads are plain w-weighted pixel sums — one MXU matmul
        # over the pixel axis instead of 4 cross-lane reduction trees;
        # contracted as [4, P] @ [C, P]^T so the result rows concatenate
        # directly (column slices carry mismatched lane offsets Mosaic's
        # concatenate rejects)
        d_rgbd = jax.lax.dot_general(
            cot[0:4, :], st["w"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [4, C] rows = d_r, d_g, d_b, d_d

        # rows in _MX.._D order (= range(10)), padded to FEAT — built with
        # stack/concat, not .at[] (Mosaic has no in-kernel scatter)
        out = jnp.concatenate(
            [
                jnp.stack([d_mx, d_my, d_ca, d_cb, d_cc, dop], axis=0),
                d_rgbd,
                jnp.zeros((FEAT - 10, chunk), jnp.float32),
            ],
            axis=0,
        )
        grad_ref[0, 0] = out


def _stream_backward(
    pair_ids, starts, counts, feat, cot_tiles, t_fin_tiles,
    *, num_tiles, tiles_x, tile_px, chunk, max_per_tile,
):
    """Run pass1 + suffix + pass2; returns per-Gaussian cotangent matrix
    [FEAT, N]."""
    p = tile_px * tile_px
    pc = pair_ids.shape[0]
    max_blk = pc // chunk - 1
    bpt = -(-max_per_tile // chunk) + 1
    bpt8 = -(-bpt // 8) * 8  # aux buffers padded to (1, 8, P) block rows
    data = feat[:, pair_ids]
    startblk = (starts // chunk).astype(jnp.int32)

    p1 = functools.partial(
        _pass1_kernel, tile_px=tile_px, tiles_x=tiles_x, chunk=chunk,
        max_blk=max_blk,
    )
    interpret = jax.default_backend() != "tpu"
    grid_spec1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles, bpt),
        in_specs=[
            pl.BlockSpec((FEAT, chunk),
                         lambda t, k, s, c, sb: (0, jnp.minimum(sb[t] + k, max_blk))),
            pl.BlockSpec((1, 5, p), lambda t, k, *_: (t, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, p), lambda t, k, *_: (t, k // 8, 0)),
            pl.BlockSpec((1, 8, p), lambda t, k, *_: (t, k // 8, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((1, p), jnp.float32)],
    )
    boundary_t, chunk_g = pl.pallas_call(
        p1,
        grid_spec=grid_spec1,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, bpt8, p), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, bpt8, p), jnp.float32),
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), counts.astype(jnp.int32), startblk, data,
      cot_tiles)

    # cross-chunk suffix of wg totals (exclusive), plus the T_fin term.
    # Only the first bpt rows are written by pass 1 — rows bpt..bpt8 of the
    # 8-aligned buffer are uninitialized and must not enter the suffix.
    cg = chunk_g[:, :bpt]
    suf_v = jnp.flip(jnp.cumsum(jnp.flip(cg, axis=1), axis=1), axis=1) - cg
    suf = jnp.zeros_like(chunk_g).at[:, :bpt].set(suf_v)  # [T, bpt8, P]
    tfin_term = (cot_tiles[:, 4, :] * t_fin_tiles)[:, None, :]  # [T, 1, P]
    tfin_b = jnp.broadcast_to(tfin_term, suf.shape)

    p2 = functools.partial(
        _pass2_kernel, tile_px=tile_px, tiles_x=tiles_x, chunk=chunk,
        max_blk=max_blk,
    )
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles, bpt),
        in_specs=[
            pl.BlockSpec((FEAT, chunk),
                         lambda t, k, s, c, sb: (0, jnp.minimum(sb[t] + k, max_blk))),
            pl.BlockSpec((1, 5, p), lambda t, k, *_: (t, 0, 0)),
            pl.BlockSpec((1, 8, p), lambda t, k, *_: (t, k // 8, 0)),
            pl.BlockSpec((1, 8, p), lambda t, k, *_: (t, k // 8, 0)),
            pl.BlockSpec((1, 8, p), lambda t, k, *_: (t, k // 8, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, FEAT, chunk), lambda t, k, *_: (t, k, 0, 0)
        ),
        scratch_shapes=[],
    )
    grads = pl.pallas_call(
        p2,
        grid_spec=grid_spec2,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, bpt, FEAT, chunk), jnp.float32
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), counts.astype(jnp.int32), startblk, data,
      cot_tiles, boundary_t, suf, tfin_b)

    # fold the per-(tile, slot) grads back to per-Gaussian space with ONE
    # scatter-add over the whole grid. Tried and rejected: pre-gathering
    # the grid down to the pc-row stream axis before the scatter — the
    # isolated scatter cost scales with rows (524k -> 262k would save
    # ~4 ms), but in-graph both gather formulations measured 59-61 ms for
    # the full backward vs 36 ms for this direct scatter (XLA fuses the
    # grid-shaped gid/grad production into the scatter; a materialized
    # [pc, FEAT] intermediate breaks that).
    blk_ids = jnp.minimum(
        startblk[:, None] + jnp.arange(bpt, dtype=jnp.int32)[None, :], max_blk
    )  # [T, bpt]
    pair_pos = blk_ids[..., None] * chunk + jnp.arange(chunk, dtype=jnp.int32)
    valid = (pair_pos >= starts[:, None, None]) & (
        pair_pos < (starts + counts)[:, None, None]
    )
    gid = pair_ids[jnp.clip(pair_pos, 0, pc - 1)]  # [T, bpt, chunk]
    gid = jnp.where(valid, gid, feat.shape[1])  # OOB drop sentinel
    flat_g = jnp.moveaxis(grads, 2, -1).reshape(-1, FEAT)  # [T*bpt*chunk, FEAT]
    out = jnp.zeros((feat.shape[1] + 1, FEAT), jnp.float32)
    out = out.at[gid.reshape(-1)].add(flat_g, mode="drop")
    return out[:-1].T  # [FEAT, N]


def _image_to_tiles(x, tiles_x, tiles_y, tile_px):
    """[H, W, ...] -> [T, P, ...] tile-major (inverse of _tiles_to_image)."""
    h, w = x.shape[:2]
    hp, wp = tiles_y * tile_px, tiles_x * tile_px
    pad = [(0, hp - h), (0, wp - w)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad)
    xp = xp.reshape((tiles_y, tile_px, tiles_x, tile_px) + x.shape[2:])
    xp = jnp.swapaxes(xp, 1, 2)
    return xp.reshape((tiles_y * tiles_x, tile_px * tile_px) + x.shape[2:])


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(8, 9, 10, 11, 12, 13, 14),
)
def stream_composite(
    mean2d, conic, rgb, depth, opac, pair_ids, starts, counts,
    height, width, tiles_x, tiles_y, tile_px, max_per_tile, chunk,
):
    """Differentiable pair-stream compositing (color, depth, final_T) with
    Pallas forward and backward."""
    return composite_pairs_pallas(
        pair_ids, starts, counts, mean2d, conic, rgb, depth, opac,
        height=height, width=width, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_px=tile_px, bg=jnp.zeros(3, jnp.float32),
        max_per_tile=max_per_tile, chunk=chunk,
    )


def _fwd(mean2d, conic, rgb, depth, opac, pair_ids, starts, counts,
         height, width, tiles_x, tiles_y, tile_px, max_per_tile, chunk):
    out = stream_composite(
        mean2d, conic, rgb, depth, opac, pair_ids, starts, counts,
        height, width, tiles_x, tiles_y, tile_px, max_per_tile, chunk,
    )
    res = (mean2d, conic, rgb, depth, opac, pair_ids, starts, counts, out[2])
    return out, res


def _bwd(height, width, tiles_x, tiles_y, tile_px, max_per_tile, chunk,
         res, cots):
    mean2d, conic, rgb, depth, opac, pair_ids, starts, counts, final_t = res
    d_color, d_depth, d_tfin = cots
    num_tiles = tiles_x * tiles_y

    feat = jnp.stack(
        [
            mean2d[:, 0], mean2d[:, 1],
            conic[:, 0], conic[:, 1], conic[:, 2],
            opac,
            rgb[:, 0], rgb[:, 1], rgb[:, 2],
            depth,
        ],
        axis=0,
    )
    feat = jnp.pad(feat, ((0, FEAT - feat.shape[0]), (0, 0)))

    cot_img = jnp.concatenate(
        [d_color, d_depth[..., None], d_tfin[..., None]], axis=-1
    )  # [H, W, 5]
    cot_tiles = jnp.moveaxis(
        _image_to_tiles(cot_img, tiles_x, tiles_y, tile_px), -1, 1
    )  # [T, 5, P]
    tfin_tiles = _image_to_tiles(final_t, tiles_x, tiles_y, tile_px)  # [T, P]

    g = _stream_backward(
        pair_ids, starts, counts, feat, cot_tiles, tfin_tiles,
        num_tiles=num_tiles, tiles_x=tiles_x, tile_px=tile_px, chunk=chunk,
        max_per_tile=max_per_tile,
    )  # [FEAT, N]
    d_mean2d = jnp.stack([g[_MX], g[_MY]], axis=-1)
    d_conic = jnp.stack([g[_CA], g[_CB], g[_CC]], axis=-1)
    d_rgb = jnp.stack([g[_R], g[_G], g[_B]], axis=-1)
    d_depthv = g[_D]
    d_opac = g[_OP]
    return (
        d_mean2d, d_conic, d_rgb, d_depthv, d_opac,
        None, None, None,
    )


stream_composite.defvjp(_fwd, _bwd)
