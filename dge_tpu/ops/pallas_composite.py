"""Pallas TPU forward compositing kernel.

The hot inner loop of rendering (reference renderCUDA,
cuda_rasterizer/forward.cu:261-379) as a Mosaic kernel:

- grid = (num_tiles, k_chunks), k innermost; per-tile carry (transmittance,
  color, depth) lives in VMEM scratch across k steps.
- per chunk: the Gaussian quadratic form is evaluated for all
  (chunk x pixel) pairs with 6 broadcasted FMAs (the power is bilinear in
  per-Gaussian coefficients and the pixel monomial basis), then alpha
  masking and a Hillis-Steele cumulative product along the Gaussian axis
  reproduce the sequential front-to-back compositing exactly (see
  ops/composite.py for the math argument).
- chunks beyond the tile's Gaussian count are skipped via scalar-prefetched
  counts; fully saturated tiles skip remaining compute.

Layouts: per-tile gathered features [T, 16, K] (features on sublanes, the
depth-ordered Gaussian axis on lanes); pixels as a [1, P] lane vector;
per-chunk working set [C, P] (C=chunk Gaussians on sublanes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dge_tpu.ops.composite import ALPHA_EPS, ALPHA_MAX, T_EPS

# feature rows in the gathered data (padded to 16 sublanes for f32 tiling)
_MX, _MY, _CA, _CB, _CC, _OP, _R, _G, _B, _D = range(10)
FEAT = 16


def _hillis_steele_cumprod(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inclusive cumulative product along axis 0 (length n, power of two)
    via log2(n) shifted multiplies."""
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = x * jnp.where(row >= shift, rolled, 1.0)
        shift *= 2
    return x


def _composite_kernel(
    counts_ref,  # scalar prefetch [T] int32
    data_ref,  # [1, FEAT, C] VMEM block
    out_ref,  # [1, 8, P] VMEM block
    trans_scr,  # [1, P]
    color_scr,  # [4, P] rgb + depth
    *,
    tile_px: int,
    tiles_x: int,
    chunk: int,
):
    t = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    p = tile_px * tile_px

    @pl.when(k == 0)
    def _init():
        trans_scr[...] = jnp.ones_like(trans_scr)
        color_scr[...] = jnp.zeros_like(color_scr)

    count = counts_ref[t]
    base = k * chunk
    # whole-tile early-exit: skip remaining chunks only once EVERY pixel has
    # saturated (the CUDA kernel's all-threads-done vote, forward.cu:312-314)
    live = jnp.logical_and(base < count, jnp.max(trans_scr[0, :]) >= T_EPS)

    @pl.when(live)
    def _work():
        data = data_ref[0]  # [FEAT, C]
        # pixel monomial basis [1, P]
        pid = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        ox = (t % tiles_x) * tile_px
        oy = (t // tiles_x) * tile_px
        px = (ox + pid % tile_px).astype(jnp.float32)
        py = (oy + pid // tile_px).astype(jnp.float32)

        def row(i):
            return data[i, :].reshape(chunk, 1)

        a, b, c = row(_CA), row(_CB), row(_CC)
        mx, my = row(_MX), row(_MY)
        # centered quadratic form (forward.cu:335-338). NOT expanded into
        # pixel monomials: px^2 ~ 2.6e5 at 512^2 makes the expanded form
        # lose ~6 f32 digits to cancellation.
        dx = mx - px  # [C, P] broadcast
        dy = my - py
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy  # [C, P]

        alpha = jnp.minimum(ALPHA_MAX, row(_OP) * jnp.exp(power))
        slot = base + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        keep = (
            (power <= 0.0)
            & (alpha >= ALPHA_EPS)
            & (slot < count)
        )
        eff = jnp.where(keep, alpha, 0.0)
        one_minus = 1.0 - eff
        cp = _hillis_steele_cumprod(one_minus, chunk)  # inclusive [C, P]
        ex = cp / one_minus  # exclusive (one_minus >= 0.01, exact)
        trans = trans_scr[0:1, :]  # [1, P]
        t_hyp = trans * cp
        applied = (t_hyp >= T_EPS).astype(jnp.float32)
        w = eff * trans * ex * applied  # [C, P]

        # rgbd accumulation as ONE MXU matmul over the chunk axis instead of
        # 4 cross-sublane reduction trees on the VPU (HIGHEST = 3-pass bf16
        # ~= f32 exact; default single-pass bf16 costs ~1e-3 color error)
        color_scr[...] += jax.lax.dot_general(
            data[_R:_D + 1, :], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # product of one_minus over applied rows == cp at the last applied
        # row; `applied` is a prefix of the monotone non-increasing cp, so
        # min over applied rows (1.0 elsewhere) is that product — Mosaic has
        # no reduce_prod, min is equivalent here.
        trans_scr[...] = trans * jnp.min(
            jnp.where(applied > 0, cp, 1.0), axis=0, keepdims=True
        )

    @pl.when(k == nk - 1)
    def _write():
        out_ref[0, 0:4, :] = color_scr[...]
        out_ref[0, 4:5, :] = trans_scr[...]
        out_ref[0, 5:8, :] = jnp.zeros((3, p), jnp.float32)


def composite_tiles_pallas(
    lists: jnp.ndarray,  # [T, K] indices into depth-sorted arrays
    counts: jnp.ndarray,  # [T]
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
    chunk: int = 128,
    interpret: bool | None = None,
    order: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (color [H, W, 3], depth [H, W], final_T [H, W]).

    When ``order`` is given, the ``*_s`` inputs are in ORIGINAL (unsorted)
    index space and ``lists`` indexes the depth-sorted space; the two
    gathers compose into one (no N-sized sort-gather intermediate)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_tiles, k = lists.shape
    p = tile_px * tile_px
    kp = -(-k // chunk) * chunk
    if kp != k:
        lists = jnp.pad(lists, ((0, 0), (0, kp - k)))

    feat = jnp.stack(
        [
            mean2d_s[:, 0],
            mean2d_s[:, 1],
            conic_s[:, 0],
            conic_s[:, 1],
            conic_s[:, 2],
            opac_s,
            rgb_s[:, 0],
            rgb_s[:, 1],
            rgb_s[:, 2],
            depth_s,
        ],
        axis=0,
    )  # [10, N]
    feat = jnp.pad(feat, ((0, FEAT - feat.shape[0]), (0, 0)))
    idx = lists if order is None else order[lists]
    data = feat[:, idx]  # [FEAT, T, Kp]
    data = jnp.swapaxes(data, 0, 1)  # [T, FEAT, Kp]

    kernel = functools.partial(
        _composite_kernel, tile_px=tile_px, tiles_x=tiles_x, chunk=chunk
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles, kp // chunk),
        in_specs=[
            pl.BlockSpec(
                (1, FEAT, chunk),
                lambda t, k, *_: (t, 0, k),
            ),
        ],
        out_specs=pl.BlockSpec((1, 8, p), lambda t, k, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.VMEM((4, p), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, p), jnp.float32),
        interpret=interpret,
    )(counts.astype(jnp.int32), data)

    rgbd = out[:, 0:4, :]  # [T, 4, P]
    trans = out[:, 4, :]  # [T, P]
    color = jnp.moveaxis(rgbd[:, 0:3, :], 1, -1)  # [T, P, 3]
    color = color + trans[..., None] * bg[None, None, :]

    def to_img(x):
        trailing = x.shape[2:]
        img = x.reshape((tiles_y, tiles_x, tile_px, tile_px) + trailing)
        img = jnp.swapaxes(img, 1, 2).reshape(
            (tiles_y * tile_px, tiles_x * tile_px) + trailing
        )
        return img[:height, :width]

    return to_img(color), to_img(rgbd[:, 3, :]), to_img(trans)


def _pairs_kernel(
    starts_ref,  # scalar prefetch [T]
    counts_ref,  # scalar prefetch [T]
    startblk_ref,  # scalar prefetch [T] (= starts // chunk)
    data_ref,  # [FEAT, chunk] stream block
    out_ref,  # [1, 8, P]
    trans_scr,
    color_scr,
    *,
    tile_px: int,
    tiles_x: int,
    chunk: int,
    max_blk: int,
):
    t = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    p = tile_px * tile_px

    @pl.when(k == 0)
    def _init():
        trans_scr[...] = jnp.ones_like(trans_scr)
        color_scr[...] = jnp.zeros_like(color_scr)

    start = starts_ref[t]
    count = counts_ref[t]
    blk = jnp.minimum(startblk_ref[t] + k, max_blk)
    base = blk * chunk
    live = jnp.logical_and(
        base < start + count, jnp.max(trans_scr[0, :]) >= T_EPS
    )

    @pl.when(live)
    def _work():
        data = data_ref[...]  # [FEAT, C]
        pid = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        ox = (t % tiles_x) * tile_px
        oy = (t // tiles_x) * tile_px
        px = (ox + pid % tile_px).astype(jnp.float32)
        py = (oy + pid // tile_px).astype(jnp.float32)

        def row(i):
            return data[i, :].reshape(chunk, 1)

        a, b, c = row(_CA), row(_CB), row(_CC)
        mx, my = row(_MX), row(_MY)
        dx = mx - px
        dy = my - py
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, row(_OP) * jnp.exp(power))
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
        ex = cp / one_minus
        trans = trans_scr[0:1, :]
        t_hyp = trans * cp
        applied = (t_hyp >= T_EPS).astype(jnp.float32)
        w = eff * trans * ex * applied
        # rgbd accumulation on the MXU (see _composite_kernel)
        color_scr[...] += jax.lax.dot_general(
            data[_R:_D + 1, :], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        trans_scr[...] = trans * jnp.min(
            jnp.where(applied > 0, cp, 1.0), axis=0, keepdims=True
        )

    @pl.when(k == nk - 1)
    def _write():
        out_ref[0, 0:4, :] = color_scr[...]
        out_ref[0, 4:5, :] = trans_scr[...]
        out_ref[0, 5:8, :] = jnp.zeros((3, p), jnp.float32)


def assemble_stream_data(
    pair_ids: jnp.ndarray,  # [Pc] original Gaussian ids (tile-major)
    mean2d: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    opac: jnp.ndarray,
    *,
    slim: bool = True,
) -> jnp.ndarray:
    """Gather per-Gaussian features into pair-stream order → [FEAT, Pc].

    ``slim`` gathers only the 10 real feature rows and pads the result to
    FEAT=16 afterwards (a cheap bandwidth-bound copy) instead of padding
    the [10, N] table first and gathering 16 rows — identical output
    (pad rows are zeros either way), ~37% less random-access gather work.
    """
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
    if slim:
        data = feat[:, pair_ids]  # [10, Pc]
        return jnp.pad(data, ((0, FEAT - feat.shape[0]), (0, 0)))
    feat = jnp.pad(feat, ((0, FEAT - feat.shape[0]), (0, 0)))
    return feat[:, pair_ids]


# NB a 1-D block-aligned stream kernel (grid over real pair blocks via a
# data-dependent OUT index map, alignment on ids before the gather) was
# built and measured in round 5 and LOST at every operating point --
# trained 512^2: 41.8 vs 16.0 ms; trained 1080p tile64: 70.6 vs 57.0;
# trained 1080p tile32: 194.6 vs 88.6 -- the scalar-prefetch-dependent out
# map defeats Mosaic's output pipelining (every step pays the flush), so
# it was deleted like the round-2 block kernel. The (tile, slot) grid's
# dead steps cost only ~0.36 us each (mpt 8192 vs 2048 kernel-only: 42.2
# vs 33.4 ms at 1080p); the live-chunk VPU work is the real budget.


def composite_pairs_pallas(
    pair_ids: jnp.ndarray,  # [P_cap] original Gaussian ids (tile-major)
    starts: jnp.ndarray,  # [T]
    counts: jnp.ndarray,  # [T]
    mean2d: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    opac: jnp.ndarray,
    *,
    height: int,
    width: int,
    tiles_x: int,
    tiles_y: int,
    tile_px: int,
    bg: jnp.ndarray,
    max_per_tile: int = 2048,
    chunk: int = 128,
    interpret: bool | None = None,
    slim_gather: bool = True,
    data: jnp.ndarray | None = None,  # precomputed [FEAT, Pc] stream
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pair-stream composite: the kernel reads CONTIGUOUS chunks of the
    depth-ordered pair stream per tile (one small gather into stream order,
    no [T, K] list materialization — ~2.3x less gather traffic at typical
    tile occupancy)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_tiles = tiles_x * tiles_y
    p = tile_px * tile_px
    p_cap = pair_ids.shape[0]
    pc = -(-p_cap // chunk) * chunk
    if pc != p_cap:
        pair_ids = jnp.pad(pair_ids, (0, pc - p_cap))

    if data is None:
        data = assemble_stream_data(
            pair_ids, mean2d, conic, rgb, depth, opac, slim=slim_gather
        )  # [FEAT, Pc] — stream-ordered
    elif data.shape[1] != pc:
        data = jnp.pad(data, ((0, 0), (0, pc - data.shape[1])))

    max_blk = pc // chunk - 1
    blocks_per_tile = -(-max_per_tile // chunk) + 1
    kernel = functools.partial(
        _pairs_kernel,
        tile_px=tile_px,
        tiles_x=tiles_x,
        chunk=chunk,
        max_blk=max_blk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles, blocks_per_tile),
        in_specs=[
            pl.BlockSpec(
                (FEAT, chunk),
                lambda t, k, starts, counts, startblk: (
                    0,
                    jnp.minimum(startblk[t] + k, max_blk),
                ),
            ),
        ],
        out_specs=pl.BlockSpec((1, 8, p), lambda t, k, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.VMEM((4, p), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, p), jnp.float32),
        interpret=interpret,
    )(
        starts.astype(jnp.int32),
        counts.astype(jnp.int32),
        (starts // chunk).astype(jnp.int32),
        data,
    )

    rgbd = out[:, 0:4, :]
    trans = out[:, 4, :]
    color = jnp.moveaxis(rgbd[:, 0:3, :], 1, -1)
    color = color + trans[..., None] * bg[None, None, :]

    def to_img(x):
        trailing = x.shape[2:]
        img = x.reshape((tiles_y, tiles_x, tile_px, tile_px) + trailing)
        img = jnp.swapaxes(img, 1, 2).reshape(
            (tiles_y * tile_px, tiles_x * tile_px) + trailing
        )
        return img[:height, :width]

    return to_img(color), to_img(rgbd[:, 3, :]), to_img(trans)
