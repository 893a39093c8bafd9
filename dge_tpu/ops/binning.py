"""Tile binning: depth-global sort + capped per-tile Gaussian lists.

TPU-first replacement for the reference's dynamic-size binning pipeline
(cuda_rasterizer/rasterizer_impl.cu:179-285: InclusiveSum -> duplicateWithKeys
-> cub radix sort over [tileID|depth] keys -> identifyTileRanges). The GPU
path allocates data-dependent buffers and syncs ``num_rendered`` to the host;
XLA needs static shapes, so instead we:

1. depth-sort all (padded) Gaussians once per view with ``jnp.argsort``
   (culled/dead rows get +inf keys). Per-tile relative order of a global
   depth sort equals the reference's per-tile depth sort.
2. build capped per-tile index lists [num_tiles, max_per_tile] via a chunked
   intersect-test + prefix-sum compaction scan. Overflow beyond the cap is
   dropped far-to-near-last (the farthest excess Gaussians are the ones that
   would be occluded anyway) and reported in ``spill`` for diagnostics —
   the "no silent caps" rule.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    lists: jnp.ndarray  # [T, K] int32 per-tile Gaussian lists (depth order)
    counts: jnp.ndarray  # [T] int32 number of valid entries (capped at K)
    order: jnp.ndarray  # [N] int32 depth permutation the lists index into,
    #                     or None when lists hold original ids directly
    spill: jnp.ndarray  # scalar int32 total overflow dropped across tiles
    tiles_x: int
    tiles_y: int


def tile_rects(mean2d, radius, visible, tile_px, tiles_x, tiles_y):
    """Conservative tile bbox per Gaussian (getRect, auxiliary.h:45-56)."""
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile_px), 0, tiles_x)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile_px), 0, tiles_y)
    x1 = jnp.clip(
        jnp.floor((mean2d[:, 0] + radius + tile_px - 1) / tile_px), 0, tiles_x
    )
    y1 = jnp.clip(
        jnp.floor((mean2d[:, 1] + radius + tile_px - 1) / tile_px), 0, tiles_y
    )
    empty = ((x1 - x0) * (y1 - y0)) == 0
    vis = visible & ~empty
    return x0.astype(jnp.int32), x1.astype(jnp.int32), y0.astype(jnp.int32), y1.astype(
        jnp.int32
    ), vis


def tile_min_q(mean2d, conic, tx, ty, tile_px):
    """Minimum of the Mahalanobis quadratic q(p) = a*dx^2 + 2b*dx*dy + c*dy^2
    (dx = mean_x - px) over a tile's continuous pixel box
    [tx*T, tx*T + T - 1] x [ty*T, ty*T + T - 1] (which contains every pixel
    center the compositor evaluates, so the bound is one-sided).

    The conic is PSD, so q is convex: the min is 0 when the mean lies inside
    the box, otherwise it is attained on the boundary — each of the four
    edges is a 1-D quadratic with a closed-form clamped minimizer.

    mean2d [N, 2], conic [N, 3], tx/ty int [N, M] -> f32 [N, M].
    """
    return _tile_min_q_T(mean2d, conic, tx.T, ty.T, tile_px)[0].T


def _tile_min_q_T(mean2d, conic, txT, tyT, tile_px):
    """tile_min_q in transposed [M, N] layout (txT/tyT [M, N] -> ([M, N]
    qmin, [M, N] qabs)): M is small (4/32), and a [N, M] minor dim pads to
    the 128-lane vector width on TPU — measured ~2 ms of pure relayout
    waste at N=131k, M=4 vs ~0.1 ms with N in the lanes.

    ``qabs`` is the absolute-magnitude form a*u^2 + |2b*u*v| + c*v^2 at the
    chosen minimizer — the cancellation scale of the quadratic, which bounds
    the f32 roundoff divergence between this evaluation and the compositor
    kernels' differently-grouped power computation (for high-aspect conics
    the terms cancel catastrophically and a fixed absolute margin is not
    safe)."""
    t = float(tile_px)
    mx = mean2d[None, :, 0]
    my = mean2d[None, :, 1]
    a = conic[None, :, 0]
    b = conic[None, :, 1]
    c = conic[None, :, 2]
    txf = txT.astype(jnp.float32) * t
    tyf = tyT.astype(jnp.float32) * t
    u0 = mx - (txf + (t - 1.0))  # dx over the box spans [u0, u1]
    u1 = mx - txf
    v0 = my - (tyf + (t - 1.0))
    v1 = my - tyf
    inside = (u0 <= 0.0) & (0.0 <= u1) & (v0 <= 0.0) & (0.0 <= v1)

    asafe = jnp.maximum(a, 1e-12)
    csafe = jnp.maximum(c, 1e-12)

    def q_pair(u, v):
        cross = 2.0 * b * u * v
        return a * u * u + cross + c * v * v, \
            a * u * u + jnp.abs(cross) + c * v * v

    def edge_u(uf):  # u fixed, minimize the 1-D quadratic in v
        vstar = jnp.clip(-b * uf / csafe, v0, v1)
        return q_pair(uf, vstar)

    def edge_v(vf):
        ustar = jnp.clip(-b * vf / asafe, u0, u1)
        return q_pair(ustar, vf)

    m, ma = edge_u(u0)
    for cand, ca in (edge_u(u1), edge_v(v0), edge_v(v1)):
        better = cand < m
        m = jnp.where(better, cand, m)
        ma = jnp.where(better, ca, ma)
    zero = jnp.zeros_like(m)
    return (
        jnp.where(inside, zero, jnp.maximum(m, 0.0)),
        jnp.where(inside, zero, ma),
    )


# Safety margin on the q <= 2*ln(255*opacity) cull test: an absolute floor
# plus a term proportional to the quadratic's cancellation magnitude (qabs).
# The kernels group the power differently (-0.5*(a dx^2 + c dy^2) - b dx dy,
# composite._effective_alpha) than the closed-form edge minimum here, so
# their f32 roundoff diverges by O(eps * qabs) — observed 2.7e-3 at conic
# aspect ~136 where qabs >> q. 2e-5 ~ 170x f32 eps; the extra pairs kept by
# the margin sit in a sub-percent alpha band around 1/255, negligible work.
CULL_Q_MARGIN = 1e-3
CULL_Q_REL = 2e-5


def tile_keep_mask(mean2d, conic, opacity, tx, ty, tile_px):
    """keep[i, j] = some pixel of tile (tx, ty)[i, j] can see Gaussian i at
    alpha >= 1/255. Exact w.r.t. the compositor semantics: every kernel
    (composite._effective_alpha, pallas fwd/bwd) hard-skips alpha < 1/255
    (forward.cu:335-348 analog), so dropping pairs that cannot reach it
    changes neither the image nor the gradients."""
    return _tile_keep_mask_T(mean2d, conic, opacity, tx.T, ty.T, tile_px).T


def _tile_keep_mask_T(mean2d, conic, opacity, txT, tyT, tile_px):
    """tile_keep_mask with [M, N] grids (N in the vector lanes)."""
    qmin, qabs = _tile_min_q_T(mean2d, conic, txT, tyT, tile_px)  # [M, N]
    qcut = 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * 255.0)
    return qmin <= qcut[None, :] + CULL_Q_MARGIN + CULL_Q_REL * qabs


def _cull_valid(mean2d, conic, opacity, x0, y0, w, j, tile_px):
    """Keep-mask for the row-major rect enumeration (slot j of each
    Gaussian): builds the [M, N] grids directly (lane-friendly; see
    _tile_min_q_T) and returns [N, M] to AND into the emission validity."""
    wsafeT = jnp.maximum(w, 1)[None, :]
    txT = x0[None, :] + j[:, None] % wsafeT
    tyT = y0[None, :] + j[:, None] // wsafeT
    return _tile_keep_mask_T(mean2d, conic, opacity, txT, tyT, tile_px).T


def bin_gaussians_scan(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    *,
    height: int,
    width: int,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    chunk: int = 2048,
) -> TileBins:
    """Chunked intersect-test + prefix-sum compaction (the original
    implementation; kept as a cross-check oracle — the pair-sort path below
    is ~11x faster on TPU)."""
    n = mean2d.shape[0]
    tiles_x = -(-width // tile_px)
    tiles_y = -(-height // tile_px)
    num_tiles = tiles_x * tiles_y

    sort_key = jnp.where(visible, depth, jnp.inf)
    order = jnp.argsort(sort_key)  # [N] front-to-back, culled last

    mean_s = mean2d[order]
    rad_s = radius[order]
    vis_s = visible[order]

    x0, x1, y0, y1, vis_s = tile_rects(
        mean_s, rad_s, vis_s, tile_px, tiles_x, tiles_y
    )

    tx = jnp.arange(num_tiles, dtype=jnp.int32) % tiles_x  # [T]
    ty = jnp.arange(num_tiles, dtype=jnp.int32) // tiles_x

    n_pad = -(-n // chunk) * chunk
    pad = n_pad - n

    def pad0(a, fill=0):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]) if pad else a

    x0c = pad0(x0).reshape(-1, chunk)
    x1c = pad0(x1).reshape(-1, chunk)
    y0c = pad0(y0).reshape(-1, chunk)
    y1c = pad0(y1).reshape(-1, chunk)
    visc = pad0(vis_s, False).reshape(-1, chunk)

    tile_rows = jnp.broadcast_to(jnp.arange(num_tiles, dtype=jnp.int32)[:, None],
                                 (num_tiles, chunk))

    def body(carry, xs):
        lists, offsets = carry
        cx0, cx1, cy0, cy1, cvis, base = xs
        hit = (
            cvis[None, :]
            & (tx[:, None] >= cx0[None, :])
            & (tx[:, None] < cx1[None, :])
            & (ty[:, None] >= cy0[None, :])
            & (ty[:, None] < cy1[None, :])
        )  # [T, C]
        pos = offsets[:, None] + jnp.cumsum(hit.astype(jnp.int32), axis=1) - 1
        # out-of-bounds sentinel (NOT -1: negative indices wrap in JAX
        # scatter; only >= K is dropped by mode="drop")
        pos = jnp.where(hit, pos, lists.shape[1])
        vals = base + jnp.arange(chunk, dtype=jnp.int32)
        lists = lists.at[tile_rows, pos].set(
            jnp.broadcast_to(vals[None, :], hit.shape), mode="drop"
        )
        offsets = offsets + jnp.sum(hit, axis=1, dtype=jnp.int32)
        return (lists, offsets), None

    lists0 = jnp.zeros((num_tiles, max_per_tile), dtype=jnp.int32)
    offsets0 = jnp.zeros((num_tiles,), dtype=jnp.int32)
    bases = jnp.arange(0, n_pad, chunk, dtype=jnp.int32)
    (lists, offsets), _ = jax.lax.scan(
        body, (lists0, offsets0), (x0c, x1c, y0c, y1c, visc, bases)
    )
    counts = jnp.minimum(offsets, max_per_tile)
    spill = jnp.sum(jnp.maximum(offsets - max_per_tile, 0))
    return TileBins(
        lists=lists,
        counts=counts,
        order=order,
        spill=spill,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )


def bin_gaussians(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    *,
    height: int,
    width: int,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    max_tiles_per_gaussian: int = 32,
    chunk: int = 2048,  # unused; kept for signature compatibility
    conic: jnp.ndarray = None,
    opacity: jnp.ndarray = None,
) -> TileBins:
    """Duplicate-and-sort binning — the TPU analog of the reference's
    duplicateWithKeys + cub radix sort (rasterizer_impl.cu:67-125, 248-270),
    with static shapes and NO separate depth pre-sort:

    each Gaussian emits up to ``max_tiles_per_gaussian`` pair keys
    ``tile << depth_bits | quantized_depth`` (the CUDA 64-bit
    [tileID|depth] key, packed into int32 by quantizing view depth to the
    bits left over after the tile id); one ``lax.sort`` carrying the
    Gaussian id orders pairs by (tile, depth); ``searchsorted`` recovers
    per-tile ranges (identifyTileRanges analog); a single gather builds the
    capped per-tile lists holding ORIGINAL Gaussian ids (``order`` is
    identity). Ties within a quantization bin keep submission order (stable
    sort). Overflow beyond either cap is counted in ``spill``.

    Passing ``conic`` + ``opacity`` enables exact tight tile culling
    (tile_keep_mask): rect tiles no pixel of which can composite the
    Gaussian at alpha >= 1/255 are not emitted.
    """
    n = mean2d.shape[0]
    tiles_x = -(-width // tile_px)
    tiles_y = -(-height // tile_px)
    num_tiles = tiles_x * tiles_y
    m = max_tiles_per_gaussian

    x0, x1, y0, y1, vis = tile_rects(
        mean2d, radius, visible, tile_px, tiles_x, tiles_y
    )

    bits_tile = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 31 - bits_tile
    if depth_bits < 16:
        raise ValueError(
            f"too many tiles ({num_tiles}) for int32 [tile|depth] keys; "
            "raise tile_px"
        )
    dmin = jnp.min(jnp.where(vis, depth, jnp.inf))
    dmax = jnp.max(jnp.where(vis, depth, -jnp.inf))
    dq = jnp.clip(
        (depth - dmin) / jnp.maximum(dmax - dmin, 1e-12), 0.0, 1.0
    ) * ((1 << depth_bits) - 1)
    # clamp AFTER the int cast: (2^27 - 1) rounds up to 2^27 in f32, which
    # would overflow the depth field into the tile id
    dq = jnp.clip(dq.astype(jnp.int32), 0, (1 << depth_bits) - 1)

    w = x1 - x0
    h = y1 - y0
    cnt = w * h
    j = jnp.arange(m, dtype=jnp.int32)
    wsafe = jnp.maximum(w, 1)[:, None]
    tx = x0[:, None] + j[None, :] % wsafe
    ty = y0[:, None] + j[None, :] // wsafe
    valid = (j[None, :] < cnt[:, None]) & vis[:, None]
    if conic is not None:
        valid &= _cull_valid(mean2d, conic, opacity, x0, y0, w, j, tile_px)
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles)
    keys = (tile_id << depth_bits) | dq[:, None]
    ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], keys.shape
    )
    keys, ids = jax.lax.sort(
        (keys.reshape(-1), ids.reshape(-1)), num_keys=1, is_stable=True
    )

    tids = jnp.arange(num_tiles, dtype=jnp.int32) << depth_bits
    starts = jnp.searchsorted(keys, tids)
    ends = jnp.searchsorted(keys, tids + (1 << depth_bits))
    counts = jnp.minimum(ends - starts, max_per_tile).astype(jnp.int32)
    pos = jnp.clip(
        starts[:, None] + jnp.arange(max_per_tile, dtype=jnp.int32)[None, :],
        0,
        keys.shape[0] - 1,
    )
    lists = ids[pos]

    spill = jnp.sum(jnp.maximum(ends - starts - max_per_tile, 0)) + jnp.sum(
        jnp.where(vis, jnp.maximum(cnt - m, 0), 0)
    )
    return TileBins(
        lists=lists,
        counts=counts,
        order=None,
        spill=spill.astype(jnp.int32),
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )


class PairBins(NamedTuple):
    """Pair-stream binning output: the depth-ordered (tile, Gaussian) pair
    stream itself, instead of materialized per-tile lists — the kernel reads
    contiguous stream chunks per tile (no [T, K] gather)."""

    pair_ids: jnp.ndarray  # [P_cap] int32 original Gaussian ids, tile-major
    starts: jnp.ndarray  # [T] int32 stream offset of each tile's range
    counts: jnp.ndarray  # [T] int32 (capped at max_per_tile)
    spill: jnp.ndarray  # scalar int32
    tiles_x: int
    tiles_y: int
    # [4] int32 (slot, cap, tile, stream): which cap class overflowed —
    # slot = per-Gaussian tile slots (max_tiles_per_gaussian), cap = big
    # grid capacity (big_capacity / small_slots), tile = max_per_tile,
    # stream = max_pairs. Lets cap ladders grow ONLY the exhausted cap
    # instead of doubling everything (the round-5 1080p ladder overshot
    # big_capacity 4x and paid 22.6 ms of binning sort on a 63 ms frame;
    # lumping slot+cap into one class still grew slots/big 2x past need).
    spill_parts: jnp.ndarray = None


def bin_gaussians_pairs(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    *,
    height: int,
    width: int,
    tile_px: int = 32,
    max_per_tile: int = 2048,
    max_tiles_per_gaussian: int = 32,
    max_pairs: int = 0,
    big_capacity: int = 0,
    small_slots: int = 4,
    conic: jnp.ndarray = None,
    opacity: jnp.ndarray = None,
) -> PairBins:
    """Same duplicate-and-sort as bin_gaussians, but returning the sorted
    pair stream truncated to ``max_pairs`` (valid pairs sort before the
    sentinel tile, so the stream prefix is exactly the concatenation of all
    tiles' depth-ordered lists).

    ``max_pairs=0`` auto-scales the cap with the scene: max(2^18, 2N)
    rounded up to a power of two. Measured on the 131k/512^2 bench scene
    the true stream is ~1.75N pairs (229k), so 2N covers it with headroom
    while halving the feature gather + stream padding vs the old 4N
    (9.97 -> 9.44 ms/frame); persistent overflow doubles the cap via
    FitLoop.react_to_spill. All caps
    (max_pairs, max_per_tile, big_capacity for the bucketed emission)
    report overflow in ``spill``; FitLoop.react_to_spill grows them when
    spill persists.

    ``small_slots`` is the bucketed emission's small/big threshold (tiles
    touched before a Gaussian is routed to the compacted big grid). The
    default 4 covers ~93% of Gaussians at the 512^2 operating point; at
    1080p the same scene's median rect is 6 tiles (the focal length scales
    with width), which floods the big grid — small_slots=16 there keeps
    the big population ~1% with ~2x fewer total sort rows."""
    n = mean2d.shape[0]
    if max_pairs <= 0:
        max_pairs = max(1 << 18, 1 << int(2 * n - 1).bit_length())
    return _pair_sort(
        mean2d, depth, radius, visible, height=height, width=width,
        tile_px=tile_px, max_per_tile=max_per_tile,
        max_tiles_per_gaussian=max_tiles_per_gaussian, max_pairs=max_pairs,
        big_capacity=big_capacity or None,
        conic=conic, opacity=opacity,
        # compaction-by-scatter measured 2.5x SLOWER end to end on TPU
        # (XLA scatter serializes 4.2M updates; the big sort it avoids is
        # cheaper) — keep the direct sort; compact_sort stays as an option
        # for backends with fast scatter
        compact_sort=False,
        # bucketed emission: ~93% of Gaussians touch <= 4 tiles (p90=4,
        # p99.9=6 at the 131k/512^2 operating point), so a flat
        # [N, max_tiles] grid is ~90% sentinel rows that the sort still
        # pays for. Small Gaussians emit into a 4-slot grid; the few large
        # ones are compacted (one cheap 1-D sort over ids) into a
        # capacity-N/8 grid with the full 32 slots — identical pair
        # coverage, ~4x fewer sort rows.
        emission="bucketed",
        small_slots=small_slots,
    )


def _compact_tier(
    member, b, m, r_cap, x0, y0, w, cnt, dq, tiles_x, num_tiles, depth_bits,
    mean2d=None, conic=None, opacity=None, tile_px=None,
):
    """Compact one emission tier: pack the ``member`` Gaussians' ids into
    ``b`` slots with one scatter-free 1-D sort (member ids first, in id
    order) and emit up to ``m`` tiles each into a [b, m] key grid.

    With culling inputs this is cull-then-compact: enumerate up to
    ``r_cap`` rect tiles per member, drop the invisible ones
    (tile_keep_mask), and pack the SURVIVORS into the m slots with one
    row-wise stable sort — a thin diagonal splat spanning a 20x20 rect
    truly intersects ~O(20) tiles; the uncompacted grid would emit the
    first m rect tiles (top rows, mostly invisible) and spill the rest
    (measured 173k falsely "spilled" pairs on a trained scene). b is
    small, so the [r_cap, b] candidate grid is cheap where an [N, r_cap]
    one would not be.

    Returns (keys [b, m], ids [b, m], slot_spill, overflowed [N] — the
    members beyond the b capacity, to be degraded to the small grid)."""
    n = cnt.shape[0]
    ids_all = jnp.arange(n, dtype=jnp.int32)
    rank = jnp.cumsum(member.astype(jnp.int32)) - 1
    overflowed = member & (rank >= b)
    slot_ids = jax.lax.sort(jnp.where(member, ids_all, n + ids_all))[:b]
    occupied = slot_ids < n
    sid = jnp.where(occupied, slot_ids, 0)
    j2 = jnp.arange(m, dtype=jnp.int32)
    if conic is not None:
        r = min(num_tiles, r_cap)
        jr = jnp.arange(r, dtype=jnp.int32)
        wbT = jnp.maximum(w[sid], 1)[None, :]
        txT = x0[sid][None, :] + jr[:, None] % wbT  # [R, b]
        tyT = y0[sid][None, :] + jr[:, None] // wbT
        candT = (jr[:, None] < cnt[sid][None, :]) & occupied[None, :]
        keepT = candT & _tile_keep_mask_T(
            mean2d[sid], conic[sid], opacity[sid], txT, tyT, tile_px
        )
        tid_candT = jnp.where(keepT, tyT * tiles_x + txT, num_tiles)
        # row-major emission rank for kept tiles, R for culled: the stable
        # per-column sort packs kept tiles first in original order
        # (dimension=0 keeps the lane-friendly [R, b] layout; only the
        # small [m, b] prefix is transposed out)
        rankkeyT = jnp.where(keepT, jr[:, None], r)
        _, tid_packedT = jax.lax.sort(
            (rankkeyT, tid_candT), dimension=0, num_keys=1, is_stable=True
        )
        kept_cnt = jnp.sum(keepT, axis=0)  # [b]
        valid2 = occupied[:, None] & (
            j2[None, :] < jnp.minimum(kept_cnt, m)[:, None]
        )
        packed = tid_packedT[:m].T  # [b, min(m, r)]
        if r < m:  # tiny tile grids: fewer candidates than slots
            packed = jnp.pad(
                packed, ((0, 0), (0, m - r)), constant_values=num_tiles
            )
        tid2 = jnp.where(valid2, packed, num_tiles)
        # true spill: kept tiles beyond the m slots, plus rect tiles
        # beyond the R enumeration bound (uninspected, counted raw)
        slot_spill = jnp.sum(
            jnp.where(occupied, jnp.maximum(kept_cnt - m, 0), 0)
        ) + jnp.sum(
            jnp.where(occupied, jnp.maximum(cnt[sid] - r, 0), 0)
        )
    else:
        wb_safe = jnp.maximum(w[sid], 1)[:, None]
        tx2 = x0[sid][:, None] + j2[None, :] % wb_safe
        ty2 = y0[sid][:, None] + j2[None, :] // wb_safe
        valid2 = occupied[:, None] & (j2[None, :] < cnt[sid][:, None])
        tid2 = jnp.where(valid2, ty2 * tiles_x + tx2, num_tiles)
        slotted = member & ~overflowed
        slot_spill = jnp.sum(
            jnp.where(slotted, jnp.maximum(cnt - m, 0), 0))
    keys2 = (tid2 << depth_bits) | dq[sid][:, None]
    ids2 = jnp.broadcast_to(sid[:, None], keys2.shape)
    return keys2, ids2, slot_spill, overflowed


def _bucketed_pair_keys(
    x0, y0, w, cnt, dq, vis, tiles_x, num_tiles, depth_bits, m1, m2, b2,
    mean2d=None, conic=None, opacity=None, tile_px=None,
):
    """Two-tier (tile, Gaussian) key emission; returns (keys, ids,
    spill_slot, spill_cap). Exact up to the same per-Gaussian m2 cap as
    the flat grid, plus a b2 capacity bound on how many 'large' Gaussians
    exist (overflow counted, never silent). Big Gaussians beyond the b2
    capacity degrade gracefully to their first m1 tiles in the small grid
    (dense densified scenes can have far more multi-tile Gaussians than
    any fixed capacity; dropping them entirely corrupted training at the
    256^2 fit operating point)."""
    cull = dict(mean2d=mean2d, conic=conic, opacity=opacity,
                tile_px=tile_px)
    common = (x0, y0, w, cnt, dq, tiles_x, num_tiles, depth_bits)
    # A third MID tier (m1 < rect tiles <= 32, compacted like the big
    # grid) was built and measured in round 5: it wins slightly where the
    # mid population is a thin tail (trained 512^2: 14.99 vs 15.71 ms)
    # but LOSES 11 ms at the flagship trained-1080p/tile32 cell (47.6 vs
    # 36.4 ms) — at 1080p the 9..32-rect-tile class is ~half the scene
    # (rect counts are pre-cull), so the tier either overflows (degrading
    # to the small grid AND paying its rows) or balloons past the rows it
    # saves. Deleted per the opt-in rule; classification by KEPT tiles
    # would need the [N, R] cull mask the bucketed design exists to avoid.
    big = vis & (cnt > m1)
    # 2*m2 candidate headroom so the ladder's max_tiles_per_gaussian
    # growth keeps buying inspected rect tiles past 256 (a rect larger
    # than r would otherwise spill its tail uninspected forever)
    keys_b, ids_b, spill_b, over_b = _compact_tier(
        big, b2, m2, max(256, 2 * m2), *common, **cull)
    overflowed = over_b

    n = cnt.shape[0]
    ids_all = jnp.arange(n, dtype=jnp.int32)
    j1 = jnp.arange(m1, dtype=jnp.int32)
    wsafe = jnp.maximum(w, 1)[:, None]
    tx1 = x0[:, None] + j1[None, :] % wsafe
    ty1 = y0[:, None] + j1[None, :] // wsafe
    in_small = vis & (~big | overflowed)
    valid1 = (j1[None, :] < cnt[:, None]) & in_small[:, None]
    if conic is not None:
        valid1 &= _cull_valid(mean2d, conic, opacity, x0, y0, w, j1, tile_px)
    tid1 = jnp.where(valid1, ty1 * tiles_x + tx1, num_tiles)
    keys1 = (tid1 << depth_bits) | dq[:, None]
    ids1 = jnp.broadcast_to(ids_all[:, None], keys1.shape)

    keys = jnp.concatenate([keys1.reshape(-1), keys_b.reshape(-1)])
    ids = jnp.concatenate([ids1.reshape(-1), ids_b.reshape(-1)])
    # two gauss spill classes with different remedies: slot overflow
    # (tiles beyond m2 -> grow max_tiles_per_gaussian) vs capacity
    # overflow (mid/big Gaussians beyond their tier capacity, truncated
    # to their first m1 tiles -> grow big_capacity / small_slots)
    spill_slot = spill_b
    spill_cap = jnp.sum(
        jnp.where(overflowed, jnp.maximum(cnt - m1, 0), 0))
    return keys, ids, spill_slot, spill_cap


def _pair_sort(
    mean2d, depth, radius, visible, *, height, width, tile_px, max_per_tile,
    max_tiles_per_gaussian, max_pairs, compact_sort, emission="flat",
    small_slots=4, big_capacity=None, conic=None, opacity=None,
):
    """Pair-stream binning body. ``compact_sort=True`` scatters the valid
    (tile, Gaussian) pairs into a max_pairs-sized buffer BEFORE sorting
    (prefix-sum compaction), so lax.sort works on ~4N rows instead of
    N * max_tiles_per_gaussian — the Gaussian duplication grid is ~94%
    sentinel slots at real scales (avg ~2 tiles touched vs the 32-slot cap),
    and sort time is the binning bottleneck. ``False`` is the original
    sort-everything path, kept as the parity oracle."""
    n = mean2d.shape[0]
    tiles_x = -(-width // tile_px)
    tiles_y = -(-height // tile_px)
    num_tiles = tiles_x * tiles_y
    m = max_tiles_per_gaussian

    x0, x1, y0, y1, vis = tile_rects(
        mean2d, radius, visible, tile_px, tiles_x, tiles_y
    )
    bits_tile = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 31 - bits_tile
    if depth_bits < 16:
        raise ValueError(f"too many tiles ({num_tiles}) for int32 keys")
    dmin = jnp.min(jnp.where(vis, depth, jnp.inf))
    dmax = jnp.max(jnp.where(vis, depth, -jnp.inf))
    dq = jnp.clip(
        (depth - dmin) / jnp.maximum(dmax - dmin, 1e-12), 0.0, 1.0
    ) * ((1 << depth_bits) - 1)
    dq = jnp.clip(dq.astype(jnp.int32), 0, (1 << depth_bits) - 1)

    w = x1 - x0
    h = y1 - y0
    cnt = w * h

    if emission == "bucketed":
        # p99.9 of tiles-touched is ~6 at the 131k/512^2 operating point;
        # the big grid holds the tail (capacity n/32 by default, overflow
        # counted in spill)
        b2 = big_capacity or (1 << max(int(n // 32 - 1).bit_length(), 6))
        keys, ids, spill_slot, spill_cap = _bucketed_pair_keys(
            x0, y0, w, cnt, dq, vis, tiles_x, num_tiles, depth_bits,
            m1=small_slots, m2=m, b2=b2,
            mean2d=mean2d, conic=conic, opacity=opacity, tile_px=tile_px,
        )
        keys, ids = jax.lax.sort((keys, ids), num_keys=1, is_stable=True)
        tids = jnp.arange(num_tiles, dtype=jnp.int32) << depth_bits
        starts = jnp.searchsorted(keys, tids).astype(jnp.int32)
        ends = jnp.searchsorted(
            keys, tids + (1 << depth_bits)
        ).astype(jnp.int32)
        raw = ends - starts
        counts_mpt = jnp.minimum(raw, max_per_tile)
        counts = jnp.minimum(
            counts_mpt, jnp.maximum(max_pairs - starts, 0)
        )
        tile_spill = jnp.sum(raw - counts_mpt)
        stream_spill = jnp.sum(counts_mpt - counts)
        spill = tile_spill + stream_spill + spill_slot + spill_cap
        return PairBins(
            pair_ids=ids[:max_pairs],
            starts=starts,
            counts=counts.astype(jnp.int32),
            spill=spill.astype(jnp.int32),
            tiles_x=tiles_x,
            tiles_y=tiles_y,
            spill_parts=jnp.stack(
                [spill_slot, spill_cap, tile_spill, stream_spill]
            ).astype(jnp.int32),
        )

    j = jnp.arange(m, dtype=jnp.int32)
    wsafe = jnp.maximum(w, 1)[:, None]
    tx = x0[:, None] + j[None, :] % wsafe
    ty = y0[:, None] + j[None, :] // wsafe
    valid = (j[None, :] < cnt[:, None]) & vis[:, None]
    if conic is not None:
        valid &= _cull_valid(mean2d, conic, opacity, x0, y0, w, j, tile_px)
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles)
    keys = (tile_id << depth_bits) | dq[:, None]
    ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], keys.shape)

    overflow_spill = jnp.int32(0)
    if compact_sort:
        # prefix-sum compaction: scatter ONLY the valid pairs into a
        # max_pairs buffer, then sort that (sentinel-filled slots sort
        # last). Submission order is preserved by the monotone cumsum, so
        # the stable sort keeps the same tie order as the full sort.
        vflat = valid.reshape(-1)
        pos = jnp.cumsum(vflat.astype(jnp.int32)) - 1
        total = pos[-1] + 1
        pos = jnp.where(vflat, pos, max_pairs)  # drop sentinel (>= size)
        sentinel = jnp.int32((num_tiles + 1) << depth_bits)
        buf_keys = jnp.full((max_pairs,), sentinel, jnp.int32)
        buf_ids = jnp.zeros((max_pairs,), jnp.int32)
        buf_keys = buf_keys.at[pos].set(keys.reshape(-1), mode="drop")
        buf_ids = buf_ids.at[pos].set(ids.reshape(-1), mode="drop")
        keys, ids = jax.lax.sort(
            (buf_keys, buf_ids), num_keys=1, is_stable=True
        )
        overflow_spill = jnp.maximum(total - max_pairs, 0)
    else:
        keys, ids = jax.lax.sort(
            (keys.reshape(-1), ids.reshape(-1)), num_keys=1, is_stable=True
        )

    tids = jnp.arange(num_tiles, dtype=jnp.int32) << depth_bits
    starts = jnp.searchsorted(keys, tids).astype(jnp.int32)
    ends = jnp.searchsorted(keys, tids + (1 << depth_bits)).astype(jnp.int32)
    raw = ends - starts
    counts_mpt = jnp.minimum(raw, max_per_tile)
    # respect the stream cap too
    counts = jnp.minimum(counts_mpt, jnp.maximum(max_pairs - starts, 0))
    gspill = jnp.sum(jnp.where(vis, jnp.maximum(cnt - m, 0), 0))
    tile_spill = jnp.sum(raw - counts_mpt)
    stream_spill = jnp.sum(counts_mpt - counts) + overflow_spill
    spill = tile_spill + stream_spill + gspill
    return PairBins(
        pair_ids=ids[:max_pairs],
        starts=starts,
        counts=counts.astype(jnp.int32),
        spill=spill.astype(jnp.int32),
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        spill_parts=jnp.stack(
            [gspill, jnp.zeros_like(gspill), tile_spill, stream_spill]
        ).astype(jnp.int32),
    )

