"""Prototype A/B: matmul (MXU) formulation of the pair-stream composite
kernel vs the production Hillis-Steele (VPU roll) kernel.

Variant "logdot": transmittance prefix as exp(L @ log(1-alpha)) with L the
[C, C] lower-triangular ones matrix (cumsum-as-matmul on the MXU), and the
rgbd accumulation as one dot_general over the chunk axis. Run bare on the
TPU box.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import functools
import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    import bench as B
    from dge_tpu.ops import binning, pallas_composite as PC, projection
    from dge_tpu.ops.composite import ALPHA_EPS, ALPHA_MAX, T_EPS
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    scene = B.make_bench_scene()
    cam = CameraArrays.from_camera(
        look_at_camera(np.array([0.0, 0.3, -4.0]), np.zeros(3),
                       fovx=math.radians(60), height=512, width=512)
    )
    bg = jnp.zeros(3)

    def digest(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def timeit(name, fn, *args, iters=20):
        out = fn(*args)
        digest(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        digest(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {dt:.2f} ms", flush=True)
        return out

    prep = jax.jit(lambda s: projection.preprocess(
        s.xyz, s.get_scaling, s.get_rotation, s.get_opacity, s.get_features,
        s.alive, cam, s.active_sh_degree, s.max_sh_degree))(scene)
    pb = jax.jit(lambda p: binning.bin_gaussians_pairs(
        p.mean2d, p.depth, p.radius, p.visible, height=512, width=512,
        tile_px=32, max_per_tile=2048))(prep)

    FEAT = PC.FEAT
    _MX, _MY, _CA, _CB, _CC, _OP, _R, _G, _B, _D = range(10)

    def _cumprod_two_level(x, n, pl=pl, pltpu=pltpu):
        """Exact inclusive cumprod: 3 masked rolls within groups of 8, a
        4-round cumprod of the [n/8] group totals, then expand+multiply."""
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        sub = jax.lax.rem(row, 8)
        for shift in (1, 2, 4):
            rolled = pltpu.roll(x, shift, axis=0)
            x = x * jnp.where(sub >= shift, rolled, 1.0)
        ng = n // 8
        p_ = x.shape[1]
        g = x.reshape(ng, 8, p_)[:, 7, :]  # [n/8, P] group totals
        gr = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
        y = g
        shift = 1
        while shift < ng:
            rolled = pltpu.roll(y, shift, axis=0)
            y = y * jnp.where(gr >= shift, rolled, 1.0)
            shift *= 2
        ey = pltpu.roll(y, 1, axis=0)
        ey = jnp.where(gr >= 1, ey, 1.0)  # exclusive group products
        full = jnp.broadcast_to(ey[:, None, :], (ng, 8, p_)).reshape(n, p_)
        return x * full

    def _pairs_kernel_v2(
        starts_ref, counts_ref, startblk_ref, data_ref, out_ref,
        trans_scr, color_scr, *, tile_px, tiles_x, chunk, max_blk,
        mode="logdot",
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
            pair_idx = base + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, 1), 0
            )
            keep = (
                (power <= 0.0)
                & (alpha >= ALPHA_EPS)
                & (pair_idx >= start)
                & (pair_idx < start + count)
            )
            eff = jnp.where(keep, alpha, 0.0)
            one_minus = 1.0 - eff
            if mode == "logdot":
                lm = jnp.log(one_minus)
                ri = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
                ltri = (ri >= ci).astype(jnp.float32)
                cs = jax.lax.dot_general(
                    ltri, lm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                cp = jnp.exp(cs)
            elif mode == "two_level":
                cp = _cumprod_two_level(one_minus, chunk)
            else:  # roll
                cp = PC._hillis_steele_cumprod(one_minus, chunk)
            ex = cp / one_minus
            trans = trans_scr[0:1, :]
            t_hyp = trans * cp
            applied = (t_hyp >= T_EPS).astype(jnp.float32)
            w = eff * trans * ex * applied  # [C, P]
            rgbd = data[_R:_R + 4, :]  # rows r,g,b,depth [4, C]
            acc = jax.lax.dot_general(
                rgbd, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [4, P]
            color_scr[...] += acc
            trans_scr[...] = trans * jnp.min(
                jnp.where(applied > 0, cp, 1.0), axis=0, keepdims=True
            )

        @pl.when(k == nk - 1)
        def _write():
            out_ref[0, 0:4, :] = color_scr[...]
            out_ref[0, 4:5, :] = trans_scr[...]
            out_ref[0, 5:8, :] = jnp.zeros((3, p), jnp.float32)

    def composite_v2(pair_ids, starts, counts, mean2d, conic, rgb, depth,
                     opac, *, height, width, tiles_x, tiles_y, tile_px, bg,
                     max_per_tile=2048, chunk=128, row_gather=False,
                     mode="logdot"):
        num_tiles = tiles_x * tiles_y
        p = tile_px * tile_px
        p_cap = pair_ids.shape[0]
        pc = -(-p_cap // chunk) * chunk
        if pc != p_cap:
            pair_ids = jnp.pad(pair_ids, (0, pc - p_cap))
        feat = jnp.stack(
            [mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1],
             conic[:, 2], opac, rgb[:, 0], rgb[:, 1], rgb[:, 2], depth],
            axis=0)
        feat = jnp.pad(feat, ((0, FEAT - feat.shape[0]), (0, 0)))
        if row_gather:
            rows = jnp.swapaxes(feat, 0, 1)  # [N, FEAT]
            data = jnp.swapaxes(rows[pair_ids], 0, 1)  # [FEAT, Pc]
        else:
            data = feat[:, pair_ids]

        max_blk = pc // chunk - 1
        blocks_per_tile = -(-max_per_tile // chunk) + 1
        kernel = functools.partial(
            _pairs_kernel_v2, tile_px=tile_px, tiles_x=tiles_x, chunk=chunk,
            max_blk=max_blk, mode=mode)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles, blocks_per_tile),
            in_specs=[
                pl.BlockSpec(
                    (FEAT, chunk),
                    lambda t, k, starts, counts, startblk: (
                        0, jnp.minimum(startblk[t] + k, max_blk)),
                ),
            ],
            out_specs=pl.BlockSpec((1, 8, p), lambda t, k, *_: (t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, p), jnp.float32),
                pltpu.VMEM((4, p), jnp.float32),
            ],
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((num_tiles, 8, p), jnp.float32),
        )(starts.astype(jnp.int32), counts.astype(jnp.int32),
          (starts // chunk).astype(jnp.int32), data)
        rgbd = out[:, 0:4, :]
        trans = out[:, 4, :]
        color = jnp.moveaxis(rgbd[:, 0:3, :], 1, -1)
        color = color + trans[..., None] * bg[None, None, :]
        return color, rgbd[:, 3, :], trans

    kw = dict(height=512, width=512, tiles_x=16, tiles_y=16, tile_px=32,
              bg=bg, max_per_tile=2048, chunk=128)

    old = jax.jit(lambda pb, p: PC.composite_pairs_pallas(
        pb.pair_ids, pb.starts, pb.counts, p.mean2d, p.conic, p.rgb,
        p.depth, p.opacity, **kw))
    new = jax.jit(lambda pb, p: composite_v2(
        pb.pair_ids, pb.starts, pb.counts, p.mean2d, p.conic, p.rgb,
        p.depth, p.opacity, **kw))
    new_rg = jax.jit(lambda pb, p: composite_v2(
        pb.pair_ids, pb.starts, pb.counts, p.mean2d, p.conic, p.rgb,
        p.depth, p.opacity, row_gather=True, **kw))

    mk = lambda **k: jax.jit(lambda pb, p: composite_v2(
        pb.pair_ids, pb.starts, pb.counts, p.mean2d, p.conic, p.rgb,
        p.depth, p.opacity, **kw, **k))
    o_old = timeit("old (roll cumprod)", old, pb, prep)
    o_new = timeit("new (logdot)", new, pb, prep)
    o_rg = timeit("roll + matmul acc", mk(mode="roll"), pb, prep)
    o_tl = timeit("two_level cumprod", mk(mode="two_level"), pb, prep)

    def to_img(x):
        x = np.asarray(x)
        if x.ndim == 3 and x.shape[0] == 256:  # [T, P, 3] tile-major
            img = x.reshape(16, 16, 32, 32, 3)
            img = np.swapaxes(img, 1, 2).reshape(512, 512, 3)
            return img
        return x
    c0 = to_img(o_old[0])
    for name, o in (("logdot", o_new), ("roll+mm", o_rg), ("two_level", o_tl)):
        c = to_img(o[0])
        print(f"{name}: max|dcolor| = {np.abs(c - c0).max():.3e}, "
              f"mean = {np.abs(c - c0).mean():.3e}", flush=True)



if __name__ == "__main__":
    main()
