"""Per-stage profile of the pair-stream render path (the production
backend) + A/B over max_tiles_per_gaussian and max_pairs.

Run bare on the TPU box (claims the chip). Stages:
  preprocess -> pair binning (keys+sort+ranges) -> feature gather -> kernel
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    import bench as B
    from dge_tpu.ops import binning, pallas_composite, projection
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    scene = B.make_bench_scene()
    cam = CameraArrays.from_camera(
        look_at_camera(np.array([0.0, 0.3, -4.0]), np.zeros(3),
                       fovx=math.radians(60), height=512, width=512)
    )
    bg = jnp.zeros(3)

    def digest(out):
        # device-side reduce + scalar transfer (a full-array np.asarray
        # would drag MBs through the relay and swamp the timing)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def timeit(name, fn, *args, iters=10):
        out = fn(*args)
        digest(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        digest(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {dt:.2f} ms", flush=True)
        return out

    prep_fn = jax.jit(lambda s: projection.preprocess(
        s.xyz, s.get_scaling, s.get_rotation, s.get_opacity, s.get_features,
        s.alive, cam, s.active_sh_degree, s.max_sh_degree))
    prep = timeit("preprocess", prep_fn, scene)

    for m in (32, 16, 8):
        fn = jax.jit(lambda p, m=m: binning.bin_gaussians_pairs(
            p.mean2d, p.depth, p.radius, p.visible, height=512, width=512,
            tile_px=32, max_per_tile=2048, max_tiles_per_gaussian=m))
        pb = timeit(f"pair_binning M={m}", fn, prep)
        print(f"  spill: {int(pb.spill)}")

    pb = jax.jit(lambda p: binning.bin_gaussians_pairs(
        p.mean2d, p.depth, p.radius, p.visible, height=512, width=512,
        tile_px=32, max_per_tile=2048))(prep)

    def gather_only(pb, p):
        feat = jnp.stack([
            p.mean2d[:, 0], p.mean2d[:, 1], p.conic[:, 0], p.conic[:, 1],
            p.conic[:, 2], p.opacity, p.rgb[:, 0], p.rgb[:, 1], p.rgb[:, 2],
            p.depth], axis=0)
        feat = jnp.pad(feat, ((0, 6), (0, 0)))
        return feat[:, pb.pair_ids]

    timeit("feature_gather", jax.jit(gather_only), pb, prep)

    kern = jax.jit(lambda pb, p: pallas_composite.composite_pairs_pallas(
        pb.pair_ids, pb.starts, pb.counts, p.mean2d, p.conic, p.rgb,
        p.depth, p.opacity, height=512, width=512, tiles_x=16,
        tiles_y=16, tile_px=32, bg=bg, max_per_tile=2048, chunk=128))
    timeit("gather+kernel", kern, pb, prep)

    # end-to-end fps at M variants
    from dge_tpu.ops import render as R
    for m in (32, 16, 8):
        full = jax.jit(lambda s, m=m: R.render(
            s, cam, bg, tile_px=32, max_per_tile=2048,
            max_tiles_per_gaussian=m, chunk=128,
            backend="pallas_stream").color.sum())
        out = timeit(f"end_to_end M={m}", full, scene)


if __name__ == "__main__":
    main()
