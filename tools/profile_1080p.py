"""Stage breakdown at 1080p: preprocess / pair binning / align / kernels.

Teases apart where the 1080p frame time goes so the composite kernel
choice (pairs-grid vs block-stream) is made on evidence (VERDICT r2
item 2)."""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import make_bench_scene
    from dge_tpu.ops import binning, pallas_composite, projection
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    h, w = int(os.environ.get("H", "1080")), int(os.environ.get("W", "1920"))
    slots = int(os.environ.get("SLOTS", "16"))
    mtg = int(os.environ.get("MTG", "128"))
    mpt = int(os.environ.get("MPT", "2048"))
    bigcap = int(os.environ.get("BIGCAP", "2048"))
    max_pairs = int(os.environ.get("MAX_PAIRS", str(1 << 20)))
    chunk = 128
    tiles_x, tiles_y = -(-w // 32), -(-h // 32)
    print(f"{h}x{w} slots={slots} mtg={mtg} mpt={mpt} bigcap={bigcap} "
          f"max_pairs={max_pairs} tiles={tiles_x}x{tiles_y}")

    scene = make_bench_scene()
    cam = CameraArrays.from_camera(look_at_camera(
        np.array([0.0, 0.3, -4.0]), np.zeros(3), fovx=math.radians(60),
        height=h, width=w))
    bg = jnp.zeros(3, jnp.float32)

    def timeit(name, fn, *args, iters=10):
        out = fn(*args)
        jax.block_until_ready(out)
        # chain-free per-stage timing: sync once at the end via sum digest
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.sum() if hasattr(leaf, "sum") else leaf))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {dt:.2f} ms", flush=True)
        return out

    prep_fn = jax.jit(lambda s: projection.preprocess(
        s.xyz, s.get_scaling, s.get_rotation, s.get_opacity, s.get_features,
        s.alive, cam, s.active_sh_degree, s.max_sh_degree))
    prep = timeit("preprocess", prep_fn, scene)

    bin_fn = jax.jit(lambda p: binning.bin_gaussians_pairs(
        p.mean2d, p.depth, p.radius, p.visible, height=h, width=w,
        tile_px=32, max_per_tile=mpt, max_tiles_per_gaussian=mtg,
        max_pairs=max_pairs, big_capacity=bigcap, small_slots=slots))
    pb = timeit("bin_pairs", bin_fn, prep)
    print(f"  spill={int(pb.spill)} real_pairs={int(pb.counts.sum())}")

    pairs_fn = jax.jit(lambda b, p: pallas_composite.composite_pairs_pallas(
        b.pair_ids, b.starts, b.counts, p.mean2d, p.conic, p.rgb, p.depth,
        p.opacity, height=h, width=w, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_px=32, bg=bg, max_per_tile=mpt, chunk=chunk))
    timeit("composite_pairs (gather+kernel)", pairs_fn, pb, prep)


if __name__ == "__main__":
    main()
