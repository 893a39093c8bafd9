"""Measure the render kernels at 1080p (1920x1080) — the vendored upstream's
own claim resolution (/root/reference/gaussiansplatting/README.md:16,
">= 30 fps at 1080p") and the skewed-tile-load regime the block-aligned
stream kernel (composite_stream_pallas) was designed for.

Usage: python tools/bench_1080p.py [backend ...]
Caps via env: TP (tile_px), SLOTS, MTG, MPT, BIGCAP, MAX_PAIRS, CHUNK, TIGHT.
Best measured 1080p config on the 131k bench scene: TP=64 SLOTS=4 MTG=96
BIGCAP=8192 MPT=2048 MAX_PAIRS=524288 -> 30.2 ms/frame, spill 0.

History (VERDICT r2 item 2): a block-aligned stream kernel
(composite_stream_pallas, backend "pallas_blocks") was measured here and
lost at every operating point (512^2: 23.8 vs 9.9 ms; 1080p tp=32: 89.3 vs
43.2 ms; 1080p tp=64: 49.8 vs 30.2 ms) — its align_pairs pass re-gathered
the full feature stream. Deleted; tile_px=64 is the 1080p answer instead.
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import make_bench_scene
    from dge_tpu.ops import render as R
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    h, w = 1080, 1920
    scene = make_bench_scene()
    cam = look_at_camera(
        np.array([0.0, 0.3, -4.0]), np.zeros(3), fovx=math.radians(60),
        height=h, width=w,
    )
    cam_arr = CameraArrays.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)

    import os

    backends = sys.argv[1:] or ["pallas_stream"]
    mtg = int(os.environ.get("MTG", "128"))
    mpt = int(os.environ.get("MPT", "2048"))
    max_pairs = int(os.environ.get("MAX_PAIRS", str(1 << 21)))
    tight = bool(int(os.environ.get("TIGHT", "0")))
    tp = int(os.environ.get("TP", "32"))
    ck = int(os.environ.get("CHUNK", "128"))
    bigcap = int(os.environ.get("BIGCAP", "0"))
    slots = int(os.environ.get("SLOTS", "4"))
    print(f"caps: mtg={mtg} mpt={mpt} max_pairs={max_pairs} tight={tight} "
          f"bigcap={bigcap} slots={slots} tp={tp} chunk={ck}")
    results = {}
    for backend in backends:
        @jax.jit
        def forward(scene, cam, bg, backend=backend):
            out = R.render(
                scene, cam, bg, tile_px=tp, max_per_tile=mpt, chunk=ck,
                max_tiles_per_gaussian=mtg, max_pairs=max_pairs,
                big_capacity=bigcap, small_slots=slots,
                tight_cull=tight, backend=backend,
            )
            return out.color.sum(), out.spill

        # warm / compile
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        spill = None
        for i in range(3):
            s, spill = forward(
                scene.replace(opacity=scene.opacity - 1e-6 * i), cam_arr, bg
            )
            acc = acc + s
        float(acc)
        print(f"[{backend}] compile+warm {time.perf_counter() - t0:.1f}s "
              f"spill={int(spill)}", flush=True)

        iters = 20
        variants = [
            scene.replace(opacity=scene.opacity + 1e-6 * i)
            for i in range(iters)
        ]
        jax.block_until_ready([s.opacity for s in variants])
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for s in variants:
            r, _ = forward(s, cam_arr, bg)
            acc = acc + r
        float(acc)
        dt = (time.perf_counter() - t0) / iters
        results[backend] = dt
        print(f"[{backend}] {dt * 1e3:.2f} ms/frame = {1 / dt:.1f} fps",
              flush=True)

    print({k: round(v * 1e3, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
