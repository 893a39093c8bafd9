"""Round-4 perf experiments + full bench in ONE TPU process.

Runs, in order (single chip claim — see tools/tpu_batch.py for why):
  1. tools/profile_pairs stage profile + M/max_pairs A/B (synthetic 131k)
  2. trained-scene A/B on outputs/bench_scene/point_cloud.ply:
     default vs tight_cull, and max_tiles_per_gaussian 32/16/8 —
     CLAUDE.md documents tight culling LOSING on the near-isotropic
     synthetic scene (9.9 -> 11.3 ms) but cutting pairs 2.15x on real
     anisotropic captures; this measures which way the committed trained
     artifact goes (VERDICT r3 item 8 "documented measured result").
  3. bench.py main() — the production bench, warming the persistent
     compile cache for the driver run and producing the numbers the
     README/CLAUDE perf tables must quote (round-2 post-mortem rule).

Usage: python tools/round4_perf.py [--skip-profile] [--skip-trained]
       [--skip-bench]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def trained_ab():
    import jax
    import jax.numpy as jnp

    from dge_tpu.ops import render as R
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    ply = os.path.join(REPO, "outputs", "bench_scene", "point_cloud.ply")
    if not os.path.exists(ply):
        print("[round4_perf] no trained scene artifact — skipping",
              file=sys.stderr)
        return
    scene = G.load_ply(ply)
    n = int(scene.n_alive)
    aspect = None
    try:
        s = np.exp(np.asarray(scene.scaling[: scene.capacity]))
        alive = np.asarray(scene.alive[: scene.capacity]).astype(bool)
        s = s[alive]
        aspect = float(np.quantile(s.max(1) / s.min(1), 0.9))
    except Exception:
        pass
    print(f"[round4_perf] trained scene: n={n}, p90 aspect={aspect}",
          flush=True)
    cam = CameraArrays.from_camera(look_at_camera(
        np.array([2.3, 0.9, -2.3]), np.array([0.0, -0.45, 0.0]),
        fovx=math.radians(60), height=512, width=512,
    ))
    bg = jnp.zeros(3, jnp.float32)
    backend = (
        "pallas_stream" if jax.default_backend() in ("tpu", "axon") else "jnp"
    )

    def bench_cfg(name, **kw):
        base = dict(tile_px=32, max_per_tile=2048, max_tiles_per_gaussian=32,
                    small_slots=4, max_pairs=1 << 19, big_capacity=1024,
                    chunk=64, backend=backend)
        base.update(kw)
        fwd = jax.jit(lambda s, c: (
            lambda o: (o.color.sum(), o.spill)
        )(R.render(s, c, bg, **base)))
        # probe: grow caps together until spill clears (same ladder the
        # eval path uses) so every variant is timed at its honest caps
        for _ in range(5):
            _, sp = fwd(scene, cam)
            if int(sp) == 0:
                break
            base["max_per_tile"] *= 2
            base["max_tiles_per_gaussian"] = min(
                base["max_tiles_per_gaussian"] * 2, 32)
            base["small_slots"] = min(base["small_slots"] * 2, 32)
            base["max_pairs"] *= 2
            base["big_capacity"] *= 2
            fwd = jax.jit(lambda s, c, _b=dict(base): (
                lambda o: (o.color.sum(), o.spill)
            )(R.render(s, c, bg, **_b)))
        else:
            # ladder exhausted after a final grow: re-probe so the printed
            # spill corresponds to the caps actually being timed
            _, sp = fwd(scene, cam)
        sp = int(sp)
        iters = 20
        variants = [scene.replace(opacity=scene.opacity + 1e-6 * i)
                    for i in range(iters)]
        acc, _ = fwd(variants[0], cam)
        float(acc)
        t0 = time.perf_counter()
        accs = []
        for v in variants:
            a, _ = fwd(v, cam)
            accs.append(a)
        float(jnp.stack(accs).sum())
        dt = (time.perf_counter() - t0) / iters
        print(f"[round4_perf] trained {name}: {dt * 1e3:.2f} ms/frame "
              f"({1 / dt:.1f} fps, spill {sp}, caps mpt={base['max_per_tile']}"
              f" mtg={base['max_tiles_per_gaussian']} mp={base['max_pairs']}"
              f" big={base['big_capacity']})", flush=True)

    bench_cfg("default M=32")
    bench_cfg("tight_cull", tight_cull=True)
    bench_cfg("M=16", max_tiles_per_gaussian=16)
    bench_cfg("M=16+tight", max_tiles_per_gaussian=16, tight_cull=True)
    bench_cfg("M=8", max_tiles_per_gaussian=8)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-profile", action="store_true")
    ap.add_argument("--skip-trained", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if not args.skip_profile:
        print("[round4_perf] === stage profile (synthetic) ===", flush=True)
        from tools import profile_pairs

        try:
            profile_pairs.main()
        except Exception:
            import traceback

            traceback.print_exc()
    if not args.skip_trained:
        print("[round4_perf] === trained-scene A/B ===", flush=True)
        try:
            trained_ab()
        except Exception:
            import traceback

            traceback.print_exc()
    if not args.skip_bench:
        print("[round4_perf] === production bench ===", flush=True)
        import bench

        bench.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
