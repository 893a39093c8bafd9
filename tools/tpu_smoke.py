"""TPU kernel smoke: real-Mosaic correctness vs the jnp oracle (<2 min warm).

The pytest suite runs the Pallas kernels in INTERPRET mode on CPU
(tests/conftest.py forces the cpu backend) — real-TPU kernel correctness
otherwise rests only on bench/quality-gate side effects (VERDICT r3 weak
We assert here, on the actual chip:
  1. forward render: pallas_stream AND pallas (per-tile lists) == jnp
     oracle at small N (color/depth/alpha bounds from tests/test_pallas.py)
  2. training: one pallas_train fwd+bwd step == the jnp-backend step
     (post-step parameter deltas)

Run before any snapshot: `python tools/tpu_smoke.py` (bare env — holds the
TPU). Exits nonzero on divergence.
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"[tpu_smoke] WARNING: running on '{backend}', not a TPU — "
              "this exercises interpret mode only", file=sys.stderr)

    from dge_tpu.ops import render as R
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    rng = np.random.default_rng(0)
    n = 2048
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    fdc = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.5
    frest = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.1
    opacity = rng.uniform(-1.0, 2.0, size=(n, 1)).astype(np.float32)
    scaling = rng.uniform(-4.5, -2.5, size=(n, 3)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    scene = G.from_arrays(xyz, fdc, frest, opacity, scaling, rot,
                          max_sh_degree=1)
    cam = CameraArrays.from_camera(look_at_camera(
        np.array([0.0, 0.3, -4.0]), np.zeros(3), fovx=math.radians(60),
        height=256, width=256,
    ))
    bg = jnp.zeros(3, jnp.float32)
    kw = dict(tile_px=32, max_per_tile=1024, chunk=64)

    failures = []

    def check(name, a, b, atol):
        d = float(np.max(np.abs(np.asarray(a, np.float64)
                                - np.asarray(b, np.float64))))
        ok = d <= atol
        print(f"[tpu_smoke] {name}: max|d| = {d:.3e} "
              f"({'OK' if ok else f'FAIL > {atol}'})", flush=True)
        if not ok:
            failures.append(name)

    # NB: cold-cache remote compiles on this box can take minutes with NO
    # local CPU activity (round-4 measured: 478 s total cold, <30 s warm) —
    # print progress before each program so silence is diagnosable
    print("[tpu_smoke] compiling jnp reference render...", flush=True)
    ref = jax.jit(lambda s, c: R.render(s, c, bg, backend="jnp", **kw))(
        scene, cam)
    for be in ("pallas_stream", "pallas"):
        print(f"[tpu_smoke] compiling {be} render...", flush=True)
        out = jax.jit(lambda s, c, _be=be: R.render(
            s, c, bg, backend=_be, **kw))(scene, cam)
        check(f"{be} color", out.color, ref.color, 1e-4)
        check(f"{be} depth", out.depth, ref.depth, 1e-3)
        check(f"{be} alpha", out.alpha, ref.alpha, 2e-4)

    # one full train step: pallas_train (custom-VJP Mosaic fwd+bwd) vs jnp
    from dge_tpu.systems import fit as F
    from dge_tpu.systems import optim as O

    optimizer = O.make_optimizer(O.OptimConfig.scaled(1500))
    target = jnp.asarray(
        rng.uniform(size=(256, 256, 3)).astype(np.float32))
    results = {}
    for be in ("jnp", "pallas_train"):
        print(f"[tpu_smoke] compiling {be} train step...", flush=True)
        step = F.make_train_step(optimizer, lambda_dssim=0.0,
                                 backend=be, **kw)
        s, o, f = scene, optimizer.init(scene.params()), F.FitState.create(
            scene.capacity)
        s, o, f, aux = step(s, o, f, cam, target, bg)
        results[be] = (np.asarray(s.xyz), np.asarray(s.features_dc),
                       np.asarray(s.opacity), float(aux["loss"]))
    check("train step xyz delta", results["pallas_train"][0],
          results["jnp"][0], 5e-4)
    check("train step features_dc", results["pallas_train"][1],
          results["jnp"][1], 5e-3)
    check("train step opacity", results["pallas_train"][2],
          results["jnp"][2], 5e-3)
    check("train step loss", results["pallas_train"][3],
          results["jnp"][3], 1e-4)

    dt = time.time() - t_start
    if failures:
        print(f"[tpu_smoke] FAIL ({len(failures)}): {failures} "
              f"[{dt:.0f}s]", file=sys.stderr)
        return 1
    print(f"[tpu_smoke] PASS on backend={backend} [{dt:.0f}s]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
