"""Round-5 perf measurements on TRAINED scenes (VERDICT r4 items 1-2).

The open perf claim is the reference's own context: trained captures at
1080p, >= 30 fps (/root/reference/gaussiansplatting/README.md:16,68).
BENCH_r04 had synthetic-1080p (32.9 fps) and trained-512^2 (44.2 fps) but
never the trained-1080p cell. This tool measures it and decomposes the
frame into stages so the optimization target is data, not guesswork:

  --baseline   trained scene e2e at 512^2/tile32 and 1080p/tile64, caps
               probed to spill 0 (the ladder every eval path uses)
  --stages     per-stage ms at the converged caps: preprocess / binning /
               feature gather (legacy 16-row vs slim 10-row) / kernel-only
  --grid-ab    kernel-only at max_per_tile 2048/4096/8192 with IDENTICAL
               counts — isolates the dead-grid-step cost of cap growth
               (grid = tiles x (mpt/chunk+1); skewed scenes grow mpt for
               one hot tile and pay grid steps on all of them)
  --chunk-ab   kernel-only at chunk 128 vs 256
  --cull-ab    e2e tight_cull on/off at trained 1080p
  --scene PLY  defaults to outputs/bench_scene/point_cloud.ply; pass the
               hi-aniso artifact to re-run the regime A/B there

Timing: variants chained, ONE host sync at the end (block_until_ready is
unreliable through the axon relay — CLAUDE.md). Keep the host idle: a
concurrent CPU suite inflated a round-4 stage reading 3x.
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _timeit(name, fn, args_list, sync=None):
    """fn(*args) repeated over args_list (distinct args defeat caching);
    one forced host transfer at the end bounds execution."""
    import jax
    import jax.numpy as jnp

    out = fn(*args_list[0])
    _force(out)
    t0 = time.perf_counter()
    outs = []
    for a in args_list:
        outs.append(fn(*a))
    _force(outs)
    dt = (time.perf_counter() - t0) / len(args_list)
    print(f"[round5_perf] {name}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def _force(tree):
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    acc = sum(jnp.ravel(x)[:1].astype(jnp.float32).sum() for x in leaves)
    float(acc)


def _variants(scene, n=10):
    return [(scene.replace(opacity=scene.opacity + 1e-6 * i),)
            for i in range(n)]


def load_scene(ply):
    from dge_tpu.scene import gaussians as G

    scene = G.load_ply(ply)
    sc = np.asarray(np.exp(np.asarray(scene.scaling)))
    alive = np.asarray(scene.alive)
    sc = sc[alive]
    asp = np.sort(sc, axis=1)
    aspect = asp[:, 2] / np.maximum(asp[:, 0], 1e-12)
    print(f"[round5_perf] scene {ply}: n={alive.sum()} "
          f"aspect p50={np.percentile(aspect, 50):.1f} "
          f"p90={np.percentile(aspect, 90):.1f} "
          f"p99={np.percentile(aspect, 99):.1f}", flush=True)
    return scene


def make_cam(h, w):
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    return CameraArrays.from_camera(look_at_camera(
        np.array([2.3, 0.9, -2.3]), np.array([0.0, -0.45, 0.0]),
        fovx=math.radians(60), height=h, width=w,
    ))


def ladder(scene, cam, *, tile_px, tight_cull=False, chunk=128,
           slim_gather=False, start=None, max_grow=6,
           backend="pallas_stream"):
    """Grow only the spilled cap classes until spill == 0; returns
    (caps, fwd)."""
    import jax
    import jax.numpy as jnp
    from dge_tpu.ops import render as R

    bg = jnp.zeros(3, jnp.float32)
    caps = dict(start or dict(
        max_per_tile=2048, max_tiles_per_gaussian=32 if tile_px == 32 else 96,
        small_slots=4, max_pairs=1 << 19, big_capacity=4096,
    ))

    def make(c):
        return jax.jit(lambda s, _c=dict(c): (lambda o: (
            o.color.sum(), o.spill, o.spill_parts
        ))(R.render(s, cam, bg, tile_px=tile_px, chunk=chunk,
                    backend=backend, tight_cull=tight_cull,
                    slim_gather=slim_gather, **_c)))

    def fwd2(s):  # timing-friendly view (drop parts)
        a, b, _ = fwd(s)
        return a, b

    fwd = make(caps)
    sp = None
    for _ in range(max_grow):
        _, sp, parts = fwd(scene)
        if int(sp) == 0:
            break
        new_caps = R.grow_caps(caps, parts)
        if new_caps == caps:
            print(f"[round5_perf] spill {int(sp)}: all caps at ceilings — "
                  "stopping ladder", flush=True)
            break
        caps = new_caps
        print(f"[round5_perf] spill {int(sp)} parts "
              f"{[int(x) for x in parts]} -> {caps}", flush=True)
        fwd = make(caps)
    else:
        _, sp, _ = fwd(scene)
    print(f"[round5_perf] ladder tile_px={tile_px} tight={tight_cull} "
          f"slim={slim_gather}: caps={caps} spill={int(sp)}", flush=True)
    return caps, fwd2


def _bins_and_prep(scene, cam, caps, tile_px):
    import jax
    from dge_tpu.ops import binning, projection

    def prep_fn(s):
        return projection.preprocess(
            s.xyz, s.get_scaling, s.get_rotation, s.get_opacity,
            s.get_features, s.alive, cam, s.active_sh_degree,
            s.max_sh_degree)

    def bins_fn(p):
        return binning.bin_gaussians_pairs(
            p.mean2d, p.depth, p.radius, p.visible,
            height=cam.height, width=cam.width, tile_px=tile_px,
            max_per_tile=caps["max_per_tile"],
            max_tiles_per_gaussian=caps["max_tiles_per_gaussian"],
            max_pairs=caps["max_pairs"],
            big_capacity=caps["big_capacity"],
            small_slots=caps["small_slots"])

    return jax.jit(prep_fn), jax.jit(bins_fn)


def run_stages(scene, cam, caps, tile_px, label, chunk=128):
    import jax
    import jax.numpy as jnp
    from dge_tpu.ops import pallas_composite as PC

    print(f"[round5_perf] === stages {label} (caps {caps}) ===", flush=True)
    prep_jit, bins_jit = _bins_and_prep(scene, cam, caps, tile_px)
    sv = _variants(scene)
    _timeit("preprocess", prep_jit, sv)
    prep = prep_jit(scene)
    pv = [(prep_jit(s),) for (s,) in sv]
    _timeit("binning", bins_jit, pv)
    bins = bins_jit(prep)
    print(f"  stream: max_pairs={caps['max_pairs']} "
          f"real_pairs={int(bins.counts.sum())} spill={int(bins.spill)}",
          flush=True)

    def gather(p, b, slim):
        return PC.assemble_stream_data(
            b.pair_ids, p.mean2d, p.conic, p.rgb, p.depth, p.opacity,
            slim=slim)

    gv = [(p, bins_jit(p)) for (p,) in pv]
    g_legacy = jax.jit(lambda p, b: gather(p, b, False))
    g_slim = jax.jit(lambda p, b: gather(p, b, True))
    _timeit("gather 16-row (legacy)", g_legacy, gv)
    _timeit("gather 10-row (slim)", g_slim, gv)

    tiles_x = int(bins.tiles_x)
    tiles_y = int(bins.tiles_y)
    bg = jnp.zeros(3, jnp.float32)

    def kernel_only(data, b, mpt=caps["max_per_tile"], ck=chunk):
        return PC.composite_pairs_pallas(
            b.pair_ids, b.starts, b.counts,
            None, None, None, None, None,
            height=cam.height, width=cam.width, tiles_x=tiles_x,
            tiles_y=tiles_y, tile_px=tile_px, bg=bg,
            max_per_tile=mpt, chunk=ck, data=data)

    kv = [(g_legacy(p, b), b) for (p, b) in gv]
    _timeit("kernel-only", jax.jit(kernel_only), kv)
    return kv, kernel_only


def run_grid_ab(kv, kernel_only, caps):
    import jax

    for mpt in (2048, 4096, 8192):
        if mpt > caps["max_per_tile"]:
            continue
        _timeit(f"kernel-only mpt={mpt} (same counts)",
                jax.jit(lambda d, b, m=mpt: kernel_only(d, b, mpt=m)), kv)


def run_chunk_ab(kv, kernel_only):
    import jax

    for ck in (128, 256):
        try:
            _timeit(f"kernel-only chunk={ck}",
                    jax.jit(lambda d, b, c=ck: kernel_only(d, b, ck=c)), kv)
        except Exception as e:
            print(f"[round5_perf] chunk={ck} failed: {type(e).__name__}",
                  flush=True)


def run_e2e(scene, cam, fwd, label):
    dt = _timeit(f"e2e {label}", fwd, _variants(scene, 20))
    print(f"[round5_perf] {label}: {dt * 1e3:.2f} ms/frame "
          f"({1 / dt:.1f} fps)", flush=True)
    return dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="outputs/bench_scene/point_cloud.ply")
    ap.add_argument("--baseline", action="store_true")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--grid-ab", action="store_true")
    ap.add_argument("--chunk-ab", action="store_true")
    ap.add_argument("--cull-ab", action="store_true")
    ap.add_argument("--slim-e2e", action="store_true")
    ap.add_argument("--tile32-1080p", action="store_true",
                    help="1080p at tile_px=32 (more pairs, 4x less "
                    "per-pair pixel work) with and without tight_cull")
    ap.add_argument("--sweep-1080p", action="store_true",
                    help="production-candidate sweep at 1080p: "
                    "tile32+cull+slim at chunk 128/256/512, tile64 "
                    "variant — grid steps = tiles x (mpt/chunk+1), so "
                    "chunk is the dead-step knob at tile32's 2040 tiles")
    ap.add_argument("--skip-512", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny synthetic scene at 64^2 — CPU plumbing check")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[round5_perf] backend={jax.default_backend()}", flush=True)

    if args.smoke:
        from dge_tpu.scene import gaussians as G

        rng = np.random.default_rng(0)
        rot = rng.normal(size=(256, 4)).astype(np.float32)
        rot /= np.linalg.norm(rot, axis=1, keepdims=True)
        scene = G.from_arrays(
            rng.normal(size=(256, 3)).astype(np.float32),
            (rng.normal(size=(256, 1, 3)) * 0.5).astype(np.float32),
            np.zeros((256, 0, 3), np.float32),
            rng.uniform(-1, 2, size=(256, 1)).astype(np.float32),
            rng.uniform(-4, -2.5, size=(256, 3)).astype(np.float32),
            rot, max_sh_degree=0)
        jobs = [(64, 64, 16)]
    else:
        scene = load_scene(args.scene)
        jobs = []
        if not args.skip_512:
            jobs.append((512, 512, 32))
        jobs.append((1080, 1920, 64))

    for h, w, tp in jobs:
        cam = make_cam(h, w)
        caps, fwd = ladder(scene, cam, tile_px=tp)
        label = f"{w}x{h} tile{tp}"
        if args.baseline:
            run_e2e(scene, cam, fwd, f"trained {label}")
        if args.stages or args.grid_ab or args.chunk_ab:
            kv, ko = run_stages(scene, cam, caps, tp, label)
            if args.grid_ab:
                run_grid_ab(kv, ko, caps)
            if args.chunk_ab:
                run_chunk_ab(kv, ko)
        if args.slim_e2e:
            _, fwd_slim = ladder(scene, cam, tile_px=tp, slim_gather=True,
                                 start=caps, max_grow=2)
            run_e2e(scene, cam, fwd_slim, f"trained {label} slim-gather")
        if args.cull_ab:
            tc_caps, fwd_tc = ladder(scene, cam, tile_px=tp,
                                     tight_cull=True)
            run_e2e(scene, cam, fwd_tc, f"trained {label} tight_cull")
    if args.tile32_1080p:
        cam = make_cam(1080, 1920)
        for tc in (False, True):
            for bk in ("pallas_stream",):
                c32, f32v = ladder(scene, cam, tile_px=32, tight_cull=tc,
                                   backend=bk)
                run_e2e(scene, cam, f32v,
                        f"trained 1920x1080 tile32 {bk} tight={tc}")
    if args.sweep_1080p:
        cam = make_cam(1080, 1920)
        for tp, ck in ((32, 128), (32, 256), (32, 512), (64, 256)):
            _, fv = ladder(scene, cam, tile_px=tp, tight_cull=True,
                           chunk=ck, slim_gather=True)
            run_e2e(scene, cam, fv,
                    f"trained 1920x1080 tile{tp} cull slim chunk{ck}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
