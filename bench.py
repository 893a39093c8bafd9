"""Benchmark: rendered frames/s/chip at 512x512 (BASELINE.json north-star
metric, config 1), plus a 1080p render, the config-2 train step, and the
config-4 full-size edit round.

Prints a cumulative JSON summary line {"metric", "value", "unit",
"vs_baseline", "extra"} after EVERY completed section (render -> 1080p ->
train -> edit sub-steps), each superseding the last — so a driver timeout
mid-section still leaves the latest completed results parseable
(BENCH_r03 shipped rc=124/parsed=null because round 3 printed only one
line at the very end; VERDICT r3 next-round item 1). The edit section is
additionally wall-clock budgeted: set BENCH_BUDGET_S (default 900) and the
expensive measured full round is skipped with
extra["edit_measured"]="skipped:budget" when the remaining budget cannot
cover it. Default budget 1500 s (was 900): round 5 added four render
cells, and the edit-section UNet compiles re-pay ~60-100 s every run
(the remote compile service does not fully cache them) — measured warm
runs reach the measured-round gate at ~1020 s, so 1500 covers it with
the two ~28 s round executions. Every section still emits its cumulative
JSON line, so an external timeout never loses completed cells.

``vs_baseline`` compares the 1080p fps (extra.render_fps_1080p) against the
only in-repo reference claim — >= 30 fps novel-view rendering at 1080p
(vendored upstream 3DGS README,
/root/reference/gaussiansplatting/README.md:16, RTX-class GPU); it is null
until the 1080p section completes (never the 512^2 apples-to-oranges
fallback, ADVICE r3). The headline ``value`` stays the 512^2 fps (the DGE
working resolution, configs/dge.yaml:36, tracked since round 1).

1080p render config: tile_px=64 (at 1080p the focal length scales with
width, so the 512^2-tuned 32px tiles see a median 6-tile rect per Gaussian
and 2.1x the pair count; 64px tiles bring the median back to 4 with zero
spill — measured 30.2 ms vs 43.2 ms per frame, tools/bench_1080p.py).

``extra`` carries the secondary metrics:
- train_step_ms: full fwd+bwd+Adam step, 131k Gaussians, 512^2
  (pallas_train custom-VJP path on TPU)
- edit_step_s / edit_round_s_est / edit_enc_s / edit_dec_s: the config-4
  edit round at the REFERENCE workload shape (20 views 512^2, bf16 SD-1.5
  UNet with IP2P 8ch conv_in, camera batch 5, banded epipolar pivot reuse;
  configs/dge.yaml:36,54,75-76) with 20 DDIM steps extrapolated from
  measured steady-state steps. Weights are random — no pretrained
  checkpoint can enter this container — which does not change the compute.
"""

import json
import math
import os
import sys
import time

import numpy as np

T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _remaining():
    return BUDGET_S - (time.perf_counter() - T0)


def _progress(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _sync(x):
    """Force completion via host transfer (block_until_ready is unreliable
    through the axon relay)."""
    return float(np.asarray(x.sum() if hasattr(x, "sum") else x))


def make_bench_scene(n=131072):
    from dge_tpu.scene import gaussians as G

    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    fdc = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.5
    frest = rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.1
    opacity = rng.uniform(-1.0, 2.0, size=(n, 1)).astype(np.float32)
    scaling = rng.uniform(-5.0, -3.5, size=(n, 3)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    return G.from_arrays(xyz, fdc, frest, opacity, scaling, rot,
                         max_sh_degree=1)


def bench_render(scene, cam_arr, bg):
    import jax
    import jax.numpy as jnp

    from dge_tpu.ops import render as R

    backend = (
        "pallas_stream" if jax.default_backend() in ("tpu", "axon") else "jnp"
    )

    @jax.jit
    def forward(scene, cam, bg):
        out = R.render(
            scene, cam, bg, tile_px=32, max_per_tile=2048, chunk=64,
            backend=backend,
        )
        # scalar digest: the final host transfer forces completion of the
        # whole chain
        return out.color.sum()

    import jax.numpy as jnp

    acc0 = jnp.float32(0.0)
    for i in range(5):
        acc0 = acc0 + forward(
            scene.replace(opacity=scene.opacity - 1e-6 * i), cam_arr, bg
        )
    float(acc0)

    iters = 20
    variants = [
        scene.replace(opacity=scene.opacity + 1e-6 * i) for i in range(iters)
    ]
    jax.block_until_ready([s.opacity for s in variants])
    # two timed windows; report the second. The first post-warmup window
    # carries a one-time ~80 ms relay/dispatch cost (measured: the same
    # step reads 48.6 ms in window 1, 38 ms thereafter) that is not
    # per-frame device time.
    for _ in range(2):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for s in variants:
            acc = acc + forward(s, cam_arr, bg)
        float(acc)
        dt = time.perf_counter() - t0
    return iters / dt


def bench_render_1080p(scene, bg):
    """1080p (1920x1080) render — the resolution of the vendored upstream's
    >= 30 fps claim, measured honestly: caps sized for zero spill on this
    scene (tile_px=64, small_slots=4, big_capacity=8192, mtg=96)."""
    import jax
    import jax.numpy as jnp

    from dge_tpu.ops import render as R
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    cam = look_at_camera(
        np.array([0.0, 0.3, -4.0]), np.zeros(3), fovx=math.radians(60),
        height=1080, width=1920,
    )
    cam_arr = CameraArrays.from_camera(cam)
    backend = (
        "pallas_stream" if jax.default_backend() in ("tpu", "axon") else "jnp"
    )

    @jax.jit
    def forward(scene, cam, bg):
        out = R.render(
            scene, cam, bg, tile_px=64, max_per_tile=2048,
            max_tiles_per_gaussian=96, max_pairs=1 << 19, big_capacity=8192,
            small_slots=4, chunk=128, backend=backend,
        )
        return out.color.sum(), out.spill

    acc0 = jnp.float32(0.0)
    spill = None
    for i in range(4):
        s, spill = forward(
            scene.replace(opacity=scene.opacity - 1e-6 * i), cam_arr, bg
        )
        acc0 = acc0 + s
    float(acc0)
    spill = int(spill)

    iters = 20
    variants = [
        scene.replace(opacity=scene.opacity + 1e-6 * i) for i in range(iters)
    ]
    jax.block_until_ready([s.opacity for s in variants])
    # two windows, report the second (see bench_render on the one-time
    # first-window relay cost)
    for _ in range(2):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for s in variants:
            r, _ = forward(s, cam_arr, bg)
            acc = acc + r
        float(acc)
        dt = time.perf_counter() - t0
    return iters / dt, spill


TRAINED_PLY = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "outputs", "bench_scene", "point_cloud.ply",
)


def bench_render_trained(bg, ply=None, height=512, width=512, tile_px=32,
                         start_caps=None, tight_cull=False):
    """Render fps on a real TRAINED scene (committed artifact from
    tools/make_bench_capture.py + launch --fit). The headline scene is
    synthetic near-isotropic; trained scenes are strongly anisotropic and
    bin differently (VERDICT r3 weak #3) — this is the distribution the
    fps claim needs to hold on. The 1080p call is the reference's OWN
    claim context (trained captures, >= 30 fps @1080p,
    gaussiansplatting/README.md:16,68 — VERDICT r4 item 1; operating
    point tile_px=32 + tight_cull + chunk 256, see main()). Caps probed
    to spill 0 before timing."""
    import jax
    import jax.numpy as jnp

    from dge_tpu.ops import render as R
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    scene = G.load_ply(ply or TRAINED_PLY)
    n = int(scene.n_alive)
    cam = look_at_camera(
        np.array([2.3, 0.9, -2.3]), np.array([0.0, -0.45, 0.0]),
        fovx=math.radians(60), height=height, width=width,
    )
    cam_arr = CameraArrays.from_camera(cam)
    backend = (
        "pallas_stream" if jax.default_backend() in ("tpu", "axon") else "jnp"
    )

    caps = dict(start_caps or dict(
        mpt=2048, mtg=32 if tile_px == 32 else 96, slots=4,
        max_pairs=1 << 19, big_capacity=0,
    ))

    def make_fwd(c):
        return jax.jit(lambda s, cm: (
            lambda o: (o.color.sum(), o.spill, o.spill_parts)
        )(R.render(s, cm, bg, tile_px=tile_px, max_per_tile=c["mpt"],
                   max_tiles_per_gaussian=c["mtg"], small_slots=c["slots"],
                   max_pairs=c["max_pairs"], big_capacity=c["big_capacity"],
                   chunk=c.get("chunk", 64), backend=backend,
                   tight_cull=tight_cull)))

    fwd = make_fwd(caps)
    spill = None
    for _ in range(8):
        _, spill, parts = fwd(scene, cam_arr)
        if int(spill) == 0:
            break
        # grow ONLY the overflowing cap class (R.grow_caps key names)
        full = R.grow_caps(
            dict(max_per_tile=caps["mpt"], max_tiles_per_gaussian=caps["mtg"],
                 small_slots=caps["slots"], max_pairs=caps["max_pairs"],
                 big_capacity=caps["big_capacity"]),
            parts,
        )
        new_caps = dict(mpt=full["max_per_tile"],
                        mtg=full["max_tiles_per_gaussian"],
                        slots=full["small_slots"],
                        max_pairs=full["max_pairs"],
                        big_capacity=full["big_capacity"])
        if "chunk" in caps:  # kernel chunk is a config knob, not a cap
            new_caps["chunk"] = caps["chunk"]
        if new_caps == caps:
            _progress(f"trained-scene spill {int(spill)}: caps at "
                      "ceilings — stopping ladder")
            break
        caps = new_caps
        _progress(f"trained-scene spill {int(spill)} (parts "
                  f"{None if parts is None else [int(x) for x in parts]}"
                  f"): caps -> {caps}")
        fwd = make_fwd(caps)
    spill = int(spill)

    iters = 20
    variants = [
        scene.replace(opacity=scene.opacity + 1e-6 * i) for i in range(iters)
    ]
    jax.block_until_ready([s.opacity for s in variants])
    for _ in range(2):  # two windows, report the second (see bench_render)
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for s in variants:
            r, _, _ = fwd(s, cam_arr)
            acc = acc + r
        float(acc)
        dt = time.perf_counter() - t0
    return iters / dt, spill, n


def bench_quality_psnr(bg):
    """Driver-visible quality tripwire (VERDICT r4 item 3): render-only
    eval of the newest committed quality-gate scene against its capture
    views (spill-free adaptive caps), mean PSNR in dB. A densify /
    optimizer / kernel regression that slips past the fps cells shows up
    here without re-running the fit. Oracle analog:
    gaussiansplatting/metrics.py:36-93."""
    import glob as _glob

    import jax
    import jax.numpy as jnp

    from dge_tpu.ops import losses as L
    from dge_tpu.ops import render as R
    from dge_tpu.scene import dataset as DS
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene.camera_arrays import CameraArrays

    plys = _glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "outputs",
        "quality_gate", "*", "fitdemo", "*", "point_cloud.ply"))
    if not plys:
        raise FileNotFoundError("no committed quality-gate scene")
    ply = max(plys, key=os.path.getmtime)
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "outputs", "fit_capture")
    scene = G.load_ply(ply)
    cs = DS.ColmapScene(src, height=256, width=256)
    renderer = R.SpillFreeRenderer(scene, bg, tile_px=32, log=_progress)
    renderer.probe(CameraArrays.from_camera(cs.cameras[0]))
    import imageio.v2 as imageio

    vals = []
    for cam in cs.cameras:
        color, sp = renderer(CameraArrays.from_camera(cam))
        if sp:
            raise RuntimeError(f"quality eval spill {sp} after ladder")
        gt = np.asarray(
            imageio.imread(
                os.path.join(src, "images", cam.image_name + ".png"))
        ).astype(np.float32) / 255.0
        vals.append(float(L.psnr(color, jnp.asarray(gt))))
    return float(np.mean(vals)), os.path.relpath(
        ply, os.path.dirname(os.path.abspath(__file__)))


def bench_train_step(scene, cam_arr, bg):
    """Config-2: full fwd+bwd+Adam step at 131k Gaussians, 512^2."""
    import jax
    import jax.numpy as jnp

    from dge_tpu.systems import fit as F
    from dge_tpu.systems import optim as O

    optimizer = O.make_optimizer(O.OptimConfig.scaled(1500))
    opt_state = optimizer.init(scene.params())
    fit_state = F.FitState.create(scene.capacity)
    step = F.make_train_step(
        optimizer, lambda_dssim=0.0, tile_px=32, max_per_tile=2048, chunk=64
    )
    target = jnp.asarray(
        np.random.default_rng(1).uniform(size=(512, 512, 3)).astype(np.float32)
    )
    s, o, f = scene, opt_state, fit_state
    for _ in range(3):  # compile + warm
        s, o, f, aux = step(s, o, f, cam_arr, target, bg)
    _sync(aux["loss"])
    # two windows, report the second: the first post-warmup window carries
    # a one-time ~80 ms relay/dispatch cost (measured 48.6 vs 38.1 ms/step
    # for the identical chained step), and the single end-of-window sync
    # (~30 ms relay RTT) amortizes over iters — 30 iters keeps that < 1 ms.
    iters = 30
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            s, o, f, aux = step(s, o, f, cam_arr, target, bg)
        _sync(s.xyz)
        dt = time.perf_counter() - t0
    return dt / iters * 1e3  # ms


def bench_edit_round(emit_partial=None):
    """Config-4 workload shape: 20 views 512^2, bf16 full-size IP2P UNet,
    camera batch 5, one pivot + 4 reuse passes per DDIM step, banded
    epipolar. Measures VAE encode, steady-state eps-prediction step, VAE
    decode; the 20-step round wall-clock is extrapolated (20 * step +
    enc + dec). ``emit_partial(dict)`` is called with the cumulative edit
    metrics after each sub-measurement so a timeout mid-section still
    leaves the completed numbers parsed. The measured full round (the most
    expensive sub-step: ~4 min compile cold + 2 x ~25 s runs) is skipped
    when the remaining BENCH_BUDGET_S cannot cover it."""
    if emit_partial is None:
        emit_partial = lambda d: None
    import jax
    import jax.numpy as jnp

    from dge_tpu.diffusion import ddim
    from dge_tpu.diffusion import ip2p as P
    from dge_tpu.parallel.mesh import stack_cameras
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays
    from dge_tpu.systems.guidance import DGEGuidance, GuidanceConfig

    b, h, w = 20, 512, 512
    models = P.build_models(dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    g = DGEGuidance(
        GuidanceConfig(camera_batch_size=5, epipolar_mode="banded"), models
    )

    cams = []
    for i in range(b):
        ang = 2 * math.pi * i / b
        eye = np.array([3.5 * math.sin(ang), 0.3, -3.5 * math.cos(ang)])
        cams.append(
            CameraArrays.from_camera(
                look_at_camera(eye, np.zeros(3), fovx=math.radians(60),
                               height=h, width=w)
            )
        )
    cam_batch = stack_cameras(cams)

    r = np.random.default_rng(2)
    rgb = jnp.asarray(r.uniform(size=(b, h, w, 3)).astype(np.float32))
    cond = jnp.asarray(r.uniform(size=(b, h, w, 3)).astype(np.float32))
    emb = jnp.asarray(r.normal(size=(b, 77, 768)).astype(np.float32) * 0.02)

    rng = jax.random.PRNGKey(3)
    rng, r_enc = jax.random.split(rng)

    _progress("edit: compiling VAE encode...")
    t0 = time.perf_counter()
    latents = P.encode_images(models, rgb, r_enc, chunk=5)
    _sync(latents.astype(jnp.float32))
    # the cond (mode, no posterior sample) encode is a separate jitted
    # program — warm it too so the timed region is steady-state
    _sync(P.encode_cond_images(models, cond, chunk=5).astype(jnp.float32))
    enc_compile = time.perf_counter() - t0
    _progress(f"edit: VAE encode compile {enc_compile:.0f}s")
    t0 = time.perf_counter()
    latents = P.encode_images(models, rgb, r_enc, chunk=5)
    cond_lat = P.encode_cond_images(models, cond, chunk=5)
    _sync(latents.astype(jnp.float32))
    _sync(cond_lat.astype(jnp.float32))
    t_enc = time.perf_counter() - t0
    emit_partial({"edit_enc_s": round(t_enc, 3)})

    cond_img, _, cond_zero = jnp.split(cond_lat, 3, axis=0)
    neg = emb

    def triple_for(idx):
        te = jnp.concatenate([emb[idx], neg[idx], neg[idx]], 0)
        cl = jnp.concatenate([cond_img[idx], cond_img[idx], cond_zero[idx]], 0)
        return te, cl

    t_step_t = 541  # mid-schedule, > normal_attn_below_t -> pivot path
    lat_h, lat_w = latents.shape[1], latents.shape[2]
    noisy = ddim.add_noise(
        models.schedule, latents,
        jax.random.normal(rng, latents.shape, latents.dtype),
        jnp.full((b,), t_step_t),
    )

    # compile + warm (pivot fn + 1-key and 2-key batch fns)
    _progress("edit: compiling UNet pivot + reuse passes...")
    t0 = time.perf_counter()
    eps = g._predict_eps_multiview(
        noisy, t_step_t, cam_batch, triple_for, b, 5, 4, lat_h, lat_w,
        jax.random.PRNGKey(4),
    )
    _sync(eps.astype(jnp.float32))
    step_compile = time.perf_counter() - t0
    _progress(f"edit: step compile+first run {step_compile:.0f}s")

    iters = 2
    t0 = time.perf_counter()
    for i in range(iters):
        eps = g._predict_eps_multiview(
            noisy, t_step_t, cam_batch, triple_for, b, 5, 4, lat_h, lat_w,
            jax.random.PRNGKey(5 + i),
        )
        _sync(eps.astype(jnp.float32))
    t_step = (time.perf_counter() - t0) / iters
    emit_partial({"edit_step_s": round(t_step, 3),
                  "edit_iters_per_s": round(1.0 / t_step, 4)})

    _progress("edit: compiling VAE decode...")
    t0 = time.perf_counter()
    imgs = P.decode_latents(models, latents, chunk=5)
    _sync(imgs.astype(jnp.float32))
    dec_compile = time.perf_counter() - t0
    _progress(f"edit: VAE decode compile {dec_compile:.0f}s")
    t0 = time.perf_counter()
    imgs = P.decode_latents(models, latents, chunk=5)
    _sync(imgs.astype(jnp.float32))
    t_dec = time.perf_counter() - t0

    out = {
        "edit_enc_s": round(t_enc, 3),
        "edit_step_s": round(t_step, 3),
        "edit_dec_s": round(t_dec, 3),
        "edit_round_s_est": round(20 * t_step + t_enc + t_dec, 2),
        "edit_iters_per_s": round(1.0 / t_step, 4),
        "edit_compile_s": round(enc_compile + step_compile + dec_compile, 1),
        "edit_shape": "20v x 512^2, bf16 SD1.5-UNet(8ch), cbs=5, banded",
    }
    emit_partial(dict(out))

    # ONE REAL ROUND, measured end to end (VERDICT r2 item 4): the full
    # DGEGuidance.__call__ — VAE enc, all 20 DDIM steps from t_start=979
    # including the t<100 plain-attention tail, scheduler, VAE dec. First
    # call compiles the remaining plain-attention program; the second is
    # the steady-state number an edit round actually costs. Budget gate:
    # two rounds at ~est seconds each plus possible cold compile — require
    # headroom or skip and keep the extrapolated estimate (VERDICT r3
    # item 1: a scoreboard that dies on a cold cache is not a scoreboard).
    need = max(180.0, 3.0 * out["edit_round_s_est"])
    if _remaining() < need:
        _progress(
            f"edit: SKIPPING measured round (remaining budget "
            f"{_remaining():.0f}s < {need:.0f}s needed)"
        )
        out["edit_measured"] = "skipped:budget"
        return out
    _progress("edit: full measured round (compiles plain-attn path "
              "on first run)...")
    t0 = time.perf_counter()
    res = g(rgb, cond, emb, emb, cam_batch, jax.random.PRNGKey(9))
    _sync(res.astype(jnp.float32))
    round_first = time.perf_counter() - t0
    _progress(f"edit: round first run {round_first:.0f}s")
    # the first run doubles as a (compile-inflated) upper bound — record it
    # so even a budget-skip of the second run leaves a measured number
    out["edit_round_s_first"] = round(round_first, 2)
    emit_partial(dict(out))
    if _remaining() < 1.5 * out["edit_round_s_est"]:
        _progress("edit: SKIPPING steady-state round (budget)")
        out["edit_measured"] = "first_run_only:budget"
        return out
    t0 = time.perf_counter()
    res = g(rgb, cond, emb, emb, cam_batch, jax.random.PRNGKey(10))
    _sync(res.astype(jnp.float32))
    t_round = time.perf_counter() - t0
    _progress(f"edit: edit_round_s_measured = {t_round:.1f}")
    out["edit_round_s_measured"] = round(t_round, 2)
    return out


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache amortizes the big UNet compiles across rounds
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays

    scene = make_bench_scene()
    cam = look_at_camera(
        np.array([0.0, 0.3, -4.0]), np.zeros(3), fovx=math.radians(60),
        height=512, width=512,
    )
    cam_arr = CameraArrays.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)

    extra = {
        "weights": "random (no pretrained ckpt available in container)",
    }

    def emit(fps_512):
        """Cumulative summary line; each call supersedes the previous one
        (the driver keeps the last JSON line it can parse). vs_baseline is
        null until an honest 1080p number exists — never the 512^2
        fallback (ADVICE r3). Once the TRAINED-scene 1080p cell is
        measured it wins over the synthetic one: the vendored >= 30 fps
        claim is about trained captures (VERDICT r4 item 1)."""
        fps_1080 = extra.get("render_fps_trained_1080p",
                             extra.get("render_fps_1080p"))
        print(
            json.dumps(
                {
                    "metric": "render_fps_512_chip",
                    "value": round(fps_512, 3),
                    "unit": "frames/s/chip",
                    # honest baseline: 1080p vs the upstream's 1080p claim
                    "vs_baseline": (
                        round(fps_1080 / 30.0, 4)
                        if fps_1080 is not None else None
                    ),
                    "extra": extra,
                }
            ),
            flush=True,
        )

    _progress("render fps...")
    fps = bench_render(scene, cam_arr, bg)
    _progress(f"render fps = {fps:.1f}")
    emit(fps)

    try:
        _progress("render 1080p...")
        fps_1080, spill_1080 = bench_render_1080p(scene, bg)
        extra["render_fps_1080p"] = round(fps_1080, 2)
        extra["render_1080p_spill"] = spill_1080
        _progress(f"render_fps_1080p = {fps_1080:.1f} (spill {spill_1080})")
    except Exception as e:  # pragma: no cover - diagnostic path
        extra["render_1080p_error"] = f"{type(e).__name__}: {e}"[:200]
        _progress(f"render 1080p FAILED: {extra['render_1080p_error']}")
    emit(fps)
    if os.path.exists(TRAINED_PLY):
        try:
            _progress("render trained scene...")
            fps_t, spill_t, n_t = bench_render_trained(bg)
            extra["render_fps_trained"] = round(fps_t, 2)
            extra["render_trained_spill"] = spill_t
            extra["render_trained_n"] = n_t
            _progress(f"render_fps_trained = {fps_t:.1f} "
                      f"({n_t} gaussians, spill {spill_t})")
        except Exception as e:  # pragma: no cover - diagnostic path
            extra["render_trained_error"] = f"{type(e).__name__}: {e}"[:200]
            _progress(f"trained render FAILED: {extra['render_trained_error']}")
        emit(fps)
        try:
            _progress("render trained scene at 1080p (the reference's own "
                      "claim context)...")
            # tile32 + tight culling + chunk 256 is the measured 1080p
            # operating point on trained scenes (round-5 sweep: 35.5 ms vs
            # 36.4 chunk128 vs 36.8 tile64+cull vs 47.3 tile64 vs 62.2
            # tile32 bare — culling kills the rect inflation that made
            # tile32 lose, keeps the 4x-smaller per-pair pixel work, and
            # chunk 256 halves the dead grid steps over 2040 tiles). Start
            # caps = the ladder-converged set for the committed artifact.
            # max_pairs 3*2^18: the culled stream is ~552k real pairs and
            # the gather cost is proportional to the CAP, not the content
            # — 768k keeps 40% headroom where the 2^20 power-of-two rung
            # paid ~2x the gather (caps need not be powers of two)
            fps_t1, spill_t1, _ = bench_render_trained(
                bg, height=1080, width=1920, tile_px=32, tight_cull=True,
                start_caps=dict(mpt=2048, mtg=64, slots=16,
                                max_pairs=3 << 18, big_capacity=16384,
                                chunk=256),
            )
            extra["render_fps_trained_1080p"] = round(fps_t1, 2)
            extra["render_trained_1080p_spill"] = spill_t1
            _progress(f"render_fps_trained_1080p = {fps_t1:.1f} "
                      f"(spill {spill_t1})")
        except Exception as e:  # pragma: no cover - diagnostic path
            extra["render_trained_1080p_error"] = \
                f"{type(e).__name__}: {e}"[:200]
            _progress("trained 1080p render FAILED: "
                      f"{extra['render_trained_1080p_error']}")
        emit(fps)
    hi_ply = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "outputs", "bench_scene_hi", "point_cloud.ply")
    if os.path.exists(hi_ply):
        try:
            _progress("render hi-aniso trained scene (needle/wire regime)...")
            # tight culling wins 2.3x in this regime (26.9 vs 61.0 ms
            # measured round 5 on this artifact, p90 aspect 147) — exact
            # under the kernels' alpha >= 1/255 skip
            fps_h, spill_h, n_h = bench_render_trained(
                bg, ply=hi_ply, tight_cull=True)
            extra["render_fps_trained_hi_aniso"] = round(fps_h, 2)
            extra["render_hi_aniso_spill"] = spill_h
            extra["render_hi_aniso_n"] = n_h
            _progress(f"render_fps_trained_hi_aniso = {fps_h:.1f} "
                      f"({n_h} gaussians, spill {spill_h})")
        except Exception as e:  # pragma: no cover - diagnostic path
            extra["render_hi_aniso_error"] = f"{type(e).__name__}: {e}"[:200]
            _progress("hi-aniso render FAILED: "
                      f"{extra['render_hi_aniso_error']}")
        emit(fps)
    try:
        _progress("quality PSNR (render-only eval of the committed "
                  "quality-gate scene)...")
        q_psnr, q_ply = bench_quality_psnr(bg)
        extra["quality_psnr_db"] = round(q_psnr, 2)
        extra["quality_scene"] = q_ply
        _progress(f"quality_psnr_db = {q_psnr:.2f} ({q_ply})")
    except Exception as e:  # pragma: no cover - diagnostic path
        extra["quality_psnr_error"] = f"{type(e).__name__}: {e}"[:200]
        _progress(f"quality PSNR FAILED: {extra['quality_psnr_error']}")
    emit(fps)
    try:
        _progress("train step...")
        extra["train_step_ms"] = round(bench_train_step(scene, cam_arr, bg), 2)
        _progress(f"train_step_ms = {extra['train_step_ms']}")
    except Exception as e:  # pragma: no cover - diagnostic path
        extra["train_step_error"] = f"{type(e).__name__}: {e}"[:200]
        _progress(f"train step FAILED: {extra['train_step_error']}")
    emit(fps)

    def emit_partial(d):
        extra.update(d)
        emit(fps)

    if _remaining() < 150:
        extra["edit_measured"] = "skipped:budget"
        _progress(
            f"edit round SKIPPED entirely (remaining budget "
            f"{_remaining():.0f}s < 150s)"
        )
    else:
        try:
            _progress("edit round (full-size bf16 UNet; compiles take "
                      "minutes on first run)...")
            extra.update(bench_edit_round(emit_partial))
            _progress(f"edit_step_s = {extra.get('edit_step_s')}")
        except Exception as e:  # pragma: no cover - diagnostic path
            extra["edit_error"] = f"{type(e).__name__}: {e}"[:200]
            _progress(f"edit round FAILED: {extra['edit_error']}")
    extra["bench_wall_s"] = round(time.perf_counter() - T0, 1)
    emit(fps)


if __name__ == "__main__":
    main()
