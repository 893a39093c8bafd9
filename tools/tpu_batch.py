"""Chain several TPU jobs in ONE python process (single chip claim).

Round-4 environment finding (see CLAUDE.md "Environment quirks"): the
remote axon claim can take 5-8 minutes to release after a holder process
exits, and a process started before the release HANGS FOREVER on a futex
instead of erroring — three hits in one session even with the documented
90 s gaps. Per-job processes are therefore no longer safe to chain; this
driver runs the round's standing TPU jobs sequentially in-process so the
chip is claimed exactly once per batch.

Jobs (executed in this fixed order, each opt-in via a flag):
  --fit-bench      fit the anisotropic bench capture (default
                   /tmp/bench_capture, from tools/make_bench_capture.py)
                   and install the result at outputs/bench_scene/
                   point_cloud.ply — the artifact bench.py's
                   render_fps_trained section loads (VERDICT r3 item 5)
  --quality-quick  the per-round quality-gate tripwire
                   (tools/quality_gate.py --quick --inproc; VERDICT r3
                   item 6)
  --smoke          tools/tpu_smoke.py real-Mosaic kernel correctness
                   (VERDICT r3 weak 5)

Exit code is nonzero if ANY job fails; every job runs regardless so one
failure does not cost the batch (each extra claim cycle risks a hang).

Usage: python tools/tpu_batch.py --fit-bench --quality-quick --smoke
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def job_fit_bench(capture_dir: str, dst_name: str = "bench_scene") -> int:
    import launch

    out_root = os.path.join(REPO, "outputs", dst_name + "_fit")
    cfg = os.path.join(capture_dir, "cfg.yaml")
    if not os.path.exists(cfg):
        print(f"[tpu_batch] no capture at {capture_dir} — run "
              "tools/make_bench_capture.py first", file=sys.stderr)
        return 1
    t0 = time.time()
    launch.main(["--fit", "--source", capture_dir, "--config", cfg,
                 "--out", out_root])
    plys = glob.glob(os.path.join(out_root, "*", "*", "point_cloud.ply"))
    if not plys:
        print("[tpu_batch] fit produced no point_cloud.ply", file=sys.stderr)
        return 1
    ply = max(plys, key=os.path.getmtime)
    dst_dir = os.path.join(REPO, "outputs", dst_name)
    os.makedirs(dst_dir, exist_ok=True)
    shutil.copy(ply, os.path.join(dst_dir, "point_cloud.ply"))
    print(f"[tpu_batch] fit-bench done in {time.time() - t0:.0f}s -> "
          f"{dst_dir}/point_cloud.ply (from {ply})", flush=True)
    return 0


def job_make_capture(style: str, out_dir: str) -> int:
    from tools import make_bench_capture

    make_bench_capture.main(["--style", style, "--out", out_dir])
    return 0


def job_round5(argline: str) -> int:
    import shlex

    from tools import round5_perf

    return round5_perf.main(shlex.split(argline))


def job_profile_edit() -> int:
    from tools import profile_edit

    return profile_edit.main([])


def job_quality_quick() -> int:
    from tools import quality_gate

    return quality_gate.main(["--quick", "--inproc"])


def job_local_gate() -> int:
    """Local-editing gate only, reusing the newest quality-gate fit."""
    from tools import quality_gate

    plys = glob.glob(os.path.join(
        REPO, "outputs", "quality_gate", "*", "fitdemo", "*",
        "point_cloud.ply"))
    if not plys:
        print("[tpu_batch] no quality-gate fit to reuse", file=sys.stderr)
        return 1
    ply = max(plys, key=os.path.getmtime)
    return quality_gate.main(["--inproc", "--local", "--ply", ply])


def job_bench() -> int:
    """Full bench.py in-process (same JSON lines the driver parses)."""
    import runpy

    runpy.run_path(os.path.join(REPO, "bench.py"), run_name="__main__")
    return 0


def job_quality_full_local() -> int:
    """Full 40 dB gate (required whenever a round touches ops/ or
    systems/{fit,densify,optim} — CLAUDE.md rule round 4 skirted) plus
    the local-editing gate chained on the fitted scene."""
    from tools import quality_gate

    return quality_gate.main(["--inproc", "--local"])


def job_smoke() -> int:
    from tools import tpu_smoke

    return tpu_smoke.main()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fit-bench", action="store_true")
    ap.add_argument("--capture", default="/tmp/bench_capture",
                    help="capture dir for --fit-bench")
    ap.add_argument("--make-capture-hi", action="store_true",
                    help="build the hi-aniso capture at --capture-hi")
    ap.add_argument("--fit-bench-hi", action="store_true",
                    help="fit the hi-aniso capture -> outputs/bench_scene_hi")
    ap.add_argument("--capture-hi", default="/tmp/bench_capture_hi")
    ap.add_argument("--round5", action="append", default=[],
                    metavar="ARGS",
                    help="run tools/round5_perf.py with ARGS (repeatable)")
    ap.add_argument("--profile-edit", action="store_true",
                    help="edit-round roofline table (tools/profile_edit.py)")
    ap.add_argument("--quality-quick", action="store_true")
    ap.add_argument("--quality-full-local", action="store_true",
                    help="full 40 dB gate + local-editing gate")
    ap.add_argument("--local-gate", action="store_true",
                    help="local-editing gate on the newest fitted scene")
    ap.add_argument("--bench", action="store_true",
                    help="run the full bench.py in-process")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args(argv)

    jobs = []
    if args.make_capture_hi:
        jobs.append(("make-capture-hi",
                     lambda: job_make_capture("hi_aniso", args.capture_hi)))
    if args.fit_bench:
        jobs.append(("fit-bench", lambda: job_fit_bench(args.capture)))
    if args.fit_bench_hi:
        jobs.append(("fit-bench-hi",
                     lambda: job_fit_bench(args.capture_hi,
                                           "bench_scene_hi")))
    for i, argline in enumerate(args.round5):
        jobs.append((f"round5[{i}] {argline}",
                     lambda a=argline: job_round5(a)))
    if args.profile_edit:
        jobs.append(("profile-edit", job_profile_edit))
    if args.quality_quick:
        jobs.append(("quality-quick", job_quality_quick))
    if args.quality_full_local:
        jobs.append(("quality-full-local", job_quality_full_local))
    if args.local_gate:
        jobs.append(("local-gate", job_local_gate))
    if args.bench:
        jobs.append(("bench", job_bench))
    if args.smoke:
        jobs.append(("smoke", job_smoke))
    if not jobs:
        ap.error("no jobs selected")

    failures = []
    for name, fn in jobs:
        print(f"[tpu_batch] === {name} ===", flush=True)
        t0 = time.time()
        try:
            rc = fn()
        except SystemExit as e:
            rc = 1 if e.code is None else (
                e.code if isinstance(e.code, int) else 1)
            print(f"[tpu_batch] {name} exited: {e}", file=sys.stderr)
        except Exception as e:  # keep the batch going — claims are precious
            rc = 1
            import traceback

            traceback.print_exc()
            print(f"[tpu_batch] {name} raised: {e}", file=sys.stderr)
        print(f"[tpu_batch] === {name}: "
              f"{'OK' if rc == 0 else f'FAIL rc={rc}'} "
              f"[{time.time() - t0:.0f}s] ===", flush=True)
        if rc != 0:
            failures.append(name)
    if failures:
        print(f"[tpu_batch] FAILED jobs: {failures}", file=sys.stderr)
        return 1
    print("[tpu_batch] all jobs OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
