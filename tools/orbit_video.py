"""Render a turntable orbit video of a 3DGS PLY.

The interactive-viewer replacement for this framework (the reference vendors
the SIBR OpenGL viewer + a viser web viewer, both anti-goals per SURVEY.md):
offline orbit renders at interactive frame rates via the Pallas backend.

Usage:
  python tools/orbit_video.py scene.ply out.mp4 --frames 120 --dist 4.0
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ply")
    p.add_argument("out", help="output .mp4/.gif")
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--dist", type=float, default=None,
                   help="orbit radius (default: 2.5x scene std)")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--elevation", type=float, default=15.0, help="degrees")
    p.add_argument("--fps", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dge_tpu.ops import render as R
    from dge_tpu.scene import gaussians as G
    from dge_tpu.scene import look_at_camera
    from dge_tpu.scene.camera_arrays import CameraArrays
    from dge_tpu.utils import saving

    scene = G.load_ply(args.ply)
    n = int(scene.n_alive)
    xyz = np.asarray(scene.xyz)[:n]
    center = xyz.mean(axis=0)
    dist = args.dist or float(2.5 * xyz.std())
    el = math.radians(args.elevation)

    backend = "pallas_stream" if jax.default_backend() in ("tpu", "axon") else "jnp"
    bg = jnp.zeros(3)
    # eval path: probe-and-grow caps so trained scenes don't render
    # truncated (ops/render.SpillFreeRenderer)
    renderer = R.SpillFreeRenderer(
        scene, bg, tile_px=32, backend=backend,
        log=lambda m: print(f"[orbit] {m}", flush=True),
    )

    frames = []
    for i in range(args.frames):
        ang = 2 * math.pi * i / args.frames
        eye = center + dist * np.array(
            [math.sin(ang) * math.cos(el), math.sin(el),
             -math.cos(ang) * math.cos(el)]
        )
        cam = look_at_camera(
            eye, center, fovx=math.radians(60),
            height=args.height, width=args.width,
        )
        color, _ = renderer(CameraArrays.from_camera(cam))
        frames.append(np.asarray(color))
        if i % 20 == 0:
            print(f"frame {i}/{args.frames}", flush=True)
    out = saving.save_video(args.out, frames, fps=args.fps)
    print("wrote", out)


if __name__ == "__main__":
    main()
