import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time, math
import numpy as np, jax, jax.numpy as jnp
from dge_tpu.ops import render as R
from dge_tpu.scene import gaussians as G, look_at_camera
from dge_tpu.scene.camera_arrays import CameraArrays
n = 131072
rng = np.random.default_rng(0)
rot = rng.normal(size=(n,4)).astype(np.float32); rot/=np.linalg.norm(rot,axis=1,keepdims=True)
scene = G.from_arrays(rng.normal(size=(n,3)).astype(np.float32),
    (rng.normal(size=(n,1,3))*0.5).astype(np.float32), (rng.normal(size=(n,3,3))*0.1).astype(np.float32),
    rng.uniform(-1,2,size=(n,1)).astype(np.float32), rng.uniform(-5,-3.5,size=(n,3)).astype(np.float32),
    rot, max_sh_degree=1)
cam = CameraArrays.from_camera(look_at_camera(np.array([0,0.3,-4.0]), np.zeros(3), fovx=math.radians(60), height=512, width=512))
bg = jnp.zeros(3)
def timeit(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(iters):
        out = fn(*args); jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)
timeit("render_jnp", jax.jit(lambda s: R.render(s, cam, bg, tile_px=32, max_per_tile=2048, chunk=64).color), scene)
timeit("render_pallas", jax.jit(lambda s: R.render(s, cam, bg, tile_px=32, max_per_tile=2048, backend="pallas").color), scene)
# verify pallas == jnp on TPU
a = jax.jit(lambda s: R.render(s, cam, bg, tile_px=32, max_per_tile=2048, chunk=64).color)(scene)
b = jax.jit(lambda s: R.render(s, cam, bg, tile_px=32, max_per_tile=2048, backend="pallas").color)(scene)
print("tpu pallas-jnp maxdiff:", float(jnp.abs(a-b).max()), flush=True)
