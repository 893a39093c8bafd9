import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time, math
import numpy as np, jax, jax.numpy as jnp
from dge_tpu.ops import render as R, projection, binning, pallas_composite
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
    return out

prep_fn = jax.jit(lambda s: projection.preprocess(s.xyz, s.get_scaling, s.get_rotation, s.get_opacity, s.get_features, s.alive, cam, s.active_sh_degree, s.max_sh_degree))
prep = timeit("preprocess", prep_fn, scene)
timeit("argsort", jax.jit(lambda p: jnp.argsort(jnp.where(p.visible, p.depth, jnp.inf))), prep)
for M in (8, 16, 32):
    timeit(f"binning M={M}", jax.jit(lambda p, M=M: binning.bin_gaussians(p.mean2d, p.depth, p.radius, p.visible, height=512, width=512, tile_px=32, max_per_tile=2048, max_tiles_per_gaussian=M)), prep)
bins = jax.jit(lambda p: binning.bin_gaussians(p.mean2d, p.depth, p.radius, p.visible, height=512, width=512, tile_px=32, max_per_tile=2048))(prep)
pc = jax.jit(lambda b, p: pallas_composite.composite_tiles_pallas(b.lists, b.counts, p.mean2d, p.conic, p.rgb, p.depth, p.opacity, order=b.order, height=512, width=512, tiles_x=16, tiles_y=16, tile_px=32, bg=bg, chunk=128))
timeit("gather+kernel", pc, bins, prep)
# gather only
def gather_only(b, p):
    feat = jnp.stack([p.mean2d[:,0], p.mean2d[:,1], p.conic[:,0], p.conic[:,1], p.conic[:,2], p.opacity, p.rgb[:,0], p.rgb[:,1], p.rgb[:,2], p.depth], axis=0)
    feat = jnp.pad(feat, ((0,6),(0,0)))
    return jnp.swapaxes(feat[:, b.order[b.lists]], 0, 1)
timeit("gather_only", jax.jit(gather_only), bins, prep)
for K in (1024, 512):
    bk = jax.jit(lambda p, K=K: binning.bin_gaussians(p.mean2d, p.depth, p.radius, p.visible, height=512, width=512, tile_px=32, max_per_tile=K))(prep)
    pck = jax.jit(lambda b, p, K=K: pallas_composite.composite_tiles_pallas(b.lists, b.counts, p.mean2d, p.conic, p.rgb, p.depth, p.opacity, order=b.order, height=512, width=512, tiles_x=16, tiles_y=16, tile_px=32, bg=bg, chunk=128))
    timeit(f"gather+kernel K={K}", pck, bk, prep)
    print("  spill:", int(bk.spill), flush=True)
