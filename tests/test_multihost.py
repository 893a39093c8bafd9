"""Multi-host (multi-process) execution: jax.distributed over two local
processes, collectives across process boundaries.

SURVEY.md §2.6 names jax.distributed + DCN orchestration as the TPU
equivalent of the reference's (unused) Lightning DDP scaffolding. The real
thing needs multiple hosts; here two CPU processes on one box exercise the
same code path: distributed init, a global mesh spanning both processes,
and a psum that crosses the process boundary (what rides DCN on a pod).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("x",))

def f(v):
    return jax.lax.psum(v, "x")

fn = jax.jit(
    jax.shard_map(f, mesh=mesh, in_specs=P("x"), out_specs=P(), check_vma=False)
)
# each global device contributes its (global) index + 1 -> psum = 1+2+3+4
local = jnp.asarray(
    [jax.process_index() * 2 + 1, jax.process_index() * 2 + 2],
    jnp.float32,
)
from jax.sharding import NamedSharding
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("x")), np.asarray(local), (4,)
)
out = fn(arr)
total = float(np.asarray(out)[0]) if np.asarray(out).ndim else float(out)
assert total == 10.0, total
print(f"proc {pid}: psum across processes = {total} OK", flush=True)
"""


def test_two_process_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()}
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "psum across processes" in out, out
