"""Worker for test_distributed: one process of a 2-process CPU 'cluster'.

Run: python _dist_worker.py <process_id> <coordinator_port>
Prints RESULT <value> (1D batch mesh pmean) and RESULT2 <value> (2D
batch x cam mesh, camera-style CAM_AXIS2 leaf assembly) on success; the
values must agree across processes (cross-process collectives over the
runtime prove the bootstrap).
"""

import os
import sys

# 2 virtual CPU devices per process: stage 2 builds a (2, 2) batch x cam
# mesh across the 2-process cluster (each process owns one full mesh row,
# i.e. one batch shard with BOTH cam shards — the layout the train CLI's
# --cam-shards path produces with process-major device order)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

# before any backend use: CPU platform (the axon TPU is single-tenant) and
# gloo cross-process collectives
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from veon_tpu.train.distributed import host_local_batch, initialize, process_shard


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    assert initialize(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2
    assert process_shard() == (pid, 2)
    devices = jax.devices()
    assert len(devices) == 4, devices  # 2 per process, global view
    mesh = Mesh(np.asarray(devices), ("batch",))

    def step(x, w):
        y = x @ w
        return jax.lax.pmean(jnp.sum(y), "batch")

    sm = jax.jit(shard_map(step, mesh=mesh, in_specs=(P("batch"), P()),
                           out_specs=P(), check_rep=False))
    # global batch 4: this process contributes two rows of (pid+1)s
    x_local = np.full((2, 4), pid + 1.0, np.float32)
    w = np.eye(4, dtype=np.float32)
    xg = host_local_batch(x_local, mesh, P("batch"))
    assert xg.shape == (4, 4)  # global shape spans both processes
    wg = host_local_batch(w, mesh, P())
    out = sm(xg, wg)
    # row sums 4,4 and 8,8 -> pmean 6 on every process
    print("RESULT", float(jax.device_get(out)), flush=True)

    # ---- stage 2: 2D (batch x cam) mesh — the --cam-shards layout -------
    # validates host_local_batch on a CAM_AXIS2-style leaf: global
    # (B=2, F=1, N=4, k) sharded P("batch", None, "cam"); each process
    # holds its batch row with the FULL camera axis (the loader's view)
    mesh2 = Mesh(np.asarray(devices).reshape(2, 2), ("batch", "cam"))
    B, F, N, k = 2, 1, 4, 3
    # value encodes (batch row, camera) so wrong placement changes sums
    local = (np.arange(N, dtype=np.float32).reshape(1, 1, N, 1)
             + 10.0 * (pid + 1)) * np.ones((1, F, 1, k), np.float32)
    spec = P("batch", None, "cam")
    xg2 = host_local_batch(local, mesh2, spec)
    assert xg2.shape == (B, F, N, k)

    def step2(x):
        # per-shard sum -> psum over cam (the lift-grid collective) ->
        # pmean over batch (the DP gradient combine)
        s = jnp.sum(x)
        s = jax.lax.psum(s, "cam")
        return jax.lax.pmean(s, "batch")

    sm2 = jax.jit(shard_map(step2, mesh=mesh2, in_specs=(spec,),
                            out_specs=P(), check_rep=False))
    out2 = float(jax.device_get(sm2(xg2)))
    # oracle: mean over the two batch rows of the full-camera row sum
    want = float(np.mean([np.sum(np.arange(N) + 10.0 * (p + 1)) * k
                          for p in range(2)]))
    assert abs(out2 - want) < 1e-4, (out2, want)
    print("RESULT2", out2, flush=True)


if __name__ == "__main__":
    main()
