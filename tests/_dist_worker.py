"""Worker for test_distributed: one process of a 2-process CPU 'cluster'.

Run: python _dist_worker.py <process_id> <coordinator_port>
Prints RESULT <value> on success; the value must agree across processes
(it is a cross-process pmean, proving collectives ran over the runtime).
"""

import sys

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
    assert len(devices) == 2, devices  # 1 CPU device per process, global view
    mesh = Mesh(np.asarray(devices), ("batch",))

    def step(x, w):
        y = x @ w
        return jax.lax.pmean(jnp.sum(y), "batch")

    sm = jax.jit(shard_map(step, mesh=mesh, in_specs=(P("batch"), P()),
                           out_specs=P(), check_rep=False))
    # global batch 2: this process contributes one row of (pid+1)s
    x_local = np.full((1, 4), pid + 1.0, np.float32)
    w = np.eye(4, dtype=np.float32)
    xg = host_local_batch(x_local, mesh, P("batch"))
    assert xg.shape == (2, 4)  # global shape spans both processes
    wg = host_local_batch(w, mesh, P())
    out = sm(xg, wg)
    # row sums 4 and 8 -> pmean 6 on every process
    print("RESULT", float(jax.device_get(out)), flush=True)


if __name__ == "__main__":
    main()
