"""Multi-host bootstrap + host-local -> global array plumbing.

The reference launches multi-node training with torch.distributed env vars
(NNODES/NODE_RANK/MASTER_ADDR/MASTER_PORT, `tools/dist_train.sh:5-14`); the
JAX counterpart is `jax.distributed.initialize` (one call per process before
first backend use), after which `jax.devices()` is the GLOBAL device list and
a Mesh over it spans hosts — the same shard_map step then runs collectives
over ICI/DCN with zero further code.

Two pieces live here:
  * `initialize`: env-var-compatible bootstrap (reads the dist_train.sh
    variables when explicit args are absent);
  * `host_local_batch`: per-process batches -> global jax.Arrays for a
    multi-process mesh (each process feeds its local shard, batch-sharded
    leaves concatenate across processes, replicated leaves must agree).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Call jax.distributed.initialize from args or dist_train.sh-style env
    (MASTER_ADDR/MASTER_PORT, NNODES, NODE_RANK). Returns True if a
    multi-process runtime was initialized, False for the single-host case
    (no coordinator configured or world size 1)."""
    if coordinator is None and "MASTER_ADDR" in os.environ:
        coordinator = (f"{os.environ['MASTER_ADDR']}:"
                       f"{os.environ.get('MASTER_PORT', '29500')}")
    if num_processes is None:
        num_processes = int(os.environ.get("NNODES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("NODE_RANK", "0"))
    if num_processes > 1 and coordinator is None:
        raise ValueError(
            f"multi-process world size {num_processes} requested but no "
            "coordinator address: pass --dist-coordinator or set "
            "MASTER_ADDR (otherwise each rank would silently train "
            "independently and clobber the shared work_dir)")
    if coordinator is None or num_processes <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_shard() -> tuple:
    """(rank, count) for the data loader's per-process dataset sharding."""
    import jax

    return jax.process_index(), jax.process_count()


def host_local_batch(batch: Any, mesh, specs: Any) -> Any:
    """Per-process host-local values -> global jax.Arrays on a (possibly
    multi-process) mesh. A leaf passes through only when it is already a
    global array sharded over THIS mesh; anything else — numpy, or a
    jax.Array committed to a single local device (e.g. the freshly-built
    TrainState) — is read back host-side and assembled with its
    NamedSharding via make_array_from_process_local_data (each process
    contributes its local rows of batch-sharded leaves; replicated leaves
    must agree across processes)."""
    import jax
    from jax.sharding import NamedSharding

    def place(leaf, spec):
        if isinstance(leaf, jax.Array) and not isinstance(leaf, np.ndarray):
            sh = leaf.sharding
            if isinstance(sh, NamedSharding) and sh.mesh == mesh:
                return leaf
            leaf = np.asarray(leaf)  # host-local: reassemble globally
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(leaf)
        )

    return jax.tree_util.tree_map(place, batch, specs)
