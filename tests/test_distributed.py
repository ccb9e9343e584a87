"""Multi-host bootstrap smoke test: 2 local CPU processes form a JAX
distributed runtime (`jax.distributed.initialize`), build a global 2-device
mesh (1 device per process), assemble a global batch from per-process local
shards, and run a pmean collective across the process boundary.

This is the `tools/dist_train.sh` NNODES/MASTER_ADDR counterpart
(reference `tools/dist_train.sh:5-14`), exercised at world size 2 on one
machine. Env-var parsing of initialize() is covered in-process.
"""

import os
import socket
import subprocess
import sys

import pytest

from veon_tpu.train.distributed import initialize

WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_initialize_noop_without_config(monkeypatch):
    monkeypatch.delenv("MASTER_ADDR", raising=False)
    assert initialize() is False
    assert initialize(None, 1, 0) is False


def test_two_process_cpu_cluster():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    results = [
        float(line.split()[1])
        for out in outs
        for line in out.splitlines()
        if line.startswith("RESULT ")
    ]
    # pmean of per-shard sums 4 and 8 -> 6, identical on both processes
    assert results == [6.0, 6.0], outs
    # stage 2: 2D (batch x cam) mesh — CAM_AXIS2 leaf assembly + psum/pmean
    # chain agrees with the host oracle on both processes (the multi-host
    # leg of the --cam-shards training layout)
    results2 = [
        float(line.split()[1])
        for out in outs
        for line in out.splitlines()
        if line.startswith("RESULT2 ")
    ]
    assert len(results2) == 2 and results2[0] == results2[1], outs
