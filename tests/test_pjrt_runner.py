"""Native PJRT host runner: build + plugin load/probe + MLIR export format.

Full execute needs an attachable PJRT device (a real TPU host for
libtpu.so, or a CPU C-API plugin); this box's chip sits behind a tunnel, so
the test drives everything up to client creation and accepts the runner's
documented rc=3 'plugin loaded, no local device' outcome. On a TPU host the
same binary compiles and runs the exported module end to end.
"""

import glob
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

SRC = os.path.join(os.path.dirname(__file__), "..", "veon_tpu", "native",
                   "pjrt_runner.cpp")
TF_INC = glob.glob("/opt/venv/lib/python*/site-packages/tensorflow/include")
LIBTPU = glob.glob("/opt/venv/lib/python*/site-packages/libtpu/libtpu.so")


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    if not TF_INC:
        pytest.skip("no PJRT C API headers (tensorflow include dir) on box")
    exe = str(tmp_path_factory.mktemp("pjrt") / "veon_pjrt_runner")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{TF_INC[0]}/tensorflow/compiler",
         "-o", exe, os.path.abspath(SRC), "-ldl"],
        check=True, capture_output=True, timeout=300)
    return exe


def test_runner_builds_and_probes_plugin(runner):
    if not LIBTPU:
        pytest.skip("no libtpu.so on box")
    r = subprocess.run([runner, LIBTPU[0], "/dev/null", "--probe"],
                       capture_output=True, text=True, timeout=120)
    # 0 = attached and probed; 3 = plugin loaded + api negotiated, but no
    # locally-attachable device (this box: chip is behind the axon tunnel)
    assert r.returncode in (0, 3), (r.stdout, r.stderr)
    assert "pjrt api" in r.stdout


def test_runner_usage_error(runner):
    r = subprocess.run([runner], capture_output=True, text=True, timeout=30)
    assert r.returncode == 2
    assert "usage:" in r.stderr


def test_mlir_export_is_stablehlo(tmp_path):
    """The --mlir-out artifact the runner consumes is a real StableHLO
    module of the traced function."""
    from veon_tpu.utils.export import export_mlir

    def f(x, w):
        return jnp.tanh(x @ w)

    x = np.zeros((2, 3), np.float32)
    w = np.zeros((3, 4), np.float32)
    p = export_mlir(f, (x, w), str(tmp_path / "m.mlir"))
    text = open(p).read()
    assert "module" in text and "stablehlo." in text
    assert "tensor<2x3xf32>" in text and "tensor<3x4xf32>" in text
