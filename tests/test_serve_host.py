"""Native C++ serving daemon (native/serve_host.cpp): build both flavors,
drive the transport loop end-to-end with the python TensorClient (echo
mode — no PJRT device needed), and probe the PJRT mode's init path.

Full PJRT serving needs an attachable device (real TPU host); this box's
chip sits behind a tunnel, so PJRT mode is exercised to the documented
rc=3 'plugin loaded, no attachable device' outcome — the same contract as
native/pjrt_runner.cpp. On a TPU host the same binary compiles the
exported StableHLO and serves it with zero python in the loop.
"""

import glob
import os
import subprocess
import time

import numpy as np
import pytest

SRC = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                   "veon_tpu", "native", "serve_host.cpp"))
TF_INC = glob.glob("/opt/venv/lib/python*/site-packages/tensorflow/include")
LIBTPU = glob.glob("/opt/venv/lib/python*/site-packages/libtpu/libtpu.so")


@pytest.fixture(scope="module")
def echo_host(tmp_path_factory):
    """Dependency-free build (-DVEON_NO_PJRT): transport loop only."""
    exe = str(tmp_path_factory.mktemp("host") / "veon_serve_host_echo")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-DVEON_NO_PJRT", "-o", exe, SRC],
        check=True, capture_output=True, timeout=300)
    return exe


def _wait_socket(path, proc, timeout=10.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if os.path.exists(path):
            return
        if proc.poll() is not None:
            raise AssertionError(
                f"server exited rc={proc.returncode}: "
                f"{proc.stderr.read().decode()}")
        time.sleep(0.05)
    raise AssertionError("server socket never appeared")


def test_echo_host_roundtrip_all_dtypes(echo_host, tmp_path):
    """python TensorClient <-> C++ server: every protocol dtype round-trips
    bit-exactly, server_ms rides along, connection is persistent (two
    requests on one connection), and --once exits cleanly after close."""
    import ml_dtypes

    from veon_tpu.serve import TensorClient

    sock = str(tmp_path / "host.sock")
    proc = subprocess.Popen([echo_host, sock, "--echo", "--once"],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        _wait_socket(sock, proc)
        arrays = {
            "f32": np.arange(6, dtype=np.float32).reshape(2, 3),
            "f64": np.arange(4, dtype=np.float64),
            "i32": np.arange(3, dtype=np.int32),
            "i64": np.arange(3, dtype=np.int64),
            "u8": np.arange(5, dtype=np.uint8),
            "bf16": np.arange(4, dtype=np.float32).astype(ml_dtypes.bfloat16),
            "bool": np.asarray([True, False]),
            "f16": np.arange(4, dtype=np.float16),
            "scalar": np.float32(3.5),
        }
        with TensorClient(sock) as c:
            out = c.infer(**arrays)
            for k, v in arrays.items():
                # the wire format promotes 0-d to (1,) on SEND
                # (protocol.py uses np.ascontiguousarray, ndim >= 1)
                got, want = out[k], np.ascontiguousarray(v)
                assert got.dtype == want.dtype, k
                assert got.shape == want.shape, k
                np.testing.assert_array_equal(
                    got.view(np.uint8), want.view(np.uint8), err_msg=k)
            assert float(np.asarray(out["server_ms"]).reshape(-1)[0]) >= 0.0
            # second request on the SAME connection (persistent loop)
            out2 = c.infer(x=np.float32(1.0))
            assert float(np.asarray(out2["x"]).reshape(-1)[0]) == 1.0
        # --once: server exits after the connection closes
        assert proc.wait(timeout=10) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_echo_host_cpp_client(echo_host, tmp_path):
    """C++ client against the C++ server — the zero-python transport path."""
    client_src = os.path.join(os.path.dirname(SRC), "serve_client.cpp")
    exe = str(tmp_path / "veon_client")
    subprocess.run(["g++", "-O2", "-std=c++17", "-o", exe, client_src],
                   check=True, capture_output=True, timeout=300)
    sock = str(tmp_path / "cc.sock")
    proc = subprocess.Popen([echo_host, sock, "--echo", "--once"],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        _wait_socket(sock, proc)
        x = np.random.default_rng(0).standard_normal((3, 4)).astype(np.float32)
        np.save(tmp_path / "x.npy", x)
        r = subprocess.run(
            [exe, sock, f"x={tmp_path}/x.npy", "--out", f"{tmp_path}/r_"],
            capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        np.testing.assert_array_equal(np.load(tmp_path / "r_x.npy"), x)
        assert os.path.exists(tmp_path / "r_server_ms.npy")
    finally:
        if proc.poll() is None:
            proc.kill()


def test_echo_host_usage_error(echo_host):
    r = subprocess.run([echo_host], capture_output=True, text=True,
                       timeout=30)
    assert r.returncode == 2
    assert "usage:" in r.stderr


@pytest.fixture(scope="module")
def pjrt_host(tmp_path_factory):
    if not TF_INC:
        pytest.skip("no PJRT C API headers (tensorflow include dir) on box")
    exe = str(tmp_path_factory.mktemp("hostp") / "veon_serve_host")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{TF_INC[0]}/tensorflow/compiler",
         "-o", exe, SRC, "-ldl"],
        check=True, capture_output=True, timeout=300)
    return exe


def test_pjrt_host_init_path(pjrt_host, tmp_path):
    """PJRT-mode init: plugin loads + api negotiates; rc=3 when no device
    is locally attachable (this box), rc=0+serving on a real TPU host."""
    if not LIBTPU:
        pytest.skip("no libtpu.so on box")
    r = subprocess.run(
        [pjrt_host, str(tmp_path / "p.sock"), LIBTPU[0], "/dev/null",
         "--order", "x", "--once"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 3, (r.stdout, r.stderr)
    assert "pjrt api" in r.stdout


def test_pjrt_host_requires_order(pjrt_host, tmp_path):
    r = subprocess.run(
        [pjrt_host, str(tmp_path / "q.sock"), "/dev/null", "/dev/null"],
        capture_output=True, text=True, timeout=30)
    assert r.returncode == 2
    assert "--order" in r.stderr
