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
        ["g++", "-O2", "-std=c++17", "-pthread", "-DVEON_NO_PJRT", "-o",
         exe, SRC],
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


def test_echo_host_survives_client_gone_midsend(echo_host, tmp_path):
    """A client that disconnects before reading its (large) response must
    not kill the daemon: send() hits EPIPE (MSG_NOSIGNAL in frame.h
    send_all — default SIGPIPE would terminate the process), the server
    drops that connection and keeps serving the next one."""
    from veon_tpu.serve import TensorClient
    from veon_tpu.serve.protocol import send_frame

    sock = str(tmp_path / "gone.sock")
    proc = subprocess.Popen([echo_host, sock, "--echo"],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        _wait_socket(sock, proc)
        import socket as socket_mod
        for _ in range(3):  # repeat: EPIPE vs buffered-FIN timing races
            s = socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM)
            s.connect(sock)
            # 16 MB payload: the echoed response cannot fit any socket
            # buffer, so the server's send_all is still writing when the
            # peer is gone (RST after close-with-unread-data)
            big = np.zeros((4 << 20,), np.float32)
            send_frame(s, {"big": big})
            s.close()  # vanish without reading the response
        time.sleep(0.3)
        assert proc.poll() is None, (
            f"server died rc={proc.returncode}: {proc.stderr.read().decode()}")
        with TensorClient(sock) as c:  # still serving
            out = c.infer(x=np.float32(7.0))
            assert float(np.asarray(out["x"]).reshape(-1)[0]) == 7.0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_echo_host_rejects_bad_dtype_and_bogus_dims(echo_host, tmp_path):
    """Malformed frames (unknown dtype code, multi-GB dims product) must
    close that connection — never desync into garbage or std::bad_alloc
    the daemon (frame.h recv_frame validation). The server stays up."""
    import socket as socket_mod
    import struct

    from veon_tpu.serve import TensorClient

    sock = str(tmp_path / "bad.sock")
    proc = subprocess.Popen([echo_host, sock, "--echo"],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        _wait_socket(sock, proc)
        frames = [
            # dtype code 200 (unknown)
            struct.pack("<IHHI", 0x56454F4E, 1, 0, 1)
            + struct.pack("<H", 1) + b"x" + bytes([200, 1])
            + struct.pack("<Q", 4),
            # known dtype, dims product ~2**62 elements
            struct.pack("<IHHI", 0x56454F4E, 1, 0, 1)
            + struct.pack("<H", 1) + b"x" + bytes([0, 2])
            + struct.pack("<QQ", 1 << 31, 1 << 31),
        ]
        for raw in frames:
            s = socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM)
            s.connect(sock)
            s.sendall(raw)
            # server kills the connection: clean FIN (b"") if it consumed
            # the stream, RST (ECONNRESET) if it closed with bytes pending
            try:
                assert s.recv(1) == b""
            except ConnectionResetError:
                pass
            s.close()
        assert proc.poll() is None, (
            f"server died rc={proc.returncode}: {proc.stderr.read().decode()}")
        with TensorClient(sock) as c:  # and still answers well-formed ones
            out = c.infer(x=np.float32(1.5))
            assert float(np.asarray(out["x"]).reshape(-1)[0]) == 1.5
    finally:
        if proc.poll() is None:
            proc.kill()


def test_echo_host_concurrent_clients(echo_host, tmp_path):
    """Thread-per-connection: a second client must be answered WHILE the
    first still holds its persistent connection open (the single-client
    accept loop this replaced would block it until the first closed)."""
    from veon_tpu.serve import TensorClient

    sock = str(tmp_path / "two.sock")
    proc = subprocess.Popen([echo_host, sock, "--echo"],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        _wait_socket(sock, proc)
        with TensorClient(sock) as c1:
            assert float(np.asarray(
                c1.infer(x=np.float32(1.0))["x"]).reshape(-1)[0]) == 1.0
            with TensorClient(sock) as c2:  # c1 still connected
                assert float(np.asarray(
                    c2.infer(x=np.float32(2.0))["x"]).reshape(-1)[0]) == 2.0
            # and c1 keeps working after c2 came and went
            assert float(np.asarray(
                c1.infer(x=np.float32(3.0))["x"]).reshape(-1)[0]) == 3.0
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
        ["g++", "-O2", "-std=c++17", "-pthread",
         f"-I{TF_INC[0]}/tensorflow/compiler", "-o", exe, SRC, "-ldl"],
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
