"""Serving runtime: export artifact -> socket server -> python + C++ clients.

Covers round-2 gap 'a serving runtime around the export artifact': the
StableHLO export is actually CONSUMED by a server process and driven by a
dependency-free native client.
"""

import os
import subprocess
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from veon_tpu.serve import TensorClient, TensorServer, serve_exported
from veon_tpu.utils.export import export_inference

NATIVE_SRC = os.path.join(os.path.dirname(__file__), "..", "veon_tpu",
                          "native", "serve_client.cpp")


def _tiny_fn(w, x, b):
    return jnp.tanh(x @ w) + b


@pytest.fixture(scope="module")
def served():
    tmp = tempfile.mkdtemp(prefix="veon_serve_")
    w = np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32)
    x0 = np.zeros((2, 4), np.float32)
    b0 = np.zeros((3,), np.float32)
    art = os.path.join(tmp, "tiny.stablehlo")
    export_inference(_tiny_fn, (w, x0, b0), art)
    sock = os.path.join(tmp, "veon.sock")
    srv = serve_exported(art, sock, bound={"w": w},
                         request_keys=("x", "b"), arg_order=("w", "x", "b"),
                         out_names=("y",))
    yield sock, w
    srv.stop()


def test_python_client_roundtrip(served):
    sock, w = served
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    with TensorClient(sock) as c:
        out = c.infer(x=x, b=b)
    np.testing.assert_allclose(out["y"], np.tanh(x @ w) + b, rtol=1e-5,
                               atol=1e-6)
    assert "server_ms" in out

    # errors come back as status frames, and the connection keeps serving
    with TensorClient(sock) as c:
        with pytest.raises(RuntimeError, match="missing tensors"):
            c.infer(x=x)
        out = c.infer(x=x, b=b)  # still alive after the error
    np.testing.assert_allclose(out["y"], np.tanh(x @ w) + b, rtol=1e-5,
                               atol=1e-6)


def test_cpp_client_roundtrip(served, tmp_path):
    sock, w = served
    exe = str(tmp_path / "veon_client")
    subprocess.run(["g++", "-O2", "-o", exe, os.path.abspath(NATIVE_SRC)],
                   check=True, capture_output=True, timeout=120)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    np.save(tmp_path / "x.npy", x)
    np.save(tmp_path / "b.npy", b)
    r = subprocess.run(
        [exe, sock, f"x={tmp_path}/x.npy", f"b={tmp_path}/b.npy",
         "--out", f"{tmp_path}/resp_"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    y = np.load(tmp_path / "resp_y.npy")
    np.testing.assert_allclose(y, np.tanh(x @ w) + b, rtol=1e-5, atol=1e-6)
    ms = np.load(tmp_path / "resp_server_ms.npy")
    assert float(ms) >= 0.0


def test_protocol_dtypes_roundtrip():
    """Every protocol dtype survives a server round trip, including bf16."""
    import ml_dtypes

    tmp = tempfile.mkdtemp(prefix="veon_proto_")
    sock = os.path.join(tmp, "p.sock")
    srv = TensorServer(lambda **kw: kw, sock)
    srv.start()
    try:
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
            got = out[k]
            assert got.dtype == np.asarray(v).dtype, k
            np.testing.assert_array_equal(got, np.asarray(v))
    finally:
        srv.stop()
