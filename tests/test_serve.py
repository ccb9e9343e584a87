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
    assert float(np.asarray(ms).reshape(-1)[0]) >= 0.0


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


def test_temporal_session_rolling_parity(tiny_graph):
    """Server-side TemporalSession: feeding frames in time order (prev, then
    current) must reproduce the batched full_forward exactly — i.e. the
    cache rolling (early_vox -> prev slot, l2g bookkeeping) is faithful to
    the recompute semantics, not just the single-call streaming method."""
    from veon_tpu.serve import TemporalSession

    g = tiny_graph(2)
    model, params = g["model"], g["params"]
    imgs, depth, metas = g["imgs"], g["depth"], g["metas"]

    def frame_metas(f):
        m = {k: v[:, f:f + 1] for k, v in metas.items()
             if k in ("sensor2egos", "ego2globals", "intrins", "post_rots",
                      "post_trans")}
        m["bda"] = metas["bda"]
        return m

    sess = TemporalSession(model, params, g["ovw"], estimate_depth=False)
    assert sess.calls == 0

    # frame 1 = the OLDER frame; its pose is what full_forward sees as
    # prev_lidarego2global[:, 0]
    m1 = frame_metas(1)
    m1["lidarego2global"] = metas["prev_lidarego2global"][:, 0]
    sess.infer(imgs[:, 1:2], depth[:, 1:2], m1)

    m0 = frame_metas(0)
    m0["lidarego2global"] = metas["lidarego2global"]
    te = np.random.default_rng(7).standard_normal(
        g["out"]["feat_occ"].shape[-1]).astype(np.float32)
    out = sess.infer(imgs[:, 0:1], depth[:, 0:1], m0, text_embed=te)
    assert sess.calls == 2

    out_ref = g["out"]  # batched recompute (frame 0 current, frame 1 prev)
    for k in out_ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(out_ref[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)

    # the in-graph retrieval map == the eval-side cosine convention applied
    # to the recompute path's voxel features
    from veon_tpu.model.veon import retrieval_map

    want = np.asarray(retrieval_map(out_ref["feat_occ"], jnp.asarray(te)))
    np.testing.assert_allclose(np.asarray(out["retrieval"]), want,
                               rtol=2e-4, atol=2e-4)

    # reset zeroes the cache: a fresh call must equal call #1's cold output
    sess.reset()
    assert sess.calls == 0
    vox, l2g = sess.state()
    assert not np.asarray(vox).any()
    np.testing.assert_array_equal(np.asarray(l2g[0, 0]), np.eye(4))

    # uint8 serving contract (--raw-uint8): a normalize=("clipsan", ...)
    # session fed raw uint8 frames == this session fed host-normalized
    # floats (reuses `sess`, freshly reset, as the float reference)
    from veon_tpu.data import transforms as T

    rng = np.random.default_rng(9)
    u8 = rng.integers(0, 256, size=imgs[:, 0:1].shape).astype(np.uint8)
    f32 = jnp.asarray(T.normalize_clipsan(u8))
    s_u8 = TemporalSession(model, params, g["ovw"], estimate_depth=False,
                           normalize=("clipsan", "depthanythingv2"))
    out_u8 = s_u8.infer(jnp.asarray(u8), depth[:, 0:1], m0)
    out_f32 = sess.infer(f32, depth[:, 0:1], m0)
    for k in out_f32:
        np.testing.assert_allclose(
            np.asarray(out_u8[k]), np.asarray(out_f32[k]),
            rtol=2e-5, atol=2e-6, err_msg=k)


def test_cli_streaming_serve_end_to_end(tmp_path):
    """`veon_tpu serve --num-temporal 2` wiring: the handler built by the
    CLI holds a TemporalSession server-side; per-frame socket requests
    (imgs + depth_imgs + lidarego2global) return fusion-rule classes, and a
    `reset` request zeroes the temporal cache."""
    import argparse

    from veon_tpu.cli.main import _build_serve_handler
    from veon_tpu.cli.shapes import example_batch_full
    from veon_tpu.configs import presets

    args = argparse.Namespace(
        preset="veon_tiny_test", num_temporal=2, load_from=None,
        depth_load_from=None, bpe_path=None)
    handler, required, expect, exclusive = _build_serve_handler(args)
    assert required == ()
    assert exclusive  # stateful temporal session: one connection at a time

    cfg = presets.veon_tiny_test(num_temporal=2)
    imgs, depth_imgs, metas = example_batch_full(cfg, B=1)
    nx, ny, nz = cfg.grid.size

    sock = os.path.join(str(tmp_path), "veon_t2.sock")
    srv = TensorServer(handler, sock, required=required, exclusive=True)
    srv.start()
    try:
        with TensorClient(sock) as c:
            l2g = np.asarray(metas["lidarego2global"], np.float32)
            for f in (1, 0):  # time order: older frame first
                out = c.infer(imgs=np.asarray(imgs[:, f:f + 1]),
                              depth_imgs=np.asarray(depth_imgs[:, f:f + 1]),
                              lidarego2global=l2g)
            pred = out["pred"]
            assert pred.shape == (1, nx, ny, nz)
            assert pred.min() >= 0 and pred.max() <= 17
            assert "retrieval" not in out  # no text in the request
            r = c.infer(reset=np.int32(1))
            assert int(np.asarray(r["ok"]).reshape(-1)[0]) == 1
            # still serving after reset; free-text retrieval via a prompt
            # embedding and via server-side tokenized text
            te = np.random.default_rng(3).standard_normal(
                cfg.propagation.clip_proj_dim).astype(np.float32)
            out = c.infer(imgs=np.asarray(imgs[:, 0:1]),
                          depth_imgs=np.asarray(depth_imgs[:, 0:1]),
                          lidarego2global=l2g, text_embed=te)
            assert out["pred"].shape == (1, nx, ny, nz)
            assert out["retrieval"].shape == (1, nx, ny, nz)
            assert np.isfinite(out["retrieval"]).all()
            assert np.abs(out["retrieval"]).max() <= 1.0 + 1e-5  # cosine
            from veon_tpu.nn.text import ClipTokenizer

            tok = ClipTokenizer(None).tokenize(["a parked red car"])
            out2 = c.infer(imgs=np.asarray(imgs[:, 0:1]),
                           depth_imgs=np.asarray(depth_imgs[:, 0:1]),
                           lidarego2global=l2g,
                           text_tokens=np.asarray(tok, np.int32))
            assert out2["retrieval"].shape == (1, nx, ny, nz)
            assert np.isfinite(out2["retrieval"]).all()
    finally:
        srv.stop()


def test_exclusive_server_rejects_second_connection(tmp_path):
    """exclusive=True (stateful temporal sessions): a second concurrent
    connection is refused with an error frame instead of silently
    interleaving into the first stream's rolling cache."""
    sock = os.path.join(str(tmp_path), "x.sock")
    srv = TensorServer(lambda **kw: kw, sock, exclusive=True)
    srv.start()
    try:
        with TensorClient(sock) as c1:
            c1.infer(a=np.float32(1.0))
            with TensorClient(sock) as c2:
                # the rejection surfaces as the server's busy error frame,
                # or as a broken pipe if the close lands before our send
                with pytest.raises((RuntimeError, OSError)) as ei:
                    c2.infer(a=np.float32(2.0))
                if isinstance(ei.value, RuntimeError):
                    assert "busy" in str(ei.value)
            out = c1.infer(a=np.float32(3.0))  # first client still served
            assert float(np.asarray(out["a"]).reshape(-1)[0]) == 3.0
        # after the first client disconnects, a new one is admitted (the
        # server notices the close on its next recv — retry briefly)
        import time as _time

        for attempt in range(50):
            try:
                with TensorClient(sock) as c3:
                    got = c3.infer(a=np.float32(4.0))["a"]
                break
            except (RuntimeError, OSError):
                _time.sleep(0.05)
        assert float(np.asarray(got).reshape(-1)[0]) == 4.0
    finally:
        srv.stop()
