"""jax.export round-trip on a small jitted function (deployment export)."""

import numpy as np
import jax
import jax.numpy as jnp

from veon_tpu.utils.export import export_inference, load_inference


def test_export_roundtrip(tmp_path):
    def fn(x, w):
        return jnp.tanh(x @ w).sum(axis=-1)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(1).standard_normal((8, 3)).astype(np.float32))
    p = export_inference(fn, (x, w), str(tmp_path / "fn.stablehlo"))
    loaded = load_inference(p)
    np.testing.assert_allclose(np.asarray(loaded(x, w)), np.asarray(fn(x, w)), rtol=1e-6)


def test_export_native_bundle(tmp_path):
    """The --native bundle is what native/serve_host.cpp actually consumes:
    raw module.mlir (NOT the jax envelope), one bind npy per fixed leaf in
    flattened positional order, request leaves listed but not bound, and a
    manifest whose order length matches the module's entry arity."""
    import json

    import ml_dtypes

    from veon_tpu.utils.export import export_native_bundle

    def fn(params, x):
        h = jnp.tanh(x @ params["w"].astype(jnp.float32))
        return {"y": h + params["nest"]["b"], "n": jnp.sum(h)}

    params = {
        "w": jnp.asarray(np.random.default_rng(0)
                         .standard_normal((8, 3)).astype(np.float32)
                         .astype(ml_dtypes.bfloat16)),
        "nest": {"b": jnp.zeros((3,), np.float32) + 0.5},
    }
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((4, 8)).astype(np.float32))
    out = export_native_bundle(fn, (params, x), str(tmp_path / "b"),
                               arg_names=("params", "x"),
                               request_args=("x",), out_names=("n", "y"))
    man = json.load(open(f"{out}/manifest.json"))
    # flatten order: dicts are key-sorted -> nest.b before w, then x
    assert man["order"] == ["params.nest.b", "params.w", "x"]
    assert man["request"] == ["x"]
    assert sorted(man["binds"]) == ["params.nest.b", "params.w"]
    assert man["outputs"] == ["n", "y"]
    mlir = open(f"{out}/module.mlir").read()
    assert "stablehlo." in mlir
    assert mlir.count("tensor<") > 0 and "func.func public @main" in mlir
    # the module entry takes exactly the manifest's positional args
    main_sig = mlir[mlir.index("@main("):mlir.index("\n", mlir.index("@main("))]
    assert main_sig.count("%arg") == len(man["order"])
    # fixed leaves round-trip from disk: f32 via np.load, bf16 as <V2 bytes
    b = np.load(f"{out}/bind/params.nest.b.npy")
    np.testing.assert_array_equal(b, np.asarray(params["nest"]["b"]))
    w = np.load(f"{out}/bind/params.w.npy")
    assert w.dtype.str == "|V2" and w.shape == (8, 3)
    np.testing.assert_array_equal(
        w.view(np.uint16).reshape(8, 3),
        np.asarray(params["w"]).view(np.uint16))
    # request leaves are not bound
    import os
    assert not os.path.exists(f"{out}/bind/x.npy")
    assert "--bind x=" not in man["serve_cmd"]
    # full jax CompileOptionsProto ships with the bundle and serve_cmd
    # passes it (the minimal hand-encoded options blow the TPU sflag
    # budget at real graph scale — see utils/export.py)
    co = open(f"{out}/compile_options.pb", "rb").read()
    assert len(co) > 100  # real proto, not the 6-byte minimal encoding
    assert "--compile-opts compile_options.pb" in man["serve_cmd"]


def test_export_streaming_roundtrip(tmp_path):
    """The streaming temporal serving step exports and reloads: the loaded
    artifact (no model code) must reproduce the live session's first-call
    outputs on the same inputs, and return the cacheable early_vox whose
    shape matches the prev_vox slot it feeds next call."""
    from veon_tpu.utils.export import export_streaming

    path, example = export_streaming(
        str(tmp_path / "t2.stablehlo"), preset="veon_tiny_test",
        num_temporal=2)
    loaded = load_inference(path)
    out = loaded(*example)
    variables, imgs, depth_imgs, m1, ovw, prev_vox, prev_l2g, te = example
    assert out["pred"].dtype in (np.uint8, jnp.uint8)  # wire-size: 4x less
    # early_vox must slot back into prev_vox[:, 0] for the next call
    assert out["early_vox"].shape == tuple(prev_vox.shape[:1]) + tuple(
        prev_vox.shape[2:])
    # live (unexported) step on the same inputs agrees
    from veon_tpu.configs import presets
    from veon_tpu.model.veon import VeonModel
    from veon_tpu.nn import text as text_mod
    from veon_tpu.serve.streaming import TemporalSession

    cfg = presets.veon_tiny_test(num_temporal=2)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, depth=dataclasses.replace(cfg.depth, use_lora=False))
    model = VeonModel(cfg=cfg)
    _prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    sess = TemporalSession(model, variables, ovw,
                           membership=text_mod.merge_matrix(refl), jit=False)
    live = sess._fn(variables, imgs, depth_imgs, m1, ovw, prev_vox,
                    prev_l2g, te)
    for k in live:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(live[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_export_streaming_raw_uint8(tmp_path):
    """export --raw-uint8: the frozen streaming step takes RAW uint8 frames
    (4x less request transport for every artifact consumer) and must agree
    exactly with the normalized-float step fed the host-normalized copies
    of the same frames (normalize_in_graph is the host normalizers' bit-
    exact twin)."""
    from veon_tpu.data.transforms import NORMALIZERS
    from veon_tpu.utils.export import _build_streaming, export_streaming

    path, example = export_streaming(
        str(tmp_path / "t2u8.stablehlo"), preset="veon_tiny_test",
        num_temporal=2, raw_uint8=True)
    variables, imgs, depth_imgs, m1, ovw, prev_vox, prev_l2g, te = example
    assert imgs.dtype == jnp.uint8 and depth_imgs.dtype == jnp.uint8
    loaded = load_inference(path)
    out = loaded(*example)
    assert out["pred"].dtype in (np.uint8, jnp.uint8)

    # normalized-float twin on the SAME frames, host-normalized
    fn_f32, _ = _build_streaming("veon_tiny_test", 2)
    from veon_tpu.configs import presets

    depth_m = presets.veon_tiny_test().data.depth_norm_method
    live = fn_f32(variables,
                  jnp.asarray(NORMALIZERS["clipsan"](np.asarray(imgs))),
                  jnp.asarray(NORMALIZERS[depth_m](np.asarray(depth_imgs))),
                  m1, ovw, prev_vox, prev_l2g, te)
    np.testing.assert_array_equal(np.asarray(out["pred"]),
                                  np.asarray(live["pred"]))
    # compiled-vs-eager noise: same budget as the float roundtrip test plus
    # the compiled normalize (measured max rel 3.7e-5 on CPU)
    np.testing.assert_allclose(np.asarray(out["early_vox"]),
                               np.asarray(live["early_vox"]),
                               rtol=1e-4, atol=1e-5)


def test_benchmark_artifact_tiny(tmp_path):
    """`benchmark --artifact` (benchmark_trt.py counterpart): a serialized
    artifact is deserialized, fed synthetic inputs at its frozen shapes
    (mixed float/int leaves), and timed on device."""
    import argparse

    from veon_tpu.cli.main import _benchmark_artifact
    from veon_tpu.utils.export import export_inference

    def fn(w, x, n):
        return {"y": jnp.tanh(x @ w) + n.astype(jnp.float32).sum(),
                "cls": jnp.argmax(x, -1).astype(jnp.uint8)}

    w = jnp.asarray(np.random.default_rng(0).standard_normal((6, 4)),
                    jnp.float32)
    x = jnp.ones((3, 6), jnp.float32)
    n = jnp.zeros((2,), jnp.int32)
    path = export_inference(fn, (w, x, n), str(tmp_path / "tiny.stablehlo"))
    out = _benchmark_artifact(
        argparse.Namespace(artifact=path), n_iters=2, outer=1)
    assert out["metric"] == "tiny_artifact_frames_per_sec"
    assert out["value"] > 0 and out["detail"]["n_inputs"] == 3


def test_export_tiny_native_bundle(tmp_path):
    """The veon_tiny_test native bundle (the daemon's integration smoke)
    carries the same contract as the flagship bundle: module.mlir +
    compile_options.pb + one bind per fixed leaf + imgs/depth_imgs as
    request tensors + a single pred output."""
    import json
    import os

    from veon_tpu.utils.export import export_tiny_native

    out = export_tiny_native(str(tmp_path / "tiny"))
    man = json.load(open(f"{out}/manifest.json"))
    assert man["request"] == ["imgs", "depth_imgs"]
    assert man["outputs"] == ["pred"]
    assert "--compile-opts compile_options.pb" in man["serve_cmd"]
    assert os.path.getsize(f"{out}/compile_options.pb") > 100
    mlir = open(f"{out}/module.mlir").read()
    assert "func.func public @main" in mlir
    # every non-request leaf is bound from disk
    for name in man["order"]:
        if name in man["request"]:
            assert not os.path.exists(f"{out}/bind/{name}.npy")
        else:
            assert os.path.exists(f"{out}/bind/{name}.npy"), name


def test_export_tiny_native_split_output(tmp_path):
    """--split-output bundle: K pred.<i> outputs (the chunked-fetch
    restructure for the round-4 native full-scale fetch hang), manifest
    records split_concat, and concatenating the chunk avals reproduces the
    unsplit pred shape."""
    import json

    from veon_tpu.utils.export import export_tiny_native

    out = export_tiny_native(str(tmp_path / "nb_split"), split_output=2)
    man = json.load(open(f"{out}/manifest.json"))
    assert man["outputs"] == ["pred.0", "pred.1"]
    assert man["split_concat"] == {"axis": 1, "parts": 2, "name": "pred"}
    assert len(man["out_shapes"]) == 2
    # (1, 20, 20, 4) int32 pred -> two (1, 10, 20, 4) chunks
    assert all("1,10,20,4" in s.replace(" ", "").replace("(", ",")
               or "10,20,4" in s.replace(" ", "") for s in man["out_shapes"]), \
        man["out_shapes"]
