"""Deployment export (the reference's TRT-export counterpart,
`tools/convert_bevdet_to_TRT.py` + TRTBEVPoolv2): serialize the jitted
inference function with jax.export into a portable StableHLO artifact that a
serving binary (or another process/version) can load and run without Python
model code."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


def export_inference(fn, example_args, path: str) -> str:
    """Serialize jax.jit(fn) at the example shapes to `path` (bytes file)."""
    import jax
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn))(*example_args)
    data = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def export_mlir(fn, example_args, path: str) -> str:
    """Serialize the traced StableHLO MLIR module itself (text) — the input
    format of the native PJRT host runner (`native/pjrt_runner.cpp`), which
    compiles it through any PJRT C-API plugin (libtpu.so on TPU hosts)
    without python/jax. The .stablehlo artifact (export_inference) carries
    calling-convention metadata for jax; this carries the raw module for
    everything else."""
    import jax
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn))(*example_args)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(exp.mlir_module())
    return path


def _write_npy(path: str, arr) -> None:
    """np.save, plus the one dtype numpy can't spell: bfloat16 leaves are
    written with descr '<V2' (raw 2-byte void) — exactly what the native
    reader maps back to protocol dtype 5 (native/frame.h parse_npy)."""
    import numpy as np

    arr = np.asarray(arr)
    if arr.dtype.name != "bfloat16":
        np.save(path, np.ascontiguousarray(arr))
        return
    shape = "(" + ",".join(str(d) for d in arr.shape) + ("," if arr.ndim == 1 else "") + ")"
    hdr = ("{'descr': '<V2', 'fortran_order': False, 'shape': "
           + shape + ", }")
    total = 10 + len(hdr) + 1
    hdr += " " * (((total + 63) // 64) * 64 - total) + "\n"
    with open(path, "wb") as f:
        f.write(b"\x93NUMPY\x01\x00")
        f.write(len(hdr).to_bytes(2, "little"))
        f.write(hdr.encode())
        f.write(np.ascontiguousarray(arr).tobytes())


def export_native_bundle(fn, example_args, outdir: str,
                         arg_names: Tuple[str, ...],
                         request_args: Tuple[str, ...] = (),
                         out_names: Tuple[str, ...] = ()) -> str:
    """Everything the NATIVE consumers (native/serve_host.cpp daemon,
    native/pjrt_runner.cpp one-shot) need to serve the graph with zero
    python in the loop:

      <outdir>/module.mlir     raw StableHLO — the only format
                               PJRT_Client_Compile accepts (the .stablehlo
                               file from export_inference is jax.export's
                               serialized envelope, NOT loadable by the
                               C API)
      <outdir>/bind/<leaf>.npy one file per FIXED positional leaf (params,
                               rig metas, classifier, ...) for --bind
      <outdir>/manifest.json   {"order": [flat leaf names, positional],
                                "request": [per-request leaf names],
                                "outputs": [...], "serve_cmd": "..."}

    The exported module's entry point takes the PYTREE-FLATTENED leaves of
    `example_args` as positional arguments; `arg_names` names each
    top-level positional arg (leaf name = that name + the key path), and
    every leaf under a name listed in `request_args` is expected in the
    request frame instead of being bound from disk. Returns outdir.
    """
    import json

    import jax
    from jax import export as jexport

    assert len(arg_names) == len(example_args), (arg_names, len(example_args))
    exp = jexport.export(jax.jit(fn))(*example_args)
    os.makedirs(os.path.join(outdir, "bind"), exist_ok=True)
    with open(os.path.join(outdir, "module.mlir"), "w") as f:
        f.write(exp.mlir_module())
    # the FULL CompileOptionsProto jax itself would send (scheduling /
    # debug-option defaults included). The native consumers pass it through
    # PJRT_Client_Compile verbatim via --compile-opts: the minimal
    # num_replicas/num_partitions proto compiles toy modules but blew the
    # TPU's 2 KB sflag (async-copy sync flag) budget by 32B on the full
    # VEON graph — jax's defaults schedule it under budget.
    from jax._src import compiler as _jax_compiler

    co = _jax_compiler.get_compile_options(num_replicas=1, num_partitions=1)
    with open(os.path.join(outdir, "compile_options.pb"), "wb") as f:
        f.write(co.SerializeAsString())

    def leaf_name(top: str, path) -> str:
        import re

        s = top + jax.tree_util.keystr(path)
        s = "".join(c if (c.isalnum() or c in "._") else "." for c in s)
        return re.sub(r"\.+", ".", s).strip(".")

    order, request, binds = [], [], {}
    for top, arg in zip(arg_names, example_args):
        flat = jax.tree_util.tree_flatten_with_path(arg)[0]
        for path, leaf in flat:
            name = leaf_name(top, path)
            assert "," not in name and name not in order, name
            order.append(name)
            if top in request_args:
                request.append(name)
            else:
                _write_npy(os.path.join(outdir, "bind", name + ".npy"), leaf)
                binds[name] = f"bind/{name}.npy"
    assert len(order) == len(exp.in_avals), (len(order), len(exp.in_avals))
    outputs = list(out_names) or [f"out{i}" for i in range(len(exp.out_avals))]
    serve_cmd = ("veon_serve_host <socket> libtpu.so module.mlir --order "
                 + ",".join(order) + " "
                 + " ".join(f"--bind {n}={p}" for n, p in binds.items())
                 + " --out " + ",".join(outputs)
                 + " --compile-opts compile_options.pb")
    with open(os.path.join(outdir, "manifest.json"), "w") as f:
        json.dump({"order": order, "request": request, "binds": binds,
                   "outputs": outputs,
                   "in_shapes": [str(a) for a in exp.in_avals],
                   "out_shapes": [str(a) for a in exp.out_avals],
                   "serve_cmd": serve_cmd}, f, indent=1)
    return outdir


def load_inference(path: str):
    """Load a serialized inference artifact; returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def export_flagship(path: str = "work_dir/veon_b_infer.stablehlo") -> str:
    """Export the flagship VEON-B forward (entry()) for serving."""
    import sys

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, root)
    from __graft_entry__ import entry

    fn, args = entry()
    return export_inference(fn, args, path)


def export_streaming(path: str, preset: str = "veon_b",
                     num_temporal: int = 2,
                     raw_uint8: bool = False) -> Tuple[str, Any]:
    """Export the STREAMING temporal serving step (num_temporal >= 2).

    The artifact is the stateless function under serve/streaming.py's
    TemporalSession: previous frames ride in as cached voxel features
    (prev_vox, prev_lidarego2global arguments) and the cacheable early_vox
    rides out — so ANY consumer (the python server, the native
    serve_host.cpp, another process) gets the steady-state T_N serving
    cost by keeping the cache itself. Argument order:
      (variables, imgs, depth_imgs, metas, ovw, prev_vox, prev_l2g,
       text_embed) -> dict(pred, retrieval, early_vox, ...).
    Returns (path, example_args) so callers can save binding tensors.
    """
    fn, example = _build_streaming(preset, num_temporal,
                                   raw_uint8=raw_uint8)
    return export_inference(fn, example, path), example


def export_streaming_native(outdir: str, preset: str = "veon_b",
                            num_temporal: int = 2,
                            raw_uint8: bool = False) -> str:
    """Native-consumer bundle for the streaming step: module.mlir + bound
    leaves (variables / fixed-rig metas incl. the presorted lift streams /
    classifier) + manifest. Per-request: the frame tensors, the frame's
    `lidarego2global` ego pose (split out of the rig — it changes every
    frame, so binding it from disk would freeze the car in place), and the
    temporal cache (prev_vox, prev_l2g); the response carries the outputs
    in the manifest's order, early_vox included — the client echoes it back
    as next frame's prev_vox."""
    import jax

    fn, example = _build_streaming(preset, num_temporal,
                                   raw_uint8=raw_uint8)
    variables, imgs, depth_imgs, m1, ovw, prev_vox, prev_l2g, te = example
    rig = {k: v for k, v in m1.items() if k != "lidarego2global"}
    l2g = m1["lidarego2global"]

    def step(variables, imgs, depth_imgs, rig, l2g, ovw, pv, pl, te):
        return fn(variables, imgs, depth_imgs,
                  dict(rig, lidarego2global=l2g), ovw, pv, pl, te)

    example = (variables, imgs, depth_imgs, rig, l2g, ovw,
               prev_vox, prev_l2g, te)
    arg_names = ("variables", "imgs", "depth_imgs", "rig", "lidarego2global",
                 "ovw", "prev_vox", "prev_l2g", "text_embed")
    request = ("imgs", "depth_imgs", "lidarego2global", "prev_vox",
               "prev_l2g", "text_embed")
    out = jax.eval_shape(step, *example)  # name outputs by flatten order
    # same sanitizer as the input leaf names: separators become '.', so
    # nested output trees can't collide the way a strip-everything rule
    # would (['a']['b'] -> a.b, never 'ab')
    import re

    out_names = [
        re.sub(r"\.+", ".", "".join(
            c if (c.isalnum() or c in "._") else "."
            for c in jax.tree_util.keystr(path))).strip(".")
        for path, _ in jax.tree_util.tree_flatten_with_path(out)[0]]
    return export_native_bundle(step, example, outdir, arg_names,
                                request_args=request,
                                out_names=tuple(out_names))


def _split_pred_fn(fn, k: int, tuple_out: bool = False):
    """Wrap fn so its (B, X, Y, Z) pred returns as k row chunks on axis 1
    (the full-scale single-output fetch is the one untested factor in the
    round-4 native-hang bisect — NOTES.md "Native full-graph execution")."""
    import jax.numpy as jnp

    def split_fn(*a):
        pred = fn(*a)
        if tuple_out:
            (pred,) = pred
        return tuple(jnp.split(pred, k, axis=1))

    return split_fn


def _annotate_split(outdir: str, k: int) -> None:
    import json

    mpath = os.path.join(outdir, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["split_concat"] = {"axis": 1, "parts": k, "name": "pred"}
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1)


def export_flagship_native(outdir: str, split_output: int = 1) -> str:
    """Native-consumer bundle for the single-frame flagship forward
    (entry()): params/metas/classifier bound from disk, imgs + depth_imgs
    per request, one fused occupancy output.

    split_output > 1: the (B, X, Y, Z) pred is returned as K row chunks
    along X (pred.0..pred.K-1; the consumer concatenates on axis 1, as
    recorded in manifest["split_concat"]). Round-4 bisect isolated a
    plugin-internal hang on the FULL graph's single 2.5 MB output fetch
    (NOTES.md "Native full-graph execution") with every size/arity/kernel
    factor individually exonerated — splitting the fetch into K small
    ToHostBuffer calls is the one untested restructuring; both native
    consumers already loop over n_out outputs unchanged."""
    import json
    import sys

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, root)
    from __graft_entry__ import entry

    fn, args = entry()
    if split_output <= 1:
        return export_native_bundle(
            fn, args, outdir,
            arg_names=("params", "imgs", "depth_imgs", "metas", "ovw"),
            request_args=("imgs", "depth_imgs"), out_names=("pred",))
    export_native_bundle(
        _split_pred_fn(fn, split_output), args, outdir,
        arg_names=("params", "imgs", "depth_imgs", "metas", "ovw"),
        request_args=("imgs", "depth_imgs"),
        out_names=tuple(f"pred.{i}" for i in range(split_output)))
    _annotate_split(outdir, split_output)
    return outdir


def export_tiny_native(outdir: str, split_output: int = 1) -> str:
    """veon_tiny_test-config native bundle: the same request/bind/output
    contract as the flagship bundle at ~1000x less compute — the
    END-TO-END INTEGRATION SMOKE for the native daemon (compile + bind +
    serve a frame on a real PJRT device in minutes, no full-scale graph)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..cli.shapes import example_batch
    from ..configs import presets
    from ..model.veon import VeonModel, fusion_rule
    from ..nn import text as text_mod

    cfg = presets.veon_tiny_test()
    model = VeonModel(cfg=cfg)
    imgs, depth, metas = example_batch(cfg, B=1)
    # tiny preset has no separate depth-image geometry: feed the depth
    # tower the same spatial frame (estimate_depth resizes internally)
    depth_imgs = jnp.zeros(imgs.shape, imgs.dtype)
    prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    ovw = jnp.asarray(np.random.default_rng(0).standard_normal(
        (len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    # init on the local CPU backend: export only needs avals + leaf VALUES
    # for the bind files — running init on the accelerator would claim the
    # chip (and hang if another process holds it) for zero benefit
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(model.init, static_argnames=("train", "method"))(
            jax.random.PRNGKey(0), imgs, depth_imgs, metas, ovw, train=False,
            method=VeonModel.full_forward)
    membership = text_mod.merge_matrix(refl)

    def fn(params, imgs, depth_imgs, metas, ovw):
        out = model.apply(params, imgs, depth_imgs, metas, ovw, train=False,
                          method=VeonModel.full_forward)
        merged = text_mod.merge_classes_max(out["sem_occ_raw"], membership,
                                            axis=-1)
        return (fusion_rule(merged, out["bin_occ"]),)

    if split_output > 1:
        export_native_bundle(
            _split_pred_fn(fn, split_output, tuple_out=True),
            (variables, imgs, depth_imgs, metas, ovw), outdir,
            arg_names=("params", "imgs", "depth_imgs", "metas", "ovw"),
            request_args=("imgs", "depth_imgs"),
            out_names=tuple(f"pred.{i}" for i in range(split_output)))
        _annotate_split(outdir, split_output)
        return outdir
    return export_native_bundle(
        fn, (variables, imgs, depth_imgs, metas, ovw), outdir,
        arg_names=("params", "imgs", "depth_imgs", "metas", "ovw"),
        request_args=("imgs", "depth_imgs"), out_names=("pred",))


def _build_streaming(preset: str, num_temporal: int,
                     compute_dtype: Optional[str] = None,
                     raw_uint8: bool = False):
    """(fn, example_args) for the streaming serving step — shared by the
    jax-envelope exporter, the native-bundle exporter (which re-splits the
    args itself: lidarego2global is per-request there), and the sequential
    benchmark (cli.main._benchmark_streaming).

    raw_uint8: the exported step takes raw uint8 HWC RGB frames and runs
    the normalizers in-graph (TemporalSession normalize=) — the deployed
    artifact / native bundle then gets the same 4x request-transport cut
    as the live `serve --raw-uint8` path, bit-exactly."""
    import dataclasses

    import jax
    import numpy as np

    from ..cli.shapes import example_batch_full
    from ..configs import presets
    from ..model.veon import VeonModel
    from ..nn import text as text_mod
    from ..serve.streaming import TemporalSession

    kwargs = {"num_temporal": num_temporal}
    if compute_dtype is not None:
        kwargs["compute_dtype"] = compute_dtype
    cfg = getattr(presets, preset)(**kwargs)
    cfg = dataclasses.replace(
        cfg, depth=dataclasses.replace(cfg.depth, use_lora=False))
    model = VeonModel(cfg=cfg)
    imgs, depth_imgs, metas = example_batch_full(cfg, B=1)
    prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    ovw = jnp.asarray(rng.standard_normal(
        (len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(model.init, static_argnames=("train", "method"))(
            jax.random.PRNGKey(0), imgs, depth_imgs, metas, ovw, train=False,
            method=VeonModel.full_forward)
    membership = text_mod.merge_matrix(refl)
    sess = TemporalSession(
        model, variables, ovw, membership=membership, jit=False,
        normalize=(("clipsan", cfg.data.depth_norm_method)
                   if raw_uint8 else None))
    if raw_uint8:
        # the artifact's frozen input signature must be uint8
        rng_u8 = np.random.default_rng(1)
        imgs = jnp.asarray(rng_u8.integers(
            0, 256, size=imgs.shape, dtype=np.uint8))
        depth_imgs = jnp.asarray(rng_u8.integers(
            0, 256, size=depth_imgs.shape, dtype=np.uint8))
    m1 = {k: metas[k][:, :1] for k in
          ("sensor2egos", "ego2globals", "intrins", "post_rots",
           "post_trans")}
    m1["bda"] = metas["bda"]
    m1["lidarego2global"] = metas["lidarego2global"]
    # serving is fixed-rig: precompute the lift's rank sort once (shared
    # recipe with cmd_serve) — without it the exported / benchmarked step
    # pays the in-graph rank argsort every frame, which is pathologically
    # slow on TPU (XLA sort at ~1.1M keys; measured 4.4 s vs 190 ms per
    # streaming frame on v5e)
    from ..lift.lss import precompute_rig_sorted

    m1["lift_sorted"] = precompute_rig_sorted(cfg, metas)
    prev_vox, prev_l2g = sess.state()
    example = (variables, imgs[:, :1], depth_imgs[:, :1], m1, ovw,
               prev_vox, prev_l2g, sess._zero_embed)
    return sess._fn, example
