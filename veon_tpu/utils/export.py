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
                     num_temporal: int = 2) -> Tuple[str, Any]:
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
    import dataclasses

    import jax
    import numpy as np

    from ..cli.shapes import example_batch_full
    from ..configs import presets
    from ..model.veon import VeonModel
    from ..nn import text as text_mod
    from ..serve.streaming import TemporalSession

    cfg = getattr(presets, preset)(num_temporal=num_temporal)
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
    sess = TemporalSession(model, variables, ovw, membership=membership,
                           jit=False)
    m1 = {k: metas[k][:, :1] for k in
          ("sensor2egos", "ego2globals", "intrins", "post_rots",
           "post_trans")}
    m1["bda"] = metas["bda"]
    m1["lidarego2global"] = metas["lidarego2global"]
    prev_vox, prev_l2g = sess.state()
    example = (variables, imgs[:, :1], depth_imgs[:, :1], m1, ovw,
               prev_vox, prev_l2g, sess._zero_embed)
    return export_inference(sess._fn, example, path), example
