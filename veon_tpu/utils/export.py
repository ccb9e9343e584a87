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
