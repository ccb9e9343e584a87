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
