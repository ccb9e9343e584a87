"""Parameter auditing (the count_parameters_full / count_parameters_depth
tables of `apis/train.py:361-454`): per-subsystem parameter counts with a
trainable split."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np


def count_parameters(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def param_table(
    params,
    trainable_pred: Optional[Callable[[Tuple[str, ...]], bool]] = None,
) -> str:
    """Per-top-level-module parameter table, printed like the reference's
    subsystem audit (depth / CLIP / side adapter / HSA / 3D)."""
    rows: Dict[str, Dict[str, int]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(k.key if hasattr(k, "key") else str(k) for k in path)
        top = keys[0]
        n = int(np.prod(leaf.shape))
        row = rows.setdefault(top, {"total": 0, "trainable": 0})
        row["total"] += n
        if trainable_pred is not None and trainable_pred(keys):
            row["trainable"] += n
    lines = [f"{'module':<24}{'params':>14}{'trainable':>14}"]
    tot = {"total": 0, "trainable": 0}
    for name in sorted(rows):
        r = rows[name]
        tot["total"] += r["total"]
        tot["trainable"] += r["trainable"]
        lines.append(f"{name:<24}{r['total']:>14,}{r['trainable']:>14,}")
    lines.append(f"{'TOTAL':<24}{tot['total']:>14,}{tot['trainable']:>14,}")
    return "\n".join(lines)
