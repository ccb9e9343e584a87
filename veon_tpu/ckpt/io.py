"""Orbax checkpoint save/load + resume (the mmcv CheckpointHook /
runner.resume() equivalent, `apis/train.py:310-315`, default_runtime.py:1).

Layout: <dir>/step_<n>/ holds the full TrainState pytree (params, batch
stats, optimizer, EMA shadow, counters) — EMA travels with the checkpoint
instead of a separate epoch_N_ema.pth.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Any,
                    next_epoch: Optional[int] = None) -> str:
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    _checkpointer().save(path, jax.device_get(state), force=True)
    if next_epoch is not None:
        # exact-epoch resume marker (mmcv runner.resume() stores epoch in
        # the .pth meta; orbax pytrees don't carry scalars conveniently, so
        # a sidecar file records "the next epoch to run"). Written AFTER the
        # tree save so a torn save can't point past real data.
        with open(os.path.join(path, "NEXT_EPOCH"), "w") as f:
            f.write(str(int(next_epoch)))
    return path


def checkpoint_next_epoch(path: str) -> Optional[int]:
    """Exact resume epoch recorded by save_checkpoint, or None for
    checkpoints from before the marker existed (callers fall back to the
    step//steps_per_epoch estimate)."""
    marker = os.path.join(os.path.abspath(path), "NEXT_EPOCH")
    if os.path.isfile(marker):
        with open(marker) as f:
            return int(f.read().strip())
    return None


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    restore_args = None
    if target is not None:
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    return _checkpointer().restore(os.path.abspath(path), item=target,
                                   restore_args=restore_args)


def publish_checkpoint(path: str, out_path: str, ema: bool = False) -> str:
    """Publish-ready checkpoint (`tools/model_converters/publish_model.py`
    counterpart): strip the training-only leaves (optimizer state, EMA
    shadow, counters) down to {params, batch_stats}, save, and stamp the
    directory name with the first 8 hex chars of a deterministic SHA-256
    over the saved tree (leaf paths + raw array bytes — the content hash
    the reference derives from the .pth file). With ema=True the EMA
    shadow is published AS the params (the reference's epoch_N_ema.pth).
    Returns the final '<out_path>-<sha8>' directory."""
    import hashlib

    state = load_checkpoint(path)
    if ema and "ema_params" not in state:
        raise ValueError(
            f"{path} carries no EMA shadow (already published / stripped) — "
            "publish without ema=True")
    pub = {
        "params": state["ema_params" if ema else "params"],
        "batch_stats": state["ema_batch_stats" if ema else "batch_stats"],
    }
    h = hashlib.sha256()
    for kp, leaf in sorted(
            jax.tree_util.tree_flatten_with_path(pub)[0],
            key=lambda kv: jax.tree_util.keystr(kv[0])):
        arr = np.asarray(leaf)
        h.update(jax.tree_util.keystr(kp).encode())
        h.update(str(arr.dtype).encode() + str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    final = f"{os.path.abspath(out_path).rstrip(os.sep)}-{h.hexdigest()[:8]}"
    _checkpointer().save(final, pub, force=True)
    return final


def find_latest(directory: str) -> Optional[str]:
    """mmcv find_latest_checkpoint equivalent for --auto-resume."""
    steps = list_checkpoints(directory)
    if not steps:
        return None
    return steps[-1][1]


def list_checkpoints(directory: str, min_step: Optional[int] = None,
                     max_step: Optional[int] = None):
    """All step_<n> checkpoints under directory, sorted by step — the
    `tools/dist_test_all.sh` epoch-sweep enumeration; min/max_step bound
    the sweep like the script's $start_epoch/$end_epoch arguments."""
    if not os.path.isdir(directory):
        return []
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_")[1]),
                              os.path.join(directory, name)))
            except ValueError:
                pass
    return sorted(s for s in steps
                  if (min_step is None or s[0] >= min_step)
                  and (max_step is None or s[0] <= max_step))
