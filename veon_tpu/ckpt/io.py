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


def find_latest(directory: str) -> Optional[str]:
    """mmcv find_latest_checkpoint equivalent for --auto-resume."""
    steps = list_checkpoints(directory)
    if not steps:
        return None
    return steps[-1][1]


def list_checkpoints(directory: str):
    """All step_<n> checkpoints under directory, sorted by step — the
    `tools/dist_test_all.sh` epoch-sweep enumeration."""
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
    return sorted(steps)
