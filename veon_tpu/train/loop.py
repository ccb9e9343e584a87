"""Epoch-based training/eval loops + depth-cache writer.

Replaces the mmcv EpochBasedRunner + hooks stack (`apis/train.py:180-359`,
`tools/test.py`, `models/detectors/veon_depth_cache.py`): plain python
orchestration around jit-compiled steps, per-epoch orbax checkpoints,
text logging every `log_interval` iters.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt.io import find_latest, load_checkpoint, save_checkpoint


def _to_device(batch):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, batch
    )


def prefetch_to_device(batches, size: int = 2):
    """H2D double-buffering: keep `size` batches already device_put ahead of
    consumption, so the next batch's host->device transfer overlaps the
    current step's compute (jax.device_put is async — no extra thread
    needed). The flax.jax_utils.prefetch_to_device counterpart for a single
    device; the torch counterpart is the CUDA pin_memory+non_blocking copy.
    """
    import collections

    queue = collections.deque()
    for b in batches:
        queue.append(_to_device(b))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def _truncate_temporal(batch):
    """Use only the current frame (the SequentialControlHook equivalent,
    `core/hook/sequentialcontrol.py:9-27`: with_prev stays False until the
    configured epoch)."""
    out = dict(batch)
    for k in ("imgs", "depth_imgs", "depth_preds"):
        if k in out:
            out[k] = out[k][:, :1]
    metas = dict(out["metas"])
    for k in ("sensor2egos", "ego2globals", "intrins", "post_rots", "post_trans"):
        metas[k] = metas[k][:, :1]
    metas["prev_lidarego2global"] = metas["prev_lidarego2global"][:, :1] * 0 + np.eye(4, dtype=np.float32)
    out["metas"] = metas
    return out


def train_epochs(
    state,
    step_fn,
    loader,
    ov_weight,
    max_epochs: int = 24,
    start_epoch: int = 0,
    work_dir: str = "work_dir",
    log_interval: int = 50,
    temporal_start_epoch: int = 0,
    log_fn: Callable[[str], None] = print,
    writer=None,  # optional utils.logging.MetricWriter
):
    """Stage-2 training loop. The loss's priority-ignorance schedule gets the
    epoch through the batch (the reference injects it via the EMA hook,
    `core/hook/ema.py:99-103`); previous frames engage at
    `temporal_start_epoch` (SequentialControlHook)."""
    os.makedirs(work_dir, exist_ok=True)
    for epoch in range(start_epoch, max_epochs):
        loader.set_epoch(epoch)
        t0 = time.perf_counter()

        def prepped():
            for batch in loader:
                batch.pop("token", None)
                batch.pop("gt_depth", None)
                batch.pop("mask_lidar", None)
                if epoch < temporal_start_epoch:
                    batch = _truncate_temporal(batch)
                batch["ov_weight"] = ov_weight
                batch["epoch"] = np.asarray(epoch, np.int32)
                yield batch

        for it, batch in enumerate(prefetch_to_device(prepped(), size=2)):
            state, losses = step_fn(state, batch)
            if (it + 1) % log_interval == 0:
                losses = jax.device_get(losses)
                dt = (time.perf_counter() - t0) / (it + 1)
                msg = ", ".join(f"{k}: {float(v):.4f}" for k, v in sorted(losses.items()))
                log_fn(f"epoch {epoch + 1} iter {it + 1}/{len(loader)} "
                       f"({dt:.2f}s/iter) {msg}")
                if writer is not None:
                    scalars = {k: float(v) for k, v in losses.items()}
                    scalars["sec_per_iter"] = dt
                    writer.write(scalars, int(jax.device_get(state.step)), epoch)
        save_checkpoint(work_dir, int(jax.device_get(state.step)), state,
                        next_epoch=epoch + 1)
        log_fn(f"saved checkpoint for epoch {epoch + 1}")
    return state


def evaluate_occ(
    predict_fn,
    loader,
    ov_weight,
    log_fn: Callable[[str], None] = print,
    pipeline: int = 1,
):
    """Occ3D eval loop (`tools/test.py` + `apis/test.py:12` single_gpu_test):
    per sample, run the fusion-rule prediction and hand the (X, Y, Z) class
    grids to dataset.evaluate.

    `pipeline` is the number of in-flight predictions: jax dispatch is
    async, so dispatching frame N+1 before fetching frame N's class grid
    overlaps the next frame's host prep + H2D (and this frame's D2H) with
    device compute — prefetch_to_device's D2H-side twin. pipeline=1 is the
    strictly serial upload->forward->readback protocol and the DEFAULT:
    on the tunneled-TPU backend all transfers serialize through one relay
    connection, and two in-flight frames measured ~15% SLOWER than serial
    (NOTES round 4, eval_bench legs 1 vs 1b) — raise it only on hosts with
    DMA-attached devices where H2D/D2H genuinely overlap compute.
    Results stay in loader order (FIFO drain)."""
    import collections

    depth = max(1, int(pipeline))
    results = []
    inflight = collections.deque()

    def _drain_one():
        pred = np.asarray(jax.device_get(inflight.popleft())).astype(np.uint8)
        results.extend(list(pred))
        return pred.shape[0]

    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        batch.pop("token", None)
        inflight.append(predict_fn(
            _to_device(batch["imgs"]),
            _to_device(batch.get("depth_imgs", batch.get("depth_preds"))),
            _to_device(batch["metas"]),
            ov_weight,
        ))
        if len(inflight) >= depth:
            n += _drain_one()
    while inflight:
        n += _drain_one()
    dt = time.perf_counter() - t0
    log_fn(f"inference done: {n} samples in {dt:.1f}s ({n / max(dt, 1e-9):.2f} fps)")
    return loader.dataset.evaluate(results)


def write_depth_cache(
    depth_fn,
    loader,
    cache_dir: str,
    cam_names,
    log_fn: Callable[[str], None] = print,
    pipeline: int = 1,
):
    """Depth-cache generation (`veon_depth_cache.py:120-168`): one pass over
    the train set saving per-camera metric depth keyed token-CAM; idempotent
    (skips existing files, `:153-154`). Like evaluate_occ, `pipeline` keeps
    N predictions in flight so the next batch's H2D + this batch's D2H hide
    under device compute — serial by default (see evaluate_occ: overlapped
    frames measured slower through the tunneled backend's relay)."""
    import collections

    os.makedirs(cache_dir, exist_ok=True)
    n_saved = 0
    inflight = collections.deque()

    def _batches():
        for batch in loader:
            inflight.append(
                (batch["token"], depth_fn(_to_device(batch["depth_imgs"]))))
            if len(inflight) >= max(1, pipeline):
                yield inflight.popleft()
        while inflight:
            yield inflight.popleft()

    for tokens, pending in _batches():
        depth = np.asarray(jax.device_get(pending))
        for bi, token in enumerate(tokens):
            d = os.path.join(cache_dir, token[:2], token)
            os.makedirs(d, exist_ok=True)
            for ci, cam in enumerate(cam_names):
                path = os.path.join(d, f"{token}-{cam}.npy")
                if os.path.exists(path):
                    continue
                np.save(path, depth[bi, 0, ci])
                n_saved += 1
    log_fn(f"depth cache: wrote {n_saved} tensors to {cache_dir}")
    return n_saved
