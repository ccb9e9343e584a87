"""Chip-timed eval loop: `veon_tpu test`'s protocol on a synthetic shard.

The reference measures inference fps inside its test loop (`tools/test.py:
247-266` via `apis/test.py:12` single_gpu_test: upload -> forward -> grid
readback per sample, then `occ_metrics.py:121-147` hist/mIoU at the end).
Serving and training are chip-timed elsewhere (bench.py, NOTES); this tool
anchors the remaining production loop — `veon_tpu test` — with three legs:

1. device-path: batches preloaded in host RAM, then per-frame
   H2D + full_forward + fusion-rule class-grid readback (the inner loop of
   single_gpu_test, loader excluded). Per-frame timing, median reported —
   unlike bench.py's on-device lax.scan, every frame here pays the real
   dispatch + readback that the eval protocol requires. 1b: the same pass
   overlapped (evaluate_occ's pipeline=2 — dispatch N+1 before fetching N),
   isolating how much dispatch + transfer the async pipeline hides.
2. e2e: the same shard through the real DataLoader via `evaluate_occ`
   (exactly what `veon_tpu test` runs; loader + device path overlapped only
   by the loader's worker prefetch).
3. hist: `dataset.evaluate` over the accumulated grids (confusion hist +
   mIoU), ms/frame — the post-loop metric cost.

Usage: python -m veon_tpu.utils.eval_bench [--frames 12] [--preset veon_b]
       [--dtype bfloat16] [--workers 2] [--mode thread]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import functools
import json
import shutil
import tempfile
import time

import numpy as np


def run(n_frames: int = 12, preset: str = "veon_b", dtype: str = "bfloat16",
        workers: int = 2, mode: str = "thread", keep=None,
        raw_uint8: bool = False, pipeline: int = 1):
    import jax
    import jax.numpy as jnp

    from ..cli.main import _build_model_and_params
    from ..configs import presets
    from ..data.loader import DataLoader
    from ..data.nuscenes import NuScenesOccDataset, load_infos
    from ..data.transforms import normalize_in_graph
    from ..model.veon import VeonModel, fusion_rule
    from ..nn import text as text_mod
    from ..train.loop import evaluate_occ
    from .loader_bench import make_frames

    fn = getattr(presets, preset)
    try:
        cfg = fn(compute_dtype=dtype)
    except TypeError:  # tiny/fixture presets own their dtype knob
        cfg = fn()
    root = keep or tempfile.mkdtemp(prefix="veon_eval_bench_")
    try:
        hw = tuple(cfg.data.src_size) if hasattr(cfg.data, "src_size") else (900, 1600)
        pkl = make_frames(root, n_frames, hw=hw, grid_shape=cfg.grid.size)
        ds = NuScenesOccDataset(
            infos=load_infos(pkl), data_cfg=cfg.data, grid=cfg.grid,
            num_temporal=cfg.num_temporal, is_train=False, data_root=root,
            load_lidar_depth=False, raw_uint8=raw_uint8,
        )
        loader = DataLoader(ds, batch_size=1, shuffle=False,
                            num_workers=workers, drop_last=False, mode=mode)

        model, variables, ovw, refl, _extras = _build_model_and_params(cfg)
        membership = text_mod.merge_matrix(refl)

        # identical graph to cmd_test's _predict (cli/main.py):
        @functools.partial(jax.jit)
        def _predict(variables, imgs, depth_imgs, metas, ovw):
            if raw_uint8:
                imgs = normalize_in_graph(imgs, "clipsan")
                depth_imgs = normalize_in_graph(
                    depth_imgs, cfg.data.depth_norm_method)
            out = model.apply(variables, imgs, depth_imgs, metas, ovw,
                              train=False, method=VeonModel.full_forward)
            merged = text_mod.merge_classes_max(
                out["sem_occ_raw"], membership, axis=-1)
            return fusion_rule(merged, out["bin_occ"])

        def predict(imgs, depth_imgs, metas, ovw):
            return _predict(variables, imgs, depth_imgs, metas, ovw)

        dev = jax.devices()[0]
        variables = jax.device_put(variables, dev)
        jax.block_until_ready(variables)

        # --- leg 1: device path (loader excluded) -----------------------
        host_batches = []
        for batch in loader:
            batch.pop("token", None)
            host_batches.append(batch)
        b0 = host_batches[0]

        def frame_once(batch):
            imgs = jax.device_put(jnp.asarray(batch["imgs"]), dev)
            dep = jax.device_put(jnp.asarray(
                batch.get("depth_imgs", batch.get("depth_preds"))), dev)
            metas = jax.device_put(
                jax.tree_util.tree_map(jnp.asarray, batch["metas"]), dev)
            pred = predict(imgs, dep, metas, ovw)
            return np.asarray(jax.device_get(pred)).astype(np.uint8)

        t0 = time.perf_counter()
        frame_once(b0)  # compile
        compile_s = time.perf_counter() - t0

        per_frame, results = [], []
        for batch in host_batches:
            t0 = time.perf_counter()
            pred = frame_once(batch)
            per_frame.append(time.perf_counter() - t0)
            results.extend(list(pred))
        med = sorted(per_frame)[len(per_frame) // 2]
        device_fps = 1.0 / med

        # --- leg 1b: overlapped device path (evaluate_occ's pipeline=2:
        # dispatch N+1 before fetching N; H2D/D2H hide under compute) ------
        import collections

        inflight = collections.deque()
        t0 = time.perf_counter()
        for batch in host_batches:
            imgs = jax.device_put(jnp.asarray(batch["imgs"]), dev)
            dep = jax.device_put(jnp.asarray(
                batch.get("depth_imgs", batch.get("depth_preds"))), dev)
            metas = jax.device_put(
                jax.tree_util.tree_map(jnp.asarray, batch["metas"]), dev)
            inflight.append(predict(imgs, dep, metas, ovw))
            if len(inflight) >= 2:
                np.asarray(jax.device_get(inflight.popleft()))
        while inflight:
            np.asarray(jax.device_get(inflight.popleft()))
        pipe_fps = len(host_batches) / (time.perf_counter() - t0)

        # --- leg 3: hist/mIoU over the accumulated grids ----------------
        t0 = time.perf_counter()
        metrics = ds.evaluate(results)
        hist_ms = (time.perf_counter() - t0) / len(results) * 1e3

        # --- leg 2: e2e, exactly `veon_tpu test` ------------------------
        # fps comes from the loop's own "inference done" line (loader +
        # device path only); the wall clock around evaluate_occ also pays
        # dataset.evaluate, which leg 3 reports separately — including it
        # here would understate the loop as the shard grows.
        lines = []
        t0 = time.perf_counter()
        evaluate_occ(predict, loader, ovw, log_fn=lines.append,
                     pipeline=pipeline)
        e2e_s = time.perf_counter() - t0
        import re

        m = re.search(r"in ([0-9.]+)s", lines[0]) if lines else None
        e2e_fps = n_frames / float(m.group(1)) if m else n_frames / e2e_s

        out = {
            "metric": f"{preset}_eval_loop_frames_per_sec",
            "value": round(device_fps, 3),
            "unit": "frames/s",
            "detail": {
                "device_path_ms_per_frame": round(med * 1e3, 1),
                "device_path_fps": round(device_fps, 3),
                "pipelined_fps": round(pipe_fps, 3),
                "e2e_fps": round(e2e_fps, 3),
                "e2e_inference_line": lines[0] if lines else "",
                "hist_ms_per_frame": round(hist_ms, 2),
                "miou": round(float(metrics.get("mIoU", 0.0)), 4),
                "n_frames": n_frames,
                "dtype": dtype,
                "workers": workers,
                "mode": mode,
                "raw_uint8": raw_uint8,
                "pipeline": pipeline,
                "compile_s": round(compile_s, 1),
            },
        }
        print(json.dumps(out))
        return out
    finally:
        if keep is None:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--preset", default="veon_b")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--mode", choices=("thread", "process"), default="thread")
    ap.add_argument("--keep", default=None)
    ap.add_argument("--raw-uint8", action="store_true",
                    help="uint8 frames + in-graph normalization (4x less "
                         "H2D; bit-exact vs the normalized-float path)")
    ap.add_argument("--pipeline", type=int, default=1,
                    help="in-flight predictions in the e2e leg (evaluate_occ)")
    args = ap.parse_args()
    run(args.frames, args.preset, args.dtype, args.workers, args.mode,
        args.keep, raw_uint8=args.raw_uint8, pipeline=args.pipeline)
