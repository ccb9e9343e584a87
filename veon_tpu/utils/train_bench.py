"""Stage-2 training-step benchmark + rematerialization-policy A/B.

The reference measures only inference speed (`tools/analysis_tools/
benchmark.py`); its training cost appears solely as mmcv's per-iter `time`
log line, and its activation-memory lever is all-or-nothing
`torch.utils.checkpoint` over whole trunk blocks (`clip_utils/visual.py`,
`with_cp` in `align_net_occ3d.py`). XLA's `jax.checkpoint` policies give a
middle ground — save chosen intermediates (e.g. matmul outputs) and
recompute only the rest — so this tool measures, on the real chip at
production shapes (B=1, bf16, cached-depth regime like the reference's
`withdepthcache` configs):

  * ms/step per remat policy (full / dots_saveable /
    dots_with_no_batch_dims_saveable / none), same-process A/B;
  * the compile-reported HBM footprint per policy (temp/argument/output
    split) — including remat=False, which documents WHY remat is needed
    (backward wants ~21 GB vs 15.75 GB HBM);
  * the forward+loss-only time, splitting the step into fwd vs
    backward+optimizer;
  * a projected 24-epoch stage-2 wall-clock at the reference's 8-replica
    recipe scale (`README.md:153-236` trains 24 epochs on 8xV100 at
    B=1/GPU; nuScenes train = 28130 samples -> 3517 steps/epoch global).

    python -m veon_tpu.utils.train_bench --steps 6 \
        --policies true,dots_saveable,dots_with_no_batch_dims_saveable
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Optional

NUSC_TRAIN_SAMPLES = 28130  # nuScenes train split (create_infos count)
RECIPE_EPOCHS = 24          # stage-2 recipe, configs/veon/...py:252
RECIPE_REPLICAS = 8         # dist_train.sh 8xV100, README.md:157


def _parse_policy(tok: str):
    t = tok.strip().lower()
    if t in ("true", "full"):
        return True
    if t in ("false", "none"):
        return False
    return tok.strip()


def build_train_setup(preset: str = "veon_b", dtype: str = "bfloat16"):
    """Shared (cfg, batch, variables-on-CPU, membership) for every policy —
    init once, copy per policy (the step donates its state)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..cli.shapes import example_batch
    from ..configs import presets
    from ..model.veon import VeonModel
    from ..nn import text as text_mod

    cfg = getattr(presets, preset)()
    cfg = dataclasses.replace(
        cfg, compute_dtype=dtype,
        depth=dataclasses.replace(cfg.depth, use_lora=False))
    # cached-depth regime: metric depth comes from the batch (the
    # reference's withdepthcache configs skip the frozen tower in-step)
    imgs, depth, metas = example_batch(cfg, B=1)
    prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    rng = np.random.default_rng(7)
    ovw = jnp.asarray(rng.standard_normal(
        (len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    nx, ny, nz = cfg.grid.size
    batch = {
        "imgs": imgs, "depth": depth, "metas": metas,
        "voxel_semantics": jnp.asarray(
            rng.integers(0, 18, size=(1, nx, ny, nz)).astype(np.int32)),
        "mask_camera": jnp.ones((1, nx, ny, nz), jnp.int32),
        "ov_weight": ovw, "epoch": jnp.asarray(0, jnp.int32),
    }
    # init on the host CPU backend (seconds, vs duplicating the full TPU
    # compile) — callers device_put per policy
    model0 = VeonModel(cfg=cfg, remat=False)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(model0.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), imgs, depth, metas, ovw, train=True)
    membership = text_mod.merge_matrix(refl)
    return cfg, batch, variables, membership


def _mem_fields(compiled) -> Optional[dict]:
    try:
        m = compiled.memory_analysis()
        return {
            "temp_gb": round(m.temp_size_in_bytes / 2**30, 2),
            "arg_gb": round(m.argument_size_in_bytes / 2**30, 2),
            "out_gb": round(m.output_size_in_bytes / 2**30, 2),
        }
    except Exception as e:  # backend may not expose it through the tunnel
        return {"error": f"{type(e).__name__}: {e}"}


def measure_policy(cfg, batch, variables, membership, remat, steps: int = 6,
                   run: bool = True) -> dict:
    """Compile + time the full train step under one remat policy."""
    import jax
    import jax.numpy as jnp

    from ..model.veon import VeonModel
    from ..train.step import (create_train_state, make_optimizer,
                              make_train_step, stage2_trainable,
                              trainable_mask)

    model = VeonModel(cfg=cfg, remat=remat)
    labels = trainable_mask(variables["params"], stage2_trainable)
    tx = make_optimizer(labels=labels)
    v = jax.device_put(jax.tree_util.tree_map(jnp.copy, variables),
                       jax.devices()[0])
    state = create_train_state(model, v, tx)
    batch = jax.device_put(batch, jax.devices()[0])
    step = make_train_step(model, tx, cfg, membership, mesh=None)

    out = {"remat": str(remat)}
    t0 = time.perf_counter()
    try:
        lowered = step.lower(state, batch)
        compiled = lowered.compile()
    except Exception as e:
        out["compile_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return out
    out["compile_s"] = round(time.perf_counter() - t0, 1)
    out["memory"] = _mem_fields(compiled)
    if not run:
        return out
    try:
        state, losses = compiled(state, batch)
        first = float(losses["loss_total"])  # forces execution + readback
    except Exception as e:
        out["run_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return out
    assert jnp.isfinite(first), first
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        state, losses = compiled(state, batch)
        total = float(losses["loss_total"])
        times.append(time.perf_counter() - t0)
        assert jnp.isfinite(total), total
    times.sort()
    med = times[len(times) // 2]
    out.update(ms_per_step=round(med * 1e3, 1),
               ms_spread=[round(times[0] * 1e3, 1), round(times[-1] * 1e3, 1)],
               steps=steps)
    # 24-epoch projection at the reference recipe scale: 8 DP replicas at
    # B=1 each consume 8 samples/step -> 3517 steps/epoch; the DP psum rides
    # ICI and is dryrun-validated (MULTICHIP), unmeasured here (1 chip).
    steps_total = -(-NUSC_TRAIN_SAMPLES // RECIPE_REPLICAS) * RECIPE_EPOCHS
    out["projected_24ep_8chip_h"] = round(steps_total * med / 3600.0, 1)
    return out


def measure_forward_loss(cfg, batch, variables, membership, steps: int = 6
                         ) -> dict:
    """Loss forward only (no grad/optimizer): the fwd share of the step."""
    import jax
    import jax.numpy as jnp

    from ..model.veon import VeonModel
    from ..train.losses import occupancy_loss

    model = VeonModel(cfg=cfg, remat=False)  # remat is a backward-only knob
    image_hw = cfg.data.input_size

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, _ = model.apply(
            variables, batch["imgs"], batch["depth"], batch["metas"],
            batch["ov_weight"], train=True, mutable=["batch_stats"])
        losses = occupancy_loss(
            outputs, batch["voxel_semantics"], batch["mask_camera"],
            batch["metas"], batch["ov_weight"], membership, cfg.grid,
            image_hw, batch["epoch"], cfg.loss)
        return sum(losses.values())

    v = jax.device_put(variables, jax.devices()[0])
    batch = jax.device_put(batch, jax.devices()[0])
    params, stats = v["params"], v.get("batch_stats", {})
    fn = jax.jit(loss_fn)
    t0 = time.perf_counter()
    first = float(fn(params, stats, batch))
    compile_s = time.perf_counter() - t0
    assert jnp.isfinite(first), first
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        float(fn(params, stats, batch))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"ms_forward_loss": round(times[len(times) // 2] * 1e3, 1),
            "compile_s": round(compile_s - times[len(times) // 2], 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="veon_b")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--policies",
                    default="true,dots_saveable,dots_with_no_batch_dims_saveable")
    ap.add_argument("--compile-only-policies", default="false",
                    help="policies to compile for memory analysis but not run")
    ap.add_argument("--skip-forward", action="store_true")
    args = ap.parse_args()

    cfg, batch, variables, membership = build_train_setup(
        args.preset, args.dtype)
    rows = []
    if not args.skip_forward:
        fwd = measure_forward_loss(cfg, batch, variables, membership,
                                   args.steps)
        print(json.dumps({"leg": "forward_loss", **fwd}), flush=True)
        rows.append(fwd)
    for tok in filter(None, args.policies.split(",")):
        r = measure_policy(cfg, batch, variables, membership,
                           _parse_policy(tok), args.steps)
        print(json.dumps({"leg": "train_step", **r}), flush=True)
        rows.append(r)
    for tok in filter(None, args.compile_only_policies.split(",")):
        r = measure_policy(cfg, batch, variables, membership,
                           _parse_policy(tok), args.steps, run=False)
        print(json.dumps({"leg": "train_step_compile_only", **r}), flush=True)
        rows.append(r)


if __name__ == "__main__":
    main()
