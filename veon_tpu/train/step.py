"""Training step: AdamW + grad-clip + warmup, stage-2 freezing, EMA, and
SPMD data parallelism with cross-replica BatchNorm.

Replaces the reference's mmcv EpochBasedRunner + MMDistributedDataParallel +
hooks (`mmdet3d/apis/train.py:180-327`, `core/hook/ema.py`,
`core/hook/syncbncontrol.py`): one jit/shard_map-compiled step where the
gradient all-reduce is a psum over the `batch` mesh axis (ICI collective) and
BatchNorm batch stats are averaged with the same axis name (the SyncBN
equivalent — SyncbnControlHook converts at epoch 0, so we sync from step 0).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs.base import LossConfig, VeonConfig
from ..model.veon import PER_CAMERA_OUTPUTS, VeonModel
from .losses import occupancy_loss


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    step: jnp.ndarray
    ema_updates: jnp.ndarray


STAGE2_FROZEN_PREFIXES = ("depth", "side_adapter", "clip_visual", "rec_head")
# CLIP towers fully frozen in stage 2. The config marks the visual
# positional embedding trainable (frozen_exclude=["positional_embedding"],
# san_config.py:46) but the stage-2 forward runs the whole CLIP extractor /
# side adapter / rec-head block under torch.no_grad
# (san_in_veon_temporal.py:123-139), so it never receives a gradient and
# never moves — the EFFECTIVE trainable set is hsa/lift_fusion/alignnet
# only. VeonModel mirrors the no_grad boundary with stop_gradient at
# train=True, which also lets XLA drop the tower backward entirely.
# Detector-level freeze of depth + side adapter: veon_temporal.py:88-96.


def stage2_trainable(path: Tuple[str, ...]) -> bool:
    top = path[0]
    if top in STAGE2_FROZEN_PREFIXES:
        return False
    return True  # hsa, lift_fusion, alignnet


def trainable_mask(params, predicate: Callable[[Tuple[str, ...]], bool]):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path):
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        return "train" if predicate(keys) else "frozen"

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 1e-2,
    warmup_iters: int = 200,
    warmup_ratio: float = 1e-3,
    max_norm: float = 5.0,
    labels=None,
    accum_steps: int = 1,
):
    """AdamW(lr 1e-4, wd 1e-2) + global-norm clip 5 + linear warmup
    (configs/veon/...py:244-251).

    accum_steps > 1 wraps the chain in optax.MultiSteps (gradient
    accumulation): the HBM-bound per-chip batch stays 1 (NOTES.md: B=2
    OOMs) while the effective batch grows k-fold — an axis the reference
    lacks (it scales batch only by adding GPUs). Grads are averaged over
    the k micro-steps, clip/warmup apply to the averaged update.
    """
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(lr * warmup_ratio, lr, warmup_iters),
            optax.constant_schedule(lr),
        ],
        [warmup_iters],
    )
    inner = optax.chain(
        optax.clip_by_global_norm(max_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    if labels is not None:
        inner = optax.multi_transform(
            {"train": inner, "frozen": optax.set_to_zero()}, labels
        )
    if accum_steps > 1:
        inner = optax.MultiSteps(inner, every_k_schedule=accum_steps)
    return inner


def ema_decay(updates: jnp.ndarray, decay: float = 0.999) -> jnp.ndarray:
    """MEGVII EMA ramp (`core/hook/ema.py:44`): decay * (1 - exp(-x/2000))."""
    return decay * (1.0 - jnp.exp(-updates / 2000.0))


def ema_update(ema_tree, new_tree, d):
    return jax.tree_util.tree_map(lambda e, p: e * d + (1.0 - d) * p, ema_tree, new_tree)


def ema_step_fields(state, new_opt_state):
    """(effective_decay, new_ema_updates) for one step() call, gated on the
    optimizer having APPLIED a real update: under optax.MultiSteps (gradient
    accumulation) the mid-accumulation micro-steps leave params untouched,
    and the MEGVII ramp/horizon must count optimizer updates, not
    micro-steps — otherwise accum_steps=k silently divides the EMA horizon
    by k. mini_step == 0 right after MultiSteps applies the averaged update;
    plain chains have no mini_step and always count."""
    ms = getattr(new_opt_state, "mini_step", None)
    applied = (jnp.float32(1.0) if ms is None
               else (ms == 0).astype(jnp.float32))
    upd = state.ema_updates + applied
    d = ema_decay(upd)
    # applied=0 -> decay 1.0 (EMA and ramp untouched); applied=1 -> ramp decay
    return 1.0 - applied * (1.0 - d), upd


def create_train_state(
    model: VeonModel, variables, tx, init_updates: int = 10560
) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        step=jnp.zeros((), jnp.int32),
        ema_updates=jnp.asarray(init_updates, jnp.float32),
    )


def _gather_cams(outputs, metas, cam_axis: str):
    """Reassemble the full-camera view for the loss under camera sharding.

    The distillation loss couples cameras (per-camera inverse-frequency
    weights normalized by the cross-camera point total,
    `occ3d_nuscenes.py:449-508`), so it must see ALL cameras: all_gather the
    per-camera output leaves and meta leaves over the cam mesh axis — they
    are (N_local, h, w, P)-sized, a negligible collective next to the lift
    grid psum."""
    outputs = dict(outputs)
    for k in PER_CAMERA_OUTPUTS:
        if k in outputs:
            outputs[k] = jax.lax.all_gather(outputs[k], cam_axis, axis=1,
                                            tiled=True)
    metas = dict(metas)
    for k in ("intrins", "post_rots", "post_trans"):
        metas[k] = jax.lax.all_gather(metas[k], cam_axis, axis=2, tiled=True)
    for k in ("cam2camego", "camego2global"):
        if k in metas:
            metas[k] = jax.lax.all_gather(metas[k], cam_axis, axis=1,
                                          tiled=True)
    return outputs, metas


def make_train_step(
    model: VeonModel,
    tx,
    cfg: VeonConfig,
    membership: np.ndarray,
    mesh: Optional[Mesh] = None,
    cam_axis: Optional[str] = None,
):
    """Build the stage-2 train step.

    batch: imgs (B,F,N,H,W,3), depth (B,F,N,H/2,W/2), metas dict,
      voxel_semantics (B,X,Y,Z), mask_camera (B,X,Y,Z), ov_weight, epoch.

    With a mesh, the step runs under shard_map over the `batch` axis: inputs
    batch-sharded, params replicated, grads psum-averaged, BN stats synced.

    With `cam_axis` (requires a 2D mesh ("batch", cam_axis) and a model
    built with cam_axis_name=cam_axis), the camera ring additionally shards
    over the second mesh axis — 2D (data x model) parallelism the reference
    lacks (its only axis is DDP, `apis/train.py:186-205`). Per-chip tower
    activation memory drops ~cam_shards-fold, buying resolution/temporal
    headroom beyond the B=1-per-chip HBM limit. The batch's metas must come
    from `serve.camshard.prepare_camshard_metas` (pinned full-rig
    sensor2keyegos).
    """
    image_hw = cfg.data.input_size
    axis = "batch" if mesh is not None else None
    if cam_axis is not None:
        assert mesh is not None and cam_axis in mesh.axis_names, cam_axis
        assert model.cam_axis_name == cam_axis, (
            "build the model with cam_axis_name matching the step's cam_axis")

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        # cfg.data.raw_uint8: the loader shipped post-aug uint8 frames;
        # normalize in-graph (bit-exact twin of the host normalizers, XLA
        # fuses it into the first conv — 4x less H2D/pickle per batch)
        imgs = batch["imgs"]
        if cfg.data.raw_uint8:
            from ..data.transforms import normalize_in_graph

            imgs = normalize_in_graph(imgs, "clipsan")
        # depth source priority: precomputed metric depth ("depth" from the
        # dryrun / "depth_preds" from the disk cache) else run the frozen
        # depth tower on "depth_imgs" (veon_temporal.py:139-144)
        if "depth" in batch:
            depth = batch["depth"]
        elif "depth_preds" in batch:
            depth = batch["depth_preds"]
        else:
            depth_imgs = batch["depth_imgs"]
            if cfg.data.raw_uint8:
                depth_imgs = normalize_in_graph(
                    depth_imgs, cfg.data.depth_norm_method)
            depth = jax.lax.stop_gradient(
                model.apply(variables, depth_imgs,
                            method=type(model).estimate_depth)
            )
        outputs, mutated = model.apply(
            variables, imgs, depth, batch["metas"],
            batch["ov_weight"], train=True, mutable=["batch_stats"],
        )
        loss_metas = batch["metas"]
        if cam_axis is not None:
            outputs, loss_metas = _gather_cams(outputs, loss_metas, cam_axis)
        losses = occupancy_loss(
            outputs, batch["voxel_semantics"], batch["mask_camera"],
            loss_metas, batch["ov_weight"], membership, cfg.grid,
            image_hw, batch["epoch"], cfg.loss,
        )
        total = sum(losses.values())
        return total, (losses, mutated["batch_stats"])

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        if cam_axis is not None:
            # Loss/stats are already identical across the cam axis (computed
            # from gathered outputs / psum'd voxel grids). Gradients: every
            # backward path from the (replicated) loss to a per-camera tower
            # param crosses exactly ONE cam-axis collective — the lift grid
            # psum or the output all_gather — and under shard_map's full-
            # manual mode (check_rep=False) both transpose to a SUM of the S
            # shards' identical cotangents, i.e. each shard's grad is
            # S x (its own cameras' contribution). Replicated-stage params
            # (alignnet/heads) cross none: grad = 1 x total, identical on
            # every shard. pmean is exact for BOTH cases at once:
            #   pmean(S * contrib_s) = sum_s contrib_s = total
            #   pmean(total)         = total
            # (verified to delta-level by
            # test_camshard_2d_mesh_train_step_agreement; a wrong combine is
            # an exact S x scale error there).
            grads = jax.lax.pmean(grads, cam_axis)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            losses = jax.lax.pmean(losses, axis)
            total = jax.lax.pmean(total, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d, ema_upd = ema_step_fields(state, new_opt)
        state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=ema_update(state.ema_params, new_params, d),
            ema_batch_stats=ema_update(state.ema_batch_stats, new_stats, d),
            step=state.step + 1,
            ema_updates=ema_upd,
        )
        losses["loss_total"] = total
        return state, losses

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from jax.experimental.shard_map import shard_map

    REPLICATED_KEYS = ("ov_weight", "epoch")
    # leaves that additionally shard the camera axis under cam_axis (metas
    # laid out (B, F, N, ...) vs (B, N, ...) — serve/camshard.py convention)
    CAM_AXIS2_KEYS = ("imgs", "depth", "depth_imgs", "depth_preds",
                      "sensor2egos", "ego2globals", "intrins", "post_rots",
                      "post_trans", "sensor2keyegos")
    CAM_AXIS1_KEYS = ("cam2camego", "camego2global")

    def batch_specs(batch):
        """Batch-sharded leaves except globally-replicated scalars/weights."""

        def spec(path, _leaf):
            keys = [k.key if hasattr(k, "key") else str(k) for k in path]
            top = keys[0]
            leaf_key = keys[-1]
            if top in REPLICATED_KEYS:
                return P()
            if cam_axis is not None:
                if leaf_key in CAM_AXIS2_KEYS:
                    return P("batch", None, cam_axis)
                if leaf_key in CAM_AXIS1_KEYS:
                    return P("batch", cam_axis)
            return P("batch")

        return jax.tree_util.tree_map_with_path(spec, batch)

    cache = {}

    def sharded_step(state, batch):
        key = jax.tree_util.tree_structure(batch)
        if key not in cache:
            sm = shard_map(
                step, mesh=mesh,
                in_specs=(P(), batch_specs(batch)),
                out_specs=(P(), P()),
                check_rep=False,
            )
            cache[key] = jax.jit(sm, donate_argnums=(0,))
        if jax.process_count() > 1:
            # multi-host: each process holds its local batch rows; assemble
            # global jax.Arrays before the jit (state is replicated P())
            from .distributed import host_local_batch

            batch = host_local_batch(batch, mesh, batch_specs(batch))
            state = host_local_batch(
                state, mesh, jax.tree_util.tree_map(lambda _: P(), state))
        return cache[key](state, batch)

    return sharded_step
