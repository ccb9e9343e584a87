"""Stage-1 depth pretraining (`models/detectors/veon_depth_pretrain.py`).

Trains only the LoRA adapters + DPT head of DepthAnythingV2 against LiDAR
depth (SILog + 0.05 * bin-CE, `view_transformer_raw.py:498-535`), with the
DINOv2 trunk frozen (`_freeze_stages`, veon_depth_pretrain.py:82-88).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs.base import GridConfig, LossConfig, VeonConfig
from ..lift.lss import min_pool_depth
from ..nn.dpt import DepthAnythingV2
from .losses import depth_pretrain_loss
from .step import (TrainState, ema_step_fields, ema_update, make_optimizer,
                   trainable_mask)


def depth_trainable(path: Tuple[str, ...]) -> bool:
    """LoRA params + the whole DPT head train; the DINOv2 trunk is frozen."""
    if path[0] == "depth_head":
        return True
    return path[-1] in ("lora_A", "lora_B")


def zoe_trainable(path: Tuple[str, ...]) -> bool:
    """ZoeDepth-NK stage-1 rule (the reference freezes params whose name has
    'pretrain' but not 'lora', `veon_depth_pretrain.py:82-88`): the BEiT
    trunk (under core/pretrained) is frozen except its LoRA adapters; the
    MiDaS scratch decoder, readout projections, and the metric-bins head
    all train."""
    if path[-1] in ("lora_A", "lora_B"):
        return True
    return "pretrained" not in path


def make_depth_pretrain_step(model: DepthAnythingV2, tx, grid: GridConfig,
                             cfg: LossConfig, pred_downsample: int = 8,
                             gt_downsample: int = 16,
                             norm_in_graph: str = None):
    """One stage-1 step. batch: depth_imgs (B,F,N,Hd,Wd,3), gt_depth
    (B,N,H,W) at the full input resolution.

    The reference min-pools pred by 8 and GT by 16 before the loss
    (`veon_depth_pretrain.py:136-137`); pred comes out at H/2 x W/2 so both
    land on the same grid.

    `norm_in_graph`: normalizer name when the loader ships raw uint8 frames
    (DataConfig.raw_uint8) — bit-exact in-graph twin of the host pipeline.
    """

    def loss_fn(params, batch):
        imgs = batch["depth_imgs"][:, 0]  # current frame
        if norm_in_graph is not None:
            from ..data.transforms import normalize_in_graph

            imgs = normalize_in_graph(imgs, norm_in_graph)
        B, N = imgs.shape[:2]
        pred = model.apply({"params": params}, imgs.reshape((-1,) + imgs.shape[2:]))
        h2, w2 = batch["gt_depth"].shape[-2] // 2, batch["gt_depth"].shape[-1] // 2
        from ..ops.resize import resize_bilinear

        if pred.shape[-2:] != (h2, w2):
            pred = resize_bilinear(pred[..., None], (h2, w2), align_corners=True)[..., 0]
        pred = pred.reshape(B, N, h2, w2)
        pred_ds = min_pool_depth(pred, pred_downsample)
        gt_ds = min_pool_depth(batch["gt_depth"], gt_downsample)
        losses = depth_pretrain_loss(pred_ds, gt_ds, grid, cfg)
        return sum(losses.values()), losses

    def step(state: TrainState, batch):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d, ema_upd = ema_step_fields(state, new_opt)
        state = state.replace(
            params=new_params, opt_state=new_opt,
            ema_params=ema_update(state.ema_params, new_params, d),
            step=state.step + 1, ema_updates=ema_upd,
        )
        losses["loss_total"] = total
        return state, losses

    return jax.jit(step, donate_argnums=(0,))
