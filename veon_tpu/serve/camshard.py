"""Camera-sharded SPMD serving: split the 6-camera ring over a device mesh.

A TPU-first scale-out axis with no reference counterpart (the reference
serves single-GPU; its only parallelism is training DP,
`mmdet3d/apis/train.py:186-205`): everything in the VEON graph before the
voxel pooling is per-camera independent — depth tower, CLIP extractor, side
adapter, rec head, HSA, lift fusion — so the tower stack shards cleanly over
a `("cam",)` mesh axis. The single cross-camera op, the LSS splat, becomes a
per-shard pool over the local cameras' points followed by ONE `psum` of the
pooled grid over ICI; the 3D stage (alignnet + heads, ~26 ms of the 137 ms
single-chip frame) then runs replicated. The psum happens on the FULL-res
(B, Z, Y, X, C) grid INSIDE the lift (`LSSLift.psum_axis`), before its
[2,2,2] ds max-pool — max does not commute with the cross-camera sum in
cells holding several cameras' mass — so the collective is the full-res
grid (~330 MB bf16 at production scale: a few ms of ICI time, small next
to the ~70 ms/shard tower savings at S=3). With the per-camera stack at
~110 ms/frame single-chip, the steady-state serving latency on an S-shard
mesh is ~110/S + 26 ms + the all-reduce — near-linear camera-parallel
latency scaling that data parallelism (which only helps throughput) cannot
provide.

Validated for numeric parity vs the single-device graph on a virtual CPU
mesh (tests/test_camshard.py); the same code runs unchanged on a real
multi-chip v5e slice.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..configs.base import VeonConfig
from ..geometry.frustum import sensor2keyego_chain
from ..lift.lss import LSSLift
from ..model.veon import PER_CAMERA_OUTPUTS, VOXEL_OUTPUTS, VeonModel

# metas leaves laid out (B, F, N, ...): shard the camera axis (2)
_CAM_AXIS2 = ("sensor2egos", "ego2globals", "intrins", "post_rots",
              "post_trans", "sensor2keyegos")
# metas leaves laid out (B, N, ...): shard axis 1
_CAM_AXIS1 = ("cam2camego", "camego2global")


def _build_lift(cfg: VeonConfig) -> LSSLift:
    return LSSLift.from_config(cfg)


@functools.lru_cache(maxsize=None)
def _jitted_chain():
    """One jitted dispatch for the full-rig keyego chain: the 2D-mesh train
    loop calls prepare_camshard_metas per BATCH (the anchor depends on each
    batch's rig/aug), so the ~15 small eager ops of the raw chain would
    otherwise be dispatched synchronously on the hot path every step."""
    return jax.jit(sensor2keyego_chain, static_argnums=(2, 3))


def prepare_camshard_metas(
    cfg: VeonConfig,
    metas: Dict[str, jnp.ndarray],
    num_shards: int,
    presort: bool = False,
) -> Dict[str, Any]:
    """Make a standard metas dict camera-shardable.

    * Pins `sensor2keyegos` computed from the FULL rig: the per-frame keyego
      anchor is the rig's cam-0 ego (`align_net_occ3d.py:328-352`), which a
      shard whose local cam 0 is a different physical camera cannot compute
      locally.
    * With `presort` (fixed-rig accelerate serving, F=1 only): runs
      `LSSLift.precompute_sorted` per camera shard and stacks the results,
      padding each shard's sorted stream to the longest with overflow ranks
      (rank == num_cells rows land in the pool kernel's sliced-off sentinel
      row, so padding is exact, not approximate).
    """
    metas = dict(metas)
    s2e = metas["sensor2egos"]
    B, F, N = s2e.shape[:3]
    if N % num_shards != 0:
        raise ValueError(
            f"{N} cameras not divisible by --cam-shards {num_shards}")
    metas["sensor2keyegos"] = _jitted_chain()(
        jnp.reshape(s2e, (B, F * N, 4, 4)),
        jnp.reshape(metas["ego2globals"], (B, F * N, 4, 4)), F, N)
    if not presort:
        metas.pop("lift_sorted", None)
        return metas
    if F != 1:
        raise ValueError("presorted lift applies to F=1 serving only")
    lift = _build_lift(cfg)
    num_cells = B * int(np.prod(cfg.grid.size))
    nl = N // num_shards
    pre = []
    for i in range(num_shards):
        sl = slice(i * nl, (i + 1) * nl)
        # fuse_ds_pool=False: shards' grids psum over the cam axis at FULL
        # resolution before the ds max-pool (max does not commute with the
        # cross-camera sum), so the fused-pool layout is invalid here
        pre.append(lift.precompute_sorted(
            metas["sensor2keyegos"][:, 0, sl], metas["intrins"][:, 0, sl],
            metas["post_rots"][:, 0, sl], metas["post_trans"][:, 0, sl],
            metas["bda"], fuse_ds_pool=False,
        ))
    p_max = max(p["order"].shape[0] for p in pre)

    def pad(x, fill):
        return jnp.pad(x, (0, p_max - x.shape[0]), constant_values=fill)

    metas["lift_sorted"] = {
        "order": jnp.stack([pad(p["order"], 0) for p in pre]),
        "rk_sorted": jnp.stack(
            [pad(p["rk_sorted"], num_cells) for p in pre]),
        "ranks": jnp.concatenate([p["ranks"] for p in pre], axis=1),
    }
    return metas


def shard_local_lift_sorted(metas: Dict[str, Any]) -> Dict[str, Any]:
    """Inside a shard_map body: unwrap this shard's block of the stacked
    per-shard presorted streams (`prepare_camshard_metas(presort=True)`
    stacks (S, P) arrays; each shard receives a (1, P) block)."""
    if "lift_sorted" not in metas:
        return metas
    metas = dict(metas)
    ls = metas["lift_sorted"]
    metas["lift_sorted"] = {"order": ls["order"][0],
                            "rk_sorted": ls["rk_sorted"][0],
                            "ranks": ls["ranks"]}
    return metas


def _meta_spec(key: str, leaf) -> P:
    if key == "lift_sorted":
        raise AssertionError("handled by caller")
    if key in _CAM_AXIS2:
        return P(None, None, "cam")
    if key in _CAM_AXIS1:
        return P(None, "cam")
    return P()


def metas_specs(metas: Dict[str, Any]) -> Dict[str, Any]:
    specs: Dict[str, Any] = {}
    for k, v in metas.items():
        if k == "lift_sorted":
            specs[k] = {"order": P("cam"), "rk_sorted": P("cam"),
                        "ranks": P(None, "cam")}
        else:
            specs[k] = _meta_spec(k, v)
    return specs


def make_camera_sharded_forward(
    cfg: VeonConfig,
    mesh: Mesh,
    method: str = "full_forward",
):
    """Build the camera-sharded serving forward.

    Returns fn(params, imgs, depth_imgs, metas, ov_weight) -> outputs dict
    (the `VeonModel.full_forward` outputs: per-camera leaves sharded over
    the mesh's "cam" axis, voxel leaves replicated). `metas` must come from
    `prepare_camshard_metas`. `method="forward"` skips the depth tower and
    takes metric depth (B, F, N, h2, w2) as the second argument
    (cached-depth serving).
    """
    from jax.experimental.shard_map import shard_map

    if "cam" not in mesh.axis_names:
        raise ValueError(
            f'mesh needs a "cam" axis (got {mesh.axis_names}) — the model '
            "psums the lifted grid over that name")
    model = VeonModel(cfg=cfg, cam_axis_name="cam")
    fwd_method = (VeonModel.__call__ if method in ("forward", "__call__")
                  else getattr(VeonModel, method))

    def body(params, imgs, depth_imgs, metas, ovw):
        metas = shard_local_lift_sorted(metas)
        return model.apply(params, imgs, depth_imgs, metas, ovw,
                           train=False, method=fwd_method)

    # `VeonModel._forward_current` output keys (single source of truth in
    # model/veon.py): the 2D leaves are per-camera (sharded over "cam"); the
    # voxel leaves are replicated (identical after the in-graph psum)
    out_specs = {k: P(None, "cam") for k in PER_CAMERA_OUTPUTS}
    out_specs.update({k: P() for k in VOXEL_OUTPUTS})

    cache: Dict[Any, Any] = {}

    def forward(params, imgs, depth_imgs, metas, ovw):
        key = jax.tree_util.tree_structure(metas)
        if key not in cache:
            sm = shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(None, None, "cam"), P(None, None, "cam"),
                          metas_specs(metas), P()),
                out_specs=out_specs,
                check_rep=False,
            )
            cache[key] = jax.jit(sm)
        return cache[key](params, imgs, depth_imgs, metas, ovw)

    return forward
