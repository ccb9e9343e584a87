"""AlignNetOcc3D: fuse supp+CLIP maps, lift through LSS, refine with a 3D
CNN, and predict binary occupancy + CLIP-space voxel embeddings.

Mirrors `semantic_net/side_adapter/align_net_occ3d.py` (AlignNetOcc3D,
ResBlock3D, PredHead3DOcc/Sem, temporal fusion stack with 3D deformable
attention). Channel-last 3D: (B, Z, Y, X, C); BatchNorm3d becomes flax
BatchNorm with optional cross-replica axis (the SyncBN equivalent).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs.base import PropagationConfig
from ..ops.grid_sample import grid_sample_3d
from .layers import CatFusionLift, AddFusionLift
from .rematutil import RematSpec, remat_wrap

Dtype = Any


class ConvBN3D(nn.Module):
    """mmcv ConvModule(Conv3d, BN3d, optional ReLU) on channel-last 3D."""

    features: int
    kernel: int = 3
    use_bias: bool = False
    relu: bool = True
    bn: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        x = nn.Conv(self.features, (k, k, k), padding=k // 2, use_bias=self.use_bias,
                    dtype=self.dtype, name="conv")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             axis_name=self.bn_axis_name if train else None,
                             dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ResBlock3D(nn.Module):
    """`align_net_occ3d.py:363-404`: conv-BN-relu, conv-BN, +identity, relu."""

    features: int
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        x = ConvBN3D(self.features, relu=True, bn_axis_name=self.bn_axis_name,
                     dtype=self.dtype, name="conv1")(x, train)
        x = ConvBN3D(self.features, relu=False, bn_axis_name=self.bn_axis_name,
                     dtype=self.dtype, name="conv2")(x, train)
        return nn.relu(x + identity)


class PredHead3DOcc(nn.Module):
    """`align_net_occ3d.py:433-473`: 1x1 conv-BN-relu -> 1x1 conv (2 ch)."""

    out_channels: int = 2
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 4
        x = ConvBN3D(mid, kernel=1, relu=True, bn_axis_name=self.bn_axis_name,
                     dtype=self.dtype, name="occ_conv1")(x, train)
        x = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="occ_conv2")(x)
        return x


class PredHead3DSem(nn.Module):
    """`align_net_occ3d.py:476-534`: three 1x1 conv stages -> sigmoid - 0.5."""

    out_channels: int
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        x = ConvBN3D(C, kernel=1, use_bias=True, relu=True,
                     bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                     name="occ_conv1")(x, train)
        x = ConvBN3D(C, kernel=1, relu=True, bn_axis_name=self.bn_axis_name,
                     dtype=self.dtype, name="occ_conv2")(x, train)
        x = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="occ_conv3")(x)
        return nn.sigmoid(x) - 0.5


def _shift3d(x, t, axes=(1, 2, 3)):
    """Shift x by t=(tz,ty,tx) along `axes` with edge replication (the
    border-padding counterpart for stencil taps)."""
    for ax, s in zip(axes, t):
        if s == 0:
            continue
        n = x.shape[ax]
        if s > 0:  # tap at cell+s: take [s:] and replicate the far edge
            sl = [slice(None)] * x.ndim
            sl[ax] = slice(s, n)
            pad = [(0, 0)] * x.ndim
            pad[ax] = (0, s)
            x = jnp.pad(x[tuple(sl)], pad, mode="edge")
        else:
            sl = [slice(None)] * x.ndim
            sl[ax] = slice(0, n + s)
            pad = [(0, 0)] * x.ndim
            pad[ax] = (-s, 0)
            x = jnp.pad(x[tuple(sl)], pad, mode="edge")
    return x


class TemporalDeformable(nn.Module):
    """3D deformable attention (`align_net_occ3d.py:88-204`): learned offsets,
    num_heads x num_samples trilinear taps into the previous-frame feature.
    feat layout (B, Z, Y, X, C); the reference's (D, H, W) = our (Z, Y, X).

    Key property exploited for TPU: the reference bounds offsets with
    tanh(.)/size (`align_net_occ3d.py:132-140`), so every sample lands
    within +-0.5 CELLS of its own voxel. Trilinear sampling then reduces to
    a fixed 3x3x3 STENCIL with per-sample hat weights
    w_t = prod_axis max(0, 1 - |delta_axis - t_axis|), and both the
    attention logits (q . key_s) and the weighted value sum distribute over
    the taps — no gather anywhere, and the (.., samples, channels) sampled
    tensor is never materialized. Exact same math as grid_sample
    (use_stencil=False keeps the general gather path for cross-checking);
    measured 193 ms -> stencil ~an order faster on v5e.
    """

    num_heads: int = 4
    num_samples: int = 8
    use_stencil: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_prev, feat_curr, train: bool = False):
        B, D, H, W, C = feat_curr.shape
        hd = C // self.num_heads
        kv = nn.Conv(C * 2, (1, 1, 1), dtype=self.dtype, name="key_value_proj")(feat_prev)
        query = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="query_proj")(feat_curr)

        off = nn.Conv(C, (3, 3, 3), padding=1, dtype=self.dtype, name="offset_conv1")(feat_curr)
        off = nn.gelu(off, approximate=False)
        off = nn.Conv(self.num_heads * self.num_samples * 3, (3, 3, 3), padding=1,
                      use_bias=False, dtype=self.dtype, name="offset_conv2")(off)
        off = jnp.tanh(off)
        # (B, D, H, W, heads, samples, 3)
        off = off.reshape(B, D, H, W, self.num_heads, self.num_samples, 3)

        z = jnp.linspace(-1, 1, D)
        y = jnp.linspace(-1, 1, H)
        x = jnp.linspace(-1, 1, W)
        zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
        base = jnp.stack([zz, yy, xx], axis=-1)  # (D,H,W,3) in (z,y,x) order
        norm = jnp.asarray([D, H, W], dtype=off.dtype)
        grid_zyx = base[None, :, :, :, None, None, :] + off / norm
        grid_zyx = jnp.clip(grid_zyx, -1, 1)

        q = query.reshape(B, D, H, W, self.num_heads, hd)
        kvh = kv.reshape(B, D, H, W, self.num_heads, 2 * hd)

        if self.use_stencil:
            # per-sample offset in CELL units after the clip (align_corners
            # unnormalization: cells = (g+1)/2*(size-1))
            sizes = jnp.asarray([D - 1, H - 1, W - 1], grid_zyx.dtype) / 2.0
            delta = (grid_zyx - base[None, :, :, :, None, None, :]) * sizes
            qs = q * (hd ** -0.5)
            logits = []
            weights = []
            for tz in (-1, 0, 1):
                for ty in (-1, 0, 1):
                    for tx in (-1, 0, 1):
                        t = jnp.asarray([tz, ty, tx], delta.dtype)
                        w = jnp.prod(jnp.maximum(0.0, 1.0 - jnp.abs(delta - t)),
                                     axis=-1)  # (B,D,H,W,heads,S)
                        k_t = _shift3d(kvh[..., :hd], (tz, ty, tx))
                        d_t = jnp.sum(qs * k_t, axis=-1)  # (B,D,H,W,heads)
                        logits.append(w * d_t[..., None])
                        weights.append(w)
            attn = jax.nn.softmax(
                sum(logits).astype(jnp.float32), axis=-1).astype(q.dtype)
            fused = 0.0
            i = 0
            for tz in (-1, 0, 1):
                for ty in (-1, 0, 1):
                    for tx in (-1, 0, 1):
                        g = jnp.sum(attn * weights[i], axis=-1)  # (B,D,H,W,heads)
                        v_t = _shift3d(kvh[..., hd:], (tz, ty, tx))
                        fused = fused + g[..., None] * v_t
                        i += 1
            fused = fused.reshape(B, D, H, W, C)
        else:
            # general gather path (reference formulation, used for parity)
            grid = grid_zyx[..., ::-1]
            kv_h = kvh.transpose(0, 4, 1, 2, 3, 5).reshape(
                B * self.num_heads, D, H, W, 2 * hd)
            grid_h = grid.transpose(0, 4, 1, 2, 3, 5, 6).reshape(
                B * self.num_heads, D, H, W, self.num_samples, 3
            )
            sampled = grid_sample_3d(kv_h, grid_h, align_corners=True,
                                     padding_mode="border")
            sampled = sampled.reshape(B, self.num_heads, D, H, W,
                                      self.num_samples, 2 * hd)
            key, value = sampled[..., :hd], sampled[..., hd:]
            qh = q.transpose(0, 4, 1, 2, 3, 5) * (hd ** -0.5)
            attn = jnp.einsum("bmdhwc,bmdhwsc->bmdhws", qh, key)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
            fused = jnp.einsum("bmdhws,bmdhwsc->bmdhwc", attn, value)
            fused = fused.transpose(0, 2, 3, 4, 1, 5).reshape(B, D, H, W, C)
        fused = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="out_proj")(fused)
        fused = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             axis_name=self.bn_axis_name if train else None,
                             dtype=self.dtype, name="final_norm")(fused)
        return nn.relu(fused)


class TemporalFusion(nn.Module):
    """`align_net_occ3d.py:48-72` TemporalFusionMultiFrame: pre-conv all frames,
    sequential pairwise cat-conv over prev frames, deformable attention from
    the reference feature into current + merged-prev, final 3x3x3 conv.
    """

    features: int
    seqs: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cur: jnp.ndarray, prevs: List[jnp.ndarray], train: bool = False):
        before = ConvBN3D(self.features, bn_axis_name=self.bn_axis_name,
                          dtype=self.dtype, relu=False, name="before_fusion")
        cur = before(cur, train)
        prevs = [before(p, train) for p in prevs]

        # pairwise merge, newest-last semantics of Middle3x3Seq (:25-45)
        prev_feat = None
        idx = 0
        for f in prevs[::-1]:
            if prev_feat is None:
                prev_feat = f
                continue
            prev_feat = ConvBN3D(self.features, relu=False, bn_axis_name=self.bn_axis_name,
                                 dtype=self.dtype, name=f"t_fuse_{idx}")(
                jnp.concatenate([f, prev_feat], axis=-1), train)
            idx += 1
        ref = ConvBN3D(self.features, relu=False, bn_axis_name=self.bn_axis_name,
                       dtype=self.dtype, name=f"t_fuse_{idx}")(
            jnp.concatenate([cur, prev_feat], axis=-1), train)

        deform = TemporalDeformable(bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                                    name="t_deform")
        d1 = deform(ref, cur, train)
        d2 = deform(ref, prev_feat, train)
        cat = jnp.concatenate([ref, d1, d2], axis=-1)
        return ConvBN3D(self.features, relu=False, bn_axis_name=self.bn_axis_name,
                        dtype=self.dtype, name="t_final")(cat, train)


class _Res3DScanBody(nn.Module):
    features: int
    bn_axis_name: Optional[str]
    train: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        blk = ResBlock3D(self.features, bn_axis_name=self.bn_axis_name,
                         dtype=self.dtype, name="block")
        return blk(carry, self.train), None


class AlignNet3D(nn.Module):
    """The 3D refinement + heads part of AlignNetOcc3D (`:207-265`).

    The LSS lifting and fuse() orchestration live in the model graph
    (model/veon.py) because they need camera metas; this module consumes the
    already-lifted voxel features.
    """

    cfg: PropagationConfig
    clip_outdim: int
    bn_axis_name: Optional[str] = None
    remat: RematSpec = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, occ_feat_prevs: Optional[List[jnp.ndarray]] = None,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        if occ_feat_prevs:
            # temporal fusion sits before ResBlock 0 (`align_net_occ3d.py:252-259`)
            x = TemporalFusion(self.cfg.dim, seqs=self.cfg.num_temporal - 1,
                               bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                               name="temporal_fusion")(x, occ_feat_prevs, train)
        res_body = remat_wrap(_Res3DScanBody, self.remat)
        scan = nn.scan(
            res_body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            length=self.cfg.layer_depth,
        )(features=self.cfg.dim, bn_axis_name=self.bn_axis_name, train=train,
          dtype=self.dtype, name="res3d")
        x, _ = scan(x, None)
        bin_occ = PredHead3DOcc(2, bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                                name="occupancy_pred")(x, train)
        feat_occ = PredHead3DSem(self.clip_outdim, bn_axis_name=self.bn_axis_name,
                                 dtype=self.dtype, name="feat_pred")(x, train)
        return {"bin_occ": bin_occ, "feat_occ": feat_occ}


class LiftFusion(nn.Module):
    """The fuse() input projection (`align_net_occ3d.py:293-318`): CatFusionLift
    of (supp, clip) maps resized to the lift grid."""

    cfg: PropagationConfig
    fusion_type: str = "cat_fusion"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, supp: jnp.ndarray, clip: jnp.ndarray, lift_hw: Tuple[int, int]):
        if self.fusion_type == "cat_fusion":
            return CatFusionLift(self.cfg.dim, dtype=self.dtype, name="fusion_layer_0")(
                supp, clip, lift_hw
            )
        return AddFusionLift(self.cfg.dim, dtype=self.dtype, name="fusion_layer_0")(
            supp, clip, lift_hw
        )
