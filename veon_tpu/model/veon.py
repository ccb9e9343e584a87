"""The VEON model graph: six camera images (+ previous frames) -> voxel
semantics + CLIP-space voxel embeddings.

One jit-compiled functional graph replacing the reference's
VeonTemporal / SANInVeonEntryTemporal / SANInVeonTemporal / AlignNetOcc3D
orchestration (`models/detectors/veon_temporal.py`,
`semantic_net/san_in_veon_temporal.py:113-218`,
`side_adapter/align_net_occ3d.py:238-360`).

Data layout: frame-major batches (B, F, N, ...) with F = num_temporal
(frame 0 = current, frames 1.. = previous), channel-last images/voxels.
(The reference stores images cam-major and metas frame-major; we use one
consistent convention and convert at the data layer.)
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..configs.base import VeonConfig
from ..geometry.frustum import sensor2keyego_chain
from ..lift.lss import LSSLift, min_pool_depth, two_hot_depth
from ..nn.alignnet import AlignNet3D, LiftFusion
from ..nn.dpt import DepthAnythingV2
from ..nn.hsa import HighresSideAdaptor
from ..nn.san import SideAdapterNetwork
from ..nn.vit import CLIPRecHead, CLIPVisualExtractor
from ..ops.grid_sample import grid_sample_3d
from ..ops.resize import resize_bilinear, resize_trilinear

Dtype = Any
VeonOutputs = Dict[str, jnp.ndarray]

# _forward_current's per-camera (B, N, ...) output leaves — the single list
# consumed by camshard serving's out_specs (sharded over the cam axis) and
# the 2D-mesh train step's pre-loss all_gather (train/step.py): adding a
# per-camera output here keeps both in sync.
PER_CAMERA_OUTPUTS = ("sem_seg_ds", "sem_embed_ds", "clip_feat")
# the voxel-grid leaves (replicated across cam shards after the lift psum)
VOXEL_OUTPUTS = ("bin_occ", "feat_occ", "sem_occ_raw")


def resolve_sensor2keyegos(metas, B, F, N):
    """Per-frame keyego chain (B, F, N, 4, 4), honoring a precomputed
    override: serve/camshard.py pins "sensor2keyegos" from the FULL rig
    before camera sharding (a shard's local cam 0 is not the rig's cam 0,
    so the anchor cannot be computed from sharded metas); otherwise it is
    computed from the batch's own sensor2egos/ego2globals — each frame
    anchored at its OWN cam-0 ego (`align_net_occ3d.py:328-352`)."""
    if "sensor2keyegos" in metas:
        return metas["sensor2keyegos"]
    return sensor2keyego_chain(
        metas["sensor2egos"].reshape(B, F * N, 4, 4),
        metas["ego2globals"].reshape(B, F * N, 4, 4), F, N)


def _flatten_cams(x):
    """(B, F, N, ...) -> (B*F*N, ...)."""
    return x.reshape((-1,) + x.shape[3:])


def _unflatten_cams(x, B, F, N):
    return x.reshape((B, F, N) + x.shape[1:])


class VeonModel(nn.Module):
    """End-to-end VEON graph (inference + training forward)."""

    cfg: VeonConfig
    bn_axis_name: Optional[str] = None
    # recompute trunk blocks in the backward pass (torch.utils.checkpoint
    # equivalent, highres_side_adaptor.py:262-298 / align_net_occ3d.py:257;
    # required to fit the B=1 stage-2 backward in 16 GB HBM)
    # False / True (full remat, the torch.utils.checkpoint equivalent) /
    # a jax.checkpoint_policies name for selective remat (nn/rematutil.py)
    remat: "bool | str" = False
    # camera-sharded SPMD serving (serve/camshard.py): the per-camera tower
    # stack runs on this mesh axis's local camera subset and the lifted
    # voxel grids are psum'd over it — the only cross-camera op in the
    # pre-alignnet graph. None = single-device (all cameras local).
    cam_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        # compute precision: params stay fp32; bf16 flows through matmuls/
        # convs with fp32 softmax/LN/BN internals (see nn modules)
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else self.dtype
        if c.depth_mode == "zoedepth":
            from ..nn.zoedepth import ZoeDepthNK

            self.depth_model = ZoeDepthNK(cfg=c.zoe, dtype=dt, name="depth")
        else:
            self.depth_model = DepthAnythingV2(cfg=c.depth, dtype=dt, name="depth")
        # layers actually consumed downstream: side-adapter fusion sources,
        # HSA cross/add sources, and the rec-head entry layer
        save_layers = tuple(sorted(
            {cl for _, cl in c.san.fusion_map}
            | {ca for _, ca, _ad in c.hsa.fusion_map}
            | {ad for _, _ca, ad in c.hsa.fusion_map}
            | {c.san.feature_last_layer_idx}
        ))
        self.clip_ext = CLIPVisualExtractor(
            width=c.san.clip_width, heads=c.san.clip_heads,
            num_layers=c.san.feature_last_layer_idx, patch_size=c.san.clip_patch_size,
            pretrain_grid=c.san.clip_pretrain_grid, save_layers=save_layers,
            remat=self.remat, dtype=dt, name="clip_visual",
        )
        self.side_adapter = SideAdapterNetwork(cfg=c.san, remat=self.remat,
                                               dtype=dt, name="side_adapter")
        self.rec_head = CLIPRecHead(
            width=c.san.clip_width, heads=c.san.clip_heads,
            first_layer_idx=c.san.feature_last_layer_idx, total_layers=c.san.clip_layers,
            out_dim=c.san.clip_embed_dim, sos_token_num=c.san.num_queries,
            downsample_method=c.san.rec_downsample_method,
            cross_attn=c.san.rec_cross_attn, remat=self.remat, dtype=dt,
            name="rec_head",
        )
        self.hsa = HighresSideAdaptor(cfg=c.hsa, remat=self.remat, dtype=dt,
                                      name="hsa")
        self.lift_fusion = LiftFusion(cfg=c.propagation, fusion_type=c.propagation.fusion_type,
                                      dtype=dt, name="lift_fusion")
        self.alignnet = AlignNet3D(cfg=c.propagation, clip_outdim=c.propagation.clip_proj_dim,
                                   bn_axis_name=self.bn_axis_name,
                                   remat=self.remat, dtype=dt, name="alignnet")
        self.lift = LSSLift.from_config(c, psum_axis=self.cam_axis_name)

    # ------------------------------------------------------------------
    # depth branch
    # ------------------------------------------------------------------
    def estimate_depth(self, depth_imgs: jnp.ndarray) -> jnp.ndarray:
        """(B, F, N, Hd, Wd, 3) DA-V2-normalized -> (B, F, N, H/2, W/2) metric.

        `veon_temporal.py:244-253`: bilinear align_corners=True resize to
        half the main input resolution.
        """
        B, F, N = depth_imgs.shape[:3]
        d = self.depth_model(_flatten_cams(depth_imgs))
        h2, w2 = self.cfg.data.input_size[0] // 2, self.cfg.data.input_size[1] // 2
        if d.shape[-2:] != (h2, w2):
            d = resize_bilinear(d[..., None], (h2, w2), align_corners=True)[..., 0]
        return _unflatten_cams(d, B, F, N)

    def full_forward(
        self,
        imgs: jnp.ndarray,
        depth_imgs: jnp.ndarray,
        metas: Dict[str, jnp.ndarray],
        ov_weight: jnp.ndarray,
        train: bool = False,
    ) -> VeonOutputs:
        """Depth estimation + semantic forward in one graph.

        Matches `veon_temporal.py:139-147`: the depth tower always runs
        without gradient (frozen in stage 2)."""
        depth = jax.lax.stop_gradient(self.estimate_depth(depth_imgs))
        return self(imgs, depth, metas, ov_weight, train=train)

    # ------------------------------------------------------------------
    # full semantic forward (san_in_veon_temporal.py:113-218)
    # ------------------------------------------------------------------
    def __call__(
        self,
        imgs: jnp.ndarray,
        depth: jnp.ndarray,
        metas: Dict[str, jnp.ndarray],
        ov_weight: jnp.ndarray,
        train: bool = False,
        return_early_vox: bool = False,
    ) -> VeonOutputs:
        """Args:
          imgs: (B, F, N, H, W, 3) clipsan-normalized images.
          depth: (B, F, N, H/2, W/2) metric depth.
          metas: dict with sensor2egos/ego2globals (B,F,N,4,4), intrins/
            post_rots (B,F,N,3,3), post_trans (B,F,N,3), bda (B,3,3), and for
            F>1: lidarego2global (B,4,4), prev_lidarego2global (B,F-1,4,4).
          ov_weight: (P+1, C_clip_embed) scaled text classifier (incl. bg).

        Returns dict: sem_seg_ds/sem_embed_ds (B,N,h,w,C), clip_feat,
          bin_occ (B,Z,Y,X,2), feat_occ (B,Z,Y,X,clip_width),
          sem_occ_raw (B,Z,Y,X,P+1).
        """
        c = self.cfg
        B, F, N = imgs.shape[:3]
        flat = _flatten_cams(imgs)
        h2 = (flat.shape[1] // 2, flat.shape[2] // 2)
        clip_input = resize_bilinear(flat, h2, align_corners=False)

        # CLIP trunk runs over all B*F*N images (HSA + the rec update need
        # per-frame features); the SAN decode + rec head run on the CURRENT
        # frame only — previous frames never consume their outputs
        # (forward_early, align_net_occ3d.py:268-280, skips the SAN decode).
        clip_feats = self.clip_ext(clip_input)
        if train:
            # the reference's stage-2 no_grad boundary
            # (san_in_veon_temporal.py:123-139): CLIP features are detached
            # everywhere downstream (side adapter, rec head, HSA injection,
            # deep-CLIP rerun). Nothing trainable sits upstream, so this is
            # semantics-neutral — and it lets XLA drop the CLIP-trunk and
            # side-adapter backward passes instead of differentiating
            # through frozen towers.
            clip_feats = jax.lax.stop_gradient(clip_feats)

        def frame(x, f):
            return _unflatten_cams(x, B, F, N)[:, f]

        def frame_flat(x, f):
            return frame(x, f).reshape((B * N,) + x.shape[1:])

        def frame_feats(f):
            return {k: frame_flat(v, f) for k, v in clip_feats.items()}

        sensor2keyegos = resolve_sensor2keyegos(metas, B, F, N)

        def lift_frame(f, feats_f):
            """fuse(0) + LSS lift for frame f (`align_net_occ3d.py:268-318`)."""
            lift_args = (
                sensor2keyegos[:, f], metas["intrins"][:, f],
                metas["post_rots"][:, f], metas["post_trans"][:, f], metas["bda"],
            )
            presorted = metas.get("lift_sorted") if (f == 0 and F == 1) else None
            return self._early_vox(frame_flat(flat, f), feats_f, depth[:, f],
                                   lift_args, presorted)

        # previous frames -> aligned early occ features (no gradient)
        occ_feat_prevs = []
        for f in range(1, F):
            vox_prev, _ = lift_frame(f, frame_feats(f))
            vox_prev = jax.lax.stop_gradient(vox_prev)
            prev_e2g = metas["prev_lidarego2global"][:, f - 1]
            vox_prev = self.align_to_prev(vox_prev, metas["lidarego2global"], prev_e2g)
            occ_feat_prevs.append(vox_prev)

        # current frame
        flat0 = frame_flat(flat, 0) if F > 1 else flat
        feats0_2d = frame_feats(0) if F > 1 else clip_feats
        lift0_args = (
            sensor2keyegos[:, 0], metas["intrins"][:, 0],
            metas["post_rots"][:, 0], metas["post_trans"][:, 0], metas["bda"],
        )
        presorted0 = metas.get("lift_sorted") if F == 1 else None
        return self._forward_current(flat0, feats0_2d, depth[:, 0], lift0_args,
                                     ov_weight, occ_feat_prevs, B, N,
                                     return_early_vox=return_early_vox,
                                     presorted=presorted0, train=train)

    def _forward_current(self, flat0, feats0_2d, depth0, lift0_args, ov_weight,
                         occ_feat_prevs, B, N, presorted=None,
                         train: bool = False,
                         return_early_vox: bool = False) -> VeonOutputs:
        """Current-frame decode + lift + 3D head, shared by the batched
        temporal path (__call__) and the streaming serving path."""
        c = self.cfg
        mask_preds, attn_bias, _san_feats = self.side_adapter(flat0, feats0_2d)
        mask_embs = self.rec_head(feats0_2d, attn_bias, normalize=True)
        if train:
            # side adapter + rec-head mask embeddings sit inside the
            # reference's stage-2 no_grad block (san_in_veon_temporal.py:
            # 123-139); with clip_feats already stopped and both towers
            # frozen this is a no-op today, but it pins the boundary if
            # trainability ever changes.
            mask_preds, attn_bias, mask_embs = jax.lax.stop_gradient(
                (mask_preds, attn_bias, mask_embs))
        vox, feats_0 = self._early_vox(flat0, feats0_2d, depth0, lift0_args,
                                       presorted)
        occ = self.alignnet(vox, occ_feat_prevs if occ_feat_prevs else None, train=train)

        # upsample to the full occ grid (nz, ny, nx), channel-last
        nx, ny, nz = c.grid.size
        feat_occ = resize_trilinear(occ["feat_occ"], (nz, ny, nx), align_corners=False)
        bin_occ = resize_trilinear(occ["bin_occ"], (nz, ny, nx), align_corners=False)
        sem_occ_raw = jnp.einsum("qc,bzyxc->bzyxq", ov_weight.astype(feat_occ.dtype), feat_occ)

        # 2D outputs for the distillation loss (already current-frame only)
        mask_logits = jnp.einsum("bqc,nc->bqn", mask_embs, ov_weight.astype(mask_embs.dtype))
        sem_seg_ds, sem_embed_ds = self.semantic_inference_2d(
            mask_logits, mask_embs, mask_preds
        )

        out = {
            "sem_seg_ds": sem_seg_ds.reshape((B, N) + sem_seg_ds.shape[1:]),
            "sem_embed_ds": sem_embed_ds.reshape((B, N) + sem_embed_ds.shape[1:]),
            "clip_feat": feats_0["clip_feat_proj"].reshape((B, N) + feats_0["clip_feat_proj"].shape[1:]),
            "bin_occ": bin_occ,
            "feat_occ": feat_occ,
            "sem_occ_raw": sem_occ_raw,
        }
        # outputs in fp32 regardless of compute dtype (eval/losses stability)
        out = {k: v.astype(jnp.float32) for k, v in out.items()}
        if return_early_vox:
            # kept in compute dtype: it feeds the next step's align/fusion
            # exactly as the recompute path's stop_gradient'd vox would
            out["early_vox"] = jax.lax.stop_gradient(vox)
        return out

    def _early_vox(self, flat_imgs_f, feats_f, depth_f, lift_args,
                   presorted=None):
        """One frame's HSA + deep-CLIP rerun + fuse + LSS lift
        (`align_net_occ3d.py:268-318` forward_early, called per frame with
        that frame's OWN metas — prepare_meta num_frame=1).

        flat_imgs_f: (B*N, H, W, 3); depth_f: (B, N, h2, w2).
        Returns (vox (B, Zf, Yf, Xf, C), updated feats_f).
        """
        c = self.cfg
        B, N = depth_f.shape[:2]
        attns_f, supp_f = self.hsa(flat_imgs_f, feats_f)
        feats_f = self.rec_head.update_remaining(feats_f, attns_f)
        clip_last = feats_f[str(c.san.clip_layers)]
        lift_hw = (c.data.input_size[0] // c.lss_downsample,
                   c.data.input_size[1] // c.lss_downsample)
        fused = self.lift_fusion(supp_f, clip_last, lift_hw)  # (B*N, h, w, C)
        fused = fused.reshape((B, N) + fused.shape[1:])
        d_ds = min_pool_depth(depth_f, 8)
        if presorted is not None:
            # fixed-rig serving: rank sort precomputed outside the jit
            # (LSSLift.precompute_sorted — the accelerate mode)
            vox = self.lift.lift_presorted(
                fused, two_hot_depth(d_ds, c.grid), presorted)
        elif c.lss_banded:
            vox = self.lift.lift_from_metric(fused, d_ds, *lift_args)
        else:
            vox = self.lift(fused, two_hot_depth(d_ds, c.grid), *lift_args)
        # under camera sharding the cross-camera psum completing the splat
        # happens INSIDE the lift (LSSLift.psum_axis), on the full-res grid
        # before its ds max-pool — max does not commute with the sum
        # parity harness: one sow per frame, in call order (prev frames
        # first, current last) — the per-frame analog of the reference's
        # occ_decoder.forward_early boundary (align_net_occ3d.py:268-280)
        self.sow("intermediates", "early_vox_frames", vox)
        return vox, feats_f

    # ------------------------------------------------------------------
    # streaming temporal serving (TPU-first addition; no reference
    # counterpart — the reference recomputes every previous frame's full
    # tower stack per call, `san_in_veon_temporal.py:158-173`)
    # ------------------------------------------------------------------
    def forward_early(self, imgs, depth, metas):
        """Single-frame early pipeline for the streaming cache: CLIP trunk +
        HSA + deep-CLIP rerun + fuse + lift, in THIS frame's own ego frame.

        imgs: (B, 1, N, H, W, 3); depth: (B, 1, N, h2, w2) metric;
        metas: the frame's own rig in the standard F=1 layout.
        Returns vox (B, Zf, Yf, Xf, C) — identical to what full_forward's
        prev-frame path would compute for this frame.
        """
        B, _F1, N = imgs.shape[:3]
        flat = imgs.reshape((B * N,) + imgs.shape[3:])
        h2 = (flat.shape[1] // 2, flat.shape[2] // 2)
        clip_feats = self.clip_ext(resize_bilinear(flat, h2, align_corners=False))
        s2k = resolve_sensor2keyegos(metas, B, 1, N)[:, 0]
        lift_args = (s2k, metas["intrins"][:, 0], metas["post_rots"][:, 0],
                     metas["post_trans"][:, 0], metas["bda"])
        vox, _ = self._early_vox(flat, clip_feats, depth[:, 0], lift_args,
                                 metas.get("lift_sorted"))
        return vox

    def full_forward_streaming(self, imgs, depth_imgs, metas, ov_weight,
                               prev_vox, prev_lidarego2global,
                               train: bool = False):
        """Temporal forward where previous frames' lifted features come from
        the streaming cache instead of being recomputed: steady-state cost =
        single-frame cost + (F-1) x (grid_sample warp + temporal fusion).

        imgs/depth_imgs: SINGLE-frame (B, 1, N, ...) batches;
        prev_vox: (B, F-1, Zf, Yf, Xf, C) cached `forward_early` outputs of
        the previous frames (frame t-1 first), each in its own ego frame;
        prev_lidarego2global: (B, F-1, 4, 4).
        Parity: == full_forward on the equivalent (B, F, N, ...) batch
        (tests/test_model_graph.py::test_streaming_temporal_parity).
        """
        depth = jax.lax.stop_gradient(self.estimate_depth(depth_imgs))
        return self.forward_streaming(imgs, depth, metas, ov_weight, prev_vox,
                                      prev_lidarego2global, train=train)

    def forward_streaming(self, imgs, depth, metas, ov_weight, prev_vox,
                          prev_lidarego2global, train: bool = False):
        """full_forward_streaming with the metric depth already estimated
        (cached-depth serving regimes)."""
        T = prev_vox.shape[1]
        prevs = [
            self.align_to_prev(jax.lax.stop_gradient(prev_vox[:, t]),
                               metas["lidarego2global"],
                               prev_lidarego2global[:, t])
            for t in range(T)
        ]
        B, _F1, N = imgs.shape[:3]
        flat0 = imgs.reshape((B * N,) + imgs.shape[3:])
        h2 = (flat0.shape[1] // 2, flat0.shape[2] // 2)
        feats0 = self.clip_ext(resize_bilinear(flat0, h2, align_corners=False))
        s2k = resolve_sensor2keyegos(metas, B, 1, N)[:, 0]
        lift0_args = (s2k, metas["intrins"][:, 0], metas["post_rots"][:, 0],
                      metas["post_trans"][:, 0], metas["bda"])
        # return_early_vox: the current frame's pre-fusion lifted features
        # come back with the outputs so the serving loop caches them for the
        # NEXT step at zero extra cost (they are computed anyway) — this is
        # what makes steady-state cost ~ T1 + warp + fusion.
        return self._forward_current(
            flat0, feats0, depth[:, 0], lift0_args, ov_weight, prevs, B, N,
            presorted=metas.get("lift_sorted"), train=train,
            return_early_vox=True)

    @staticmethod
    def semantic_inference_2d(mask_logits, mask_embs, mask_preds):
        """`san_in_veon_temporal.py:248-255`: softmax classes (drop bg) x
        sigmoid masks -> per-pixel class probs and CLIP embeddings.

        mask_logits (B,Q,P+1), mask_embs (B,Q,C), mask_preds (B,Q,h,w) ->
        sem_seg (B,h,w,P), sem_embed (B,h,w,C).
        """
        cls = jax.nn.softmax(mask_logits, axis=-1)[..., :-1]
        m = jax.nn.sigmoid(mask_preds)
        sem_seg = jnp.einsum("bqp,bqhw->bhwp", cls, m)
        sem_embed = jnp.einsum("bqc,bqhw->bhwc", mask_embs, m)
        return sem_seg, sem_embed

    def align_to_prev(self, occ_feat, lidarego2global, prev_lidarego2global):
        """Ego-motion alignment of a previous frame's occ feature
        (`san_in_veon_temporal.py:325-365` align_after_lss).

        occ_feat: (B, Z, Y, X, C) in the PREV frame's ego coordinates;
        resamples it at the CURRENT frame's voxel centers.
        """
        c = self.cfg
        g = c.grid.scaled(c.lss_feat_ds)
        B, Z, Y, X, C = occ_feat.shape
        xs = jnp.arange(X) * g.x[2] + (g.x[0] + g.x[2] / 2)
        ys = jnp.arange(Y) * g.y[2] + (g.y[0] + g.y[2] / 2)
        zs = jnp.arange(Z) * g.z[2] + (g.z[0] + g.z[2] / 2)
        zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        pts = jnp.stack([xx, yy, zz], axis=-1)  # (Z, Y, X, 3) xyz meters

        # analytic SE(3) inverse + HIGHEST: TPU-default bf16 matmuls on
        # O(1000 m) global translations would shift the warp by meters
        from ..geometry.frustum import compose_se3, se3_inverse

        cur2prev = compose_se3(se3_inverse(prev_lidarego2global),
                               lidarego2global)  # (B, 4, 4)
        hi = jax.lax.Precision.HIGHEST
        p = jnp.einsum("bij,zyxj->bzyxi", cur2prev[:, :3, :3], pts, precision=hi)
        p = p + cur2prev[:, None, None, None, :3, 3]

        first = jnp.asarray([xs[0], ys[0], zs[0]])
        last = jnp.asarray([xs[-1], ys[-1], zs[-1]])
        grid = (p - first) / (last - first) * 2.0 - 1.0  # normalized (x, y, z)
        return grid_sample_3d(occ_feat, grid, align_corners=True, padding_mode="zeros")


def retrieval_map(feat_occ: jnp.ndarray, text_embed: jnp.ndarray,
                  eps: float = 1e-8) -> jnp.ndarray:
    """Per-voxel cosine vs a free-text prompt embedding
    (`compute_single_retrieval`, veon_temporal.py:331-356; same eps-guarded
    cosine as eval/retrieval.retrieval_scores, computed over the whole grid).

    feat_occ: (B, Z, Y, X, C) CLIP-space voxel features;
    text_embed: (C,). Returns (B, X, Y, Z) float32 scores.
    """
    q = text_embed.reshape(-1).astype(jnp.float32)
    f = feat_occ.astype(jnp.float32)
    denom = jnp.maximum(
        jnp.linalg.norm(f, axis=-1) * jnp.linalg.norm(q), eps)
    cos = jnp.einsum("bzyxc,c->bzyx", f, q) / denom
    return cos.transpose(0, 3, 2, 1)


def fusion_rule(sem_occ_merged: jnp.ndarray, bin_occ: jnp.ndarray, free_idx: int = 17):
    """Test-time class fusion (`veon_temporal.py:220-229`).

    sem_occ_merged: (B, Z, Y, X, 18) merged class logits;
    bin_occ: (B, Z, Y, X, 2). Returns (B, X, Y, Z) int32 class grid.
    """
    cls = jnp.argmax(sem_occ_merged, axis=-1)
    occupied = jax.nn.softmax(bin_occ, axis=-1)[..., 0] > 0.5
    pred = jnp.where(occupied, cls, free_idx)
    return pred.transpose(0, 3, 2, 1).astype(jnp.int32)
