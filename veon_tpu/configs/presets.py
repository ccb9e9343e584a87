"""Named model presets reproducing the reference's config matrix.

The reference enumerates {B,L} x {zoe,dav2} x {nodepthcache,withdepthcache,
retrieval} + pretrain + depthcache configs under configs/veon/. We only need
the semantic knobs; cache/retrieval are runtime modes, not separate models.
"""

from __future__ import annotations

import dataclasses

from .base import (
    DepthConfig,
    GridConfig,
    HSAConfig,
    LossConfig,
    PropagationConfig,
    SANConfig,
    VeonConfig,
)


def san_vit_b_16() -> SANConfig:
    """SAN ViT-B/16 (san_clip_vit_res4_coco_temporal.yaml + san_config.py defaults)."""
    return SANConfig()


def san_vit_l_14_336() -> SANConfig:
    """SAN ViT-L-14-336 (san_clip_vit_large_res4_coco_temporal.yaml)."""
    return SANConfig(
        clip_model="ViT-L-14-336",
        clip_width=1024,
        clip_heads=16,
        clip_layers=24,
        clip_patch_size=14,
        clip_embed_dim=768,
        clip_pretrain_grid=(24, 24),
        feature_last_layer_idx=18,
        fusion_map=((0, 0), (1, 6), (2, 12), (3, 18)),
        attn_bias_heads=16,
        text_width=768,
        text_heads=12,
        text_layers=12,
    )


def veon_b(num_temporal: int = 1, compute_dtype: str = "float32") -> VeonConfig:
    """VEON-B @ 512x1408 with DepthAnythingV2-L depth.

    Mirrors configs/veon/veon-temporal-base-512x1408-dav2-nodepthcache.py.
    """
    return VeonConfig(
        compute_dtype=compute_dtype,
        san=san_vit_b_16(),
        hsa=HSAConfig(clip_dim=768, num_heads=12, fusion_map=((0, 3, 3), (1, 6, 6), (2, 9, 9))),
        propagation=PropagationConfig(
            dim=256,
            layer_depth=5,
            clip_proj_dim=512,
            lifting_map=((12, 0, 0),),
            num_temporal=num_temporal,
        ),
        depth=DepthConfig(encoder="vitl"),
        num_temporal=num_temporal,
    )


def veon_l(num_temporal: int = 1) -> VeonConfig:
    """VEON-L: SAN ViT-L-14-336 + DAV2-L (configs/veon/veon-temporal-large-*)."""
    return VeonConfig(
        san=san_vit_l_14_336(),
        hsa=HSAConfig(
            clip_dim=1024,
            num_heads=16,
            fusion_map=((0, 3, 6), (1, 9, 12), (2, 15, 18)),
        ),
        propagation=PropagationConfig(
            dim=256,
            layer_depth=4,
            clip_proj_dim=768,
            lifting_map=((24, 0, 0),),
            num_temporal=num_temporal,
        ),
        depth=DepthConfig(encoder="vitl"),
        num_temporal=num_temporal,
    )


def veon_b_fast(num_temporal: int = 1, compute_dtype: str = "float32") -> VeonConfig:
    """VEON-B fast serving tier 1: DA-V2 input lower-bound 224 (vs the
    252 reference protocol, tools/analysis_tools/benchmark.py:73-96).

    The depth tower is ~47% of the frame's FLOPs and scales quadratically
    with the DA-V2 token count, so shrinking its input is the one
    accuracy-gated knob with protocol-scale wins (same-run chip A/B:
    136.5 -> 115.3 ms/frame fp32). Weights unchanged — the ViT interpolates
    its pos-embed to the smaller grid — so the preset loads the same
    checkpoints; judge the mIoU cost with `selftest`/`test` on weights day
    before shipping it."""
    cfg = veon_b(num_temporal=num_temporal, compute_dtype=compute_dtype)
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dav2_target=224))


def veon_b_fast2(num_temporal: int = 1, compute_dtype: str = "float32") -> VeonConfig:
    """VEON-B fast serving tier 2: DA-V2 lower-bound 196 (chip A/B:
    136.5 -> 103.6 ms/frame fp32). Same contract as `veon_b_fast`, larger
    expected accuracy cost — gate on real-weights eval before use."""
    cfg = veon_b(num_temporal=num_temporal, compute_dtype=compute_dtype)
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dav2_target=196))


def veon_b_zoe(num_temporal: int = 1, compute_dtype: str = "float32") -> VeonConfig:
    """VEON-B with the ZoeDepth-NK (MiDaS BEiT-L-384) depth branch
    (configs/veon/veon-temporal-base-512x1408-zoe-nodepthcache.py)."""
    cfg = veon_b(num_temporal=num_temporal, compute_dtype=compute_dtype)
    return dataclasses.replace(
        cfg,
        depth_mode="zoedepth",
        data=dataclasses.replace(cfg.data, depth_norm_method="midas"),
    )


def veon_l_zoe(num_temporal: int = 1) -> VeonConfig:
    """VEON-L with the ZoeDepth-NK depth branch."""
    cfg = veon_l(num_temporal=num_temporal)
    return dataclasses.replace(
        cfg,
        depth_mode="zoedepth",
        data=dataclasses.replace(cfg.data, depth_norm_method="midas"),
    )


def veon_tiny_test(num_temporal: int = 1) -> VeonConfig:
    """A miniature config for unit tests: same topology, tiny dims/resolution."""
    return VeonConfig(
        grid=GridConfig(
            x=(-40.0, 40.0, 4.0), y=(-40.0, 40.0, 4.0), z=(-1.0, 5.4, 1.6), depth=(1.0, 45.0, 5.5)
        ),
        san=SANConfig(
            clip_width=32,
            clip_heads=2,
            clip_layers=4,
            clip_patch_size=16,
            clip_embed_dim=16,
            clip_pretrain_grid=(2, 2),
            feature_last_layer_idx=3,
            side_width=16,
            side_depth=2,
            side_heads=2,
            num_queries=8,
            fusion_map=((0, 0), (1, 3)),
            side_pretrain_grid=(4, 4),
            deep_supervision_idxs=(2,),
            attn_bias_heads=2,
            attn_bias_embed_channels=8,
            attn_bias_mlp_channels=8,
            text_width=32,
            text_heads=2,
            text_layers=2,
            text_context_length=77,
        ),
        hsa=HSAConfig(
            dim=16,
            clip_dim=32,
            mlp_dim=16,
            patch_shape=(8, 8),
            num_heads=2,
            fusion_map=((0, 1, 1), (1, 2, 2)),
            manip_dim_head=4,
            manip_attn_layers=1,
            manip_supp_dim=16,
        ),
        propagation=PropagationConfig(
            dim=16,
            layer_depth=2,
            clip_proj_dim=16,
            lifting_map=((4, 0, 0),),
            num_temporal=num_temporal,
        ),
        depth=DepthConfig(encoder="vits", features=16, out_channels=(8, 16, 16, 16)),
        # dav2_target=28: without it the tiny preset inherits the production
        # 252 lower-bound target, so dav2_size(32, 88) -> (252, 700) and
        # every tiny full-pipeline test runs the depth tower at PRODUCTION
        # token count (901/cam) — the single largest test wall-time sink
        data=dataclasses.replace(VeonConfig().data, input_size=(64, 176),
                                 depth_input_size=(32, 88), dav2_target=28),
        occ_size=(20, 20, 4),
        lss_feat_ds=(2, 2, 2),
        lss_out_channels=16,
        lss_downsample=16,
        num_temporal=num_temporal,
    )
