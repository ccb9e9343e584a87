"""SAN region-wise side adapter: query-token ViT + MLP mask decoder.

Mirrors `semantic_net/side_adapter/side_adaptor_in_veon.py:31-263`
(RegionwiseSideAdapterNetwork + MLPMaskDecoder) with the timm
vit_w240n6d8_patch16 body (`side_adapter/timm_wrapper.py:68-76`):
width 240, depth 8, heads 6, patch 16, cls token removed, query tokens
prepended, CLIP-feature AddFusion at side blocks {0,1,2,3}, positional
embedding re-added after every block.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..configs.base import SANConfig
from ..ops.resize import resize_bicubic
from .layers import MLP, AddFusion, LayerNorm
from .vit import ScanBlocks, TimmBlock
from .rematutil import RematSpec, remat_wrap

Dtype = Any


class _FusedBlockBody(nn.Module):
    """Scan body for the fused segment: TimmBlock -> AddFusion of the
    per-layer CLIP feature into the patch tokens -> pos-embed re-add.
    Per-layer params (block + fusion) are stacked by nn.scan."""

    heads: int
    side_width: int
    num_patches: int
    spatial: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, clip_feat, full_pos):
        x = TimmBlock(heads=self.heads, dtype=self.dtype, name="block")(carry)
        L = self.num_patches
        patches = AddFusion(self.side_width, dtype=self.dtype, name="fusion")(
            x[:, -L:], clip_feat, self.spatial
        )
        x = jnp.concatenate([x[:, :-L], patches], axis=1)
        return x + full_pos, None


class _PlainBlockBody(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, full_pos):
        x = TimmBlock(heads=self.heads, dtype=self.dtype, name="block")(carry)
        return x + full_pos, None


class MLPMaskDecoder(nn.Module):
    """`side_adaptor_in_veon.py:31-88`: query/pixel/attn-bias MLP branches.

    query: (B, Q, C); x: (B, h, w, C) (channel-last pixel map).
    Returns mask_preds (B, Q, h, w), attn_bias (B, layers, heads, Q, h, w).
    """

    total_heads: int
    total_layers: int
    embed_channels: int
    mlp_channels: int
    mlp_num_layers: int
    rescale_attn_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, x):
        B, h, w, C = x.shape
        q = MLP(self.mlp_channels, self.embed_channels, self.mlp_num_layers,
                dtype=self.dtype, name="query_mlp")(query)
        pix = MLP(self.mlp_channels, self.embed_channels, self.mlp_num_layers,
                  dtype=self.dtype, name="pix_mlp")(x)
        mask_preds = jnp.einsum("bqc,bhwc->bqhw", q, pix)
        attn = MLP(
            self.mlp_channels,
            self.embed_channels * self.total_heads * self.total_layers,
            self.mlp_num_layers, dtype=self.dtype, name="attn_mlp",
        )(x)
        attn = attn.reshape(B, h, w, self.total_layers, self.total_heads, self.embed_channels)
        attn_bias = jnp.einsum("bqc,bhwlnc->blnqhw", q, attn)
        if self.rescale_attn_bias:
            # torch nn.Linear(1,1) on the trailing singleton: scalar affine
            scale = self.param("bias_scaling_w", nn.initializers.ones, (), jnp.float32)
            shift = self.param("bias_scaling_b", nn.initializers.zeros, (), jnp.float32)
            attn_bias = attn_bias * scale.astype(attn_bias.dtype) + shift.astype(attn_bias.dtype)
        return mask_preds, attn_bias


class SideAdapterNetwork(nn.Module):
    """RegionwiseSideAdapterNetwork (`side_adaptor_in_veon.py:92-263`),
    inference path (only the last deep-supervision output is decoded).

    images: (B, H, W, 3); clip_feats: dict from CLIPVisualExtractor.
    Returns (mask_preds (B,Q,h,w), attn_bias (B,heads,Q,h,w), san_feats list).
    """

    cfg: SANConfig
    remat: RematSpec = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, clip_feats: Dict[str, jnp.ndarray]):
        c = self.cfg
        B, H, W, _ = images.shape
        p = c.side_patch_size
        h, w = H // p, W // p
        L = h * w
        x = nn.Conv(c.side_width, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images)
        x = x.reshape(B, L, c.side_width)

        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (c.side_pretrain_grid[0] * c.side_pretrain_grid[1], c.side_width),
                         jnp.float32)
        if (h, w) != c.side_pretrain_grid:
            g = pos.reshape(c.side_pretrain_grid[0], c.side_pretrain_grid[1], -1)
            g = resize_bicubic(g, (h, w), align_corners=False)
            pos = g.reshape(L, -1)
        query_embed = self.param("query_embed", nn.initializers.normal(0.02),
                                 (c.num_queries, c.side_width), jnp.float32)
        query_pos = self.param("query_pos_embed", nn.initializers.normal(0.02),
                               (c.num_queries, c.side_width), jnp.float32)
        full_pos = jnp.concatenate([query_pos, pos], axis=0).astype(x.dtype)[None]
        x = jnp.concatenate(
            [jnp.broadcast_to(query_embed.astype(x.dtype), (B, c.num_queries, c.side_width)), x],
            axis=1,
        )
        x = x + full_pos

        fusion = dict(c.fusion_map)
        # fusion blocks must be a contiguous prefix {0, 1, .., k} (holds for
        # all SAN configs: B {0..3} / L {0..3}); lets us scan the body.
        fuse_idxs = sorted(fusion)
        assert fuse_idxs == list(range(len(fuse_idxs))), fusion
        n_fused = len(fuse_idxs) - 1  # blocks 1..k run block+fusion+pos

        # fuse(0): before any block
        patches = AddFusion(c.side_width, dtype=self.dtype, name="fusion_layer_0")(
            x[:, -L:], clip_feats[str(fusion[0])], (h, w)
        )
        x = jnp.concatenate([x[:, :-L], patches], axis=1)

        # segment 1: blocks 1..k with per-layer CLIP fusion + pos re-add
        clip_stack = jnp.stack(
            [clip_feats[str(fusion[i])] for i in fuse_idxs[1:]], axis=0
        )
        fused_body = remat_wrap(_FusedBlockBody, self.remat)
        fused_scan = nn.scan(
            fused_body, variable_axes={"params": 0},
            split_rngs={"params": True}, in_axes=(0, nn.broadcast),
            length=n_fused,
        )(heads=c.side_heads, side_width=c.side_width, num_patches=L,
          spatial=(h, w), dtype=self.dtype, name="fused_blocks")
        x, _ = fused_scan(x, clip_stack, full_pos)

        # segment 2: plain blocks (+pos) up to the second-to-last block
        n_plain = c.side_depth - n_fused - 1
        if n_plain > 0:
            plain_body = remat_wrap(_PlainBlockBody, self.remat)
            plain_scan = nn.scan(
                plain_body, variable_axes={"params": 0},
                split_rngs={"params": True}, in_axes=(nn.broadcast,),
                length=n_plain,
            )(heads=c.side_heads, dtype=self.dtype, name="plain_blocks")
            x, _ = plain_scan(x, full_pos)

        # final block (deep-supervision output; no pos re-add after)
        x = TimmBlock(heads=c.side_heads, dtype=self.dtype, name="last_block")(x)
        query, pix = x[:, :-L], x[:, -L:].reshape(B, h, w, c.side_width)
        san_feats = [pix]
        mask_preds, attn_bias = MLPMaskDecoder(
            total_heads=c.attn_bias_heads,
            total_layers=c.attn_bias_layers,
            embed_channels=c.attn_bias_embed_channels,
            mlp_channels=c.attn_bias_mlp_channels,
            mlp_num_layers=c.attn_bias_mlp_num_layers,
            rescale_attn_bias=c.rescale_attn_bias,
            dtype=self.dtype,
            name="mask_decoder",
        )(query, pix)
        # single attn-bias layer set in all VEON configs
        attn_bias = attn_bias[:, 0]
        return mask_preds, attn_bias, san_feats
