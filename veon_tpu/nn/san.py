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
from .vit import TimmBlock

Dtype = Any


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

        def fuse(idx, x):
            if idx in fusion:
                clip = clip_feats[str(fusion[idx])]
                patches = AddFusion(c.side_width, dtype=self.dtype,
                                    name=f"fusion_layer_{idx}")(x[:, -L:], clip, (h, w))
                x = jnp.concatenate([x[:, :-L], patches], axis=1)
            return x

        x = fuse(0, x)
        san_feats = []
        out = None
        for i in range(1, c.side_depth + 1):
            x = TimmBlock(heads=c.side_heads, dtype=self.dtype, name=f"blocks_{i - 1}")(x)
            x = fuse(i, x)
            if i in c.deep_supervision_idxs:
                out = (x[:, :-L], x[:, -L:].reshape(B, h, w, c.side_width))
            san_feats.append(x[:, -L:].reshape(B, h, w, c.side_width))
            if i < c.side_depth:
                x = x + full_pos

        query, pix = out
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
