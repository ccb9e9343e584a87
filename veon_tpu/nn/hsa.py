"""High-resolution side adaptor (the VEON journal addition).

Mirrors `semantic_net/side_adapter/highres_side_adaptor.py:109-306`:
patch-embed the full-res image at (8,8) -> conv-FFN blocks with CLIP-feature
injection per FUSION_MAP -> rear AttnManipulateBlock emitting (a) factorized
dense attention biases for the deep CLIP trunk and (b) a supp feature map
for 3D lifting.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..configs.base import HSAConfig
from ..ops.resize import resize_bilinear, resize_nearest
from .layers import ConvFFNBlock, FeedForward, LayerNorm
from .rematutil import RematSpec, remat_wrap

Dtype = Any


class HSABlock(nn.Module):
    """`highres_side_adaptor.py:109-134` HighresSideAdaptorBlock:
    x = ConvFFN(ln_3(x)) + x; x[-L:] += nearest-resize(neck_add(clip)); ln_4.
    """

    dim: int
    mlp_dim: int
    clip_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, clip_add, grid_hw: Tuple[int, int]):
        y = LayerNorm(dtype=self.dtype, name="ln_3")(x)
        x = ConvFFNBlock(self.mlp_dim, dtype=self.dtype, name="ff")(y, grid_hw) + x
        if clip_add is not None:
            B, hc, wc, _ = clip_add.shape
            off = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="neck_add")(clip_add)
            # torch F.interpolate(size=...) default mode is nearest
            off = resize_nearest(off, grid_hw)
            off = off.reshape(B, grid_hw[0] * grid_hw[1], self.dim)
            x = x + off  # all HSA tokens are patches (no query prefix)
        return LayerNorm(dtype=self.dtype, name="ln_4")(x)


class _HSAScanBody(nn.Module):
    dim: int
    mlp_dim: int
    clip_dim: int
    grid_hw: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, clip_add):
        blk = HSABlock(dim=self.dim, mlp_dim=self.mlp_dim, clip_dim=self.clip_dim,
                       dtype=self.dtype, name="block")
        return blk(carry, clip_add, self.grid_hw), None


class AttnManipulateBlock(nn.Module):
    """`highres_side_adaptor.py:137-188`: ConvFFN -> heads for attention
    factors and supp map. Returns (attns (A, B, H, L, L), supp (B, Hs, Ws, C)).
    """

    dim: int
    mlp_dim: int
    heads: int
    dim_head: int
    attn_layers: int
    supp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, side_hw: Tuple[int, int], clip_hw: Tuple[int, int]):
        B = x.shape[0]
        H, W = side_hw
        h, w = clip_hw
        y = LayerNorm(dtype=self.dtype, name="ln_3")(x)
        y = ConvFFNBlock(self.mlp_dim, out_dim=self.mlp_dim, dtype=self.dtype,
                         name="ff")(y, side_hw)
        y = LayerNorm(dtype=self.dtype, name="ln_4")(y)
        attns = FeedForward(self.mlp_dim, self.attn_layers * self.heads * self.dim_head,
                            dtype=self.dtype, name="head_attn")(y)
        supp = FeedForward(self.mlp_dim, self.supp_dim, dtype=self.dtype,
                           name="head_supp")(y)

        attns = attns.reshape(B, H, W, -1)
        attns = resize_bilinear(attns, (h, w), align_corners=False)
        attns = attns.reshape(B, h * w, self.attn_layers, self.heads, self.dim_head)
        # return the bias FACTORS (A, B, L, heads, dh); the dense bias is
        # bias[a,b,head,m,n] = <f[b,m,a,head,:], f[b,n,a,head,:]>
        # (`highres_side_adaptor.py:182`) and is fused into the deep-CLIP
        # attention as augmented qk channels instead of being materialized
        factors = attns.transpose(2, 0, 1, 3, 4)
        supp = supp.reshape(B, H, W, self.supp_dim)
        return factors, supp


class HighresSideAdaptor(nn.Module):
    """`highres_side_adaptor.py:228-300` HighresSideAdaptorNetwork.

    images: (B, H, W, 3); clip_feats: dict from CLIPVisualExtractor.
    Returns (attns (A, B, heads, L, L), supp (B, Hs, Ws, supp_dim)).
    """

    cfg: HSAConfig
    remat: RematSpec = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, clip_feats: Dict[str, jnp.ndarray]):
        c = self.cfg
        B, H, W, _ = images.shape
        ph, pw = c.patch_shape
        gh, gw = H // ph, W // pw
        x = nn.Conv(c.dim, (ph, pw), strides=(ph, pw), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images)
        x = x.reshape(B, gh * gw, c.dim)

        # spatial shape reference (`:286` uses clip_features[1]; any layer works)
        clip_ref = clip_feats[str(c.fusion_map[0][1])]
        h, w = clip_ref.shape[1:3]

        # pre_norm applies only before block 0 (`highres_side_adaptor.py:262`);
        # hoisting it lets the identical blocks scan with stacked params.
        x = LayerNorm(dtype=self.dtype, name="pre_norm")(x)
        clip_stack = jnp.stack(
            [clip_feats[str(add_id)] for _blk, _ca, add_id in c.fusion_map], axis=0
        )
        hsa_body = remat_wrap(_HSAScanBody, self.remat)
        scan = nn.scan(
            hsa_body, variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=(0,), length=len(c.fusion_map),
        )(dim=c.dim, mlp_dim=c.mlp_dim, clip_dim=c.clip_dim, grid_hw=(gh, gw),
          dtype=self.dtype, name="hsa_blocks")
        x, _ = scan(x, clip_stack)

        attns, supp = AttnManipulateBlock(
            dim=c.dim, mlp_dim=c.mlp_dim, heads=c.num_heads, dim_head=c.manip_dim_head,
            attn_layers=c.manip_attn_layers, supp_dim=c.manip_supp_dim,
            dtype=self.dtype, name="rear_block",
        )(x, (gh, gw), (h, w))
        return attns, supp
