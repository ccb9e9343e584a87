"""DPT metric-depth head + DepthAnythingV2 adaptor (channel-last).

Structure mirrors `depth_anything/dpt.py:39-263` and
`depth_anything/util/blocks.py` (projects -> resize pyramid -> scratch
convs -> refinenet cascade -> sigmoid head x max_depth), re-expressed as
linen modules on NHWC. The DINOv2 trunk (with LoRA) lives in nn.vit.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..configs.base import DepthConfig
from ..ops.resize import resize_bilinear
from .vit import DinoV2Trunk

Dtype = Any


class ResidualConvUnit(nn.Module):
    """`blocks.py:29-80`: relu -> conv3x3 -> relu -> conv3x3 -> +x (no BN)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    """`blocks.py:83-148`: optional skip RCU, RCU, bilinear up (align_corners
    True), 1x1 out conv."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, size: Tuple[int, int] = None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="rcu2")(x)
        if size is None:
            size = (x.shape[-3] * 2, x.shape[-2] * 2)
        x = resize_bilinear(x, size, align_corners=True)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DPTHead(nn.Module):
    """`dpt.py:39-150` (use_clstoken=False path)."""

    features: int
    out_channels: Tuple[int, int, int, int]
    patch_size: int = 14
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, layer_tokens: List[jnp.ndarray], patch_hw: Tuple[int, int]):
        """layer_tokens: 4 x (B, L, C) intermediate-layer patch tokens.

        Returns (B, H, W, 1) sigmoid depth in [0, 1] at 14*patch resolution.
        """
        ph, pw = patch_hw
        outs = []
        for i, t in enumerate(layer_tokens):
            B, L, C = t.shape
            x = t.reshape(B, ph, pw, C)
            x = nn.Conv(self.out_channels[i], (1, 1), dtype=self.dtype,
                        name=f"projects_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[0], (4, 4), strides=(4, 4),
                                     dtype=self.dtype, name="resize_0")(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[1], (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="resize_3")(x)
            outs.append(x)

        rn = [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name=f"layer{i + 1}_rn")(outs[i])
            for i in range(4)
        ]
        path4 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet4")(
            rn[3], size=rn[2].shape[-3:-1]
        )
        path3 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[-3:-1]
        )
        path2 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[-3:-1]
        )
        path1 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet1")(
            path2, rn[0]
        )

        x = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="output_conv1")(path1)
        x = resize_bilinear(x, (ph * self.patch_size, pw * self.patch_size),
                            align_corners=True)
        x = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="output_conv2_0")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2_2")(x)
        return nn.sigmoid(x)


class DepthAnythingV2(nn.Module):
    """`dpt.py:226-263` DepthAnythingV2Adaptor: DINOv2(+LoRA) -> DPT -> metric
    depth = sigmoid * max_depth."""

    cfg: DepthConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) DA-V2-normalized. Returns (B, H, W) metric depth."""
        vit = self.cfg.vit
        ph, pw = images.shape[1] // 14, images.shape[2] // 14
        trunk = DinoV2Trunk(
            width=vit.width, depth=vit.depth, heads=vit.heads, patch_size=14,
            pretrain_grid=37, take_layers=self.cfg.intermediate_layer_idx,
            lora_r=self.cfg.lora_r if self.cfg.use_lora else 0,
            lora_alpha=self.cfg.lora_alpha, dtype=self.dtype, name="pretrained",
        )
        feats = trunk(images)
        tokens = [t for (t, _cls) in feats]
        depth = DPTHead(features=self.cfg.features, out_channels=self.cfg.out_channels,
                        dtype=self.dtype, name="depth_head")(tokens, (ph, pw))
        return depth[..., 0] * self.cfg.max_depth
