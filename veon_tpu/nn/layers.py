"""Shared flax building blocks (channel-last everywhere).

Covers the reference's `semantic_net/layers.py` (channel LayerNorm, MLP,
AddFusion, Add/CatFusionLift) and `depth_anything/dinov2_layers/lora_layers.py`
(LoRA linear), re-expressed as linen modules. Parameters are stored fp32;
`dtype` selects the compute precision (bf16 on the fast path).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear

Dtype = Any


def quick_gelu(x):
    """OpenAI CLIP activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x):
    """torch nn.GELU default (erf form) — flax's default is the tanh approx."""
    return nn.gelu(x, approximate=False)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, computed in fp32 (torch default affine)."""

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return (y * scale + bias).astype(orig_dtype)


class LoRADense(nn.Module):
    """Dense with optional LoRA adapters (lora_layers.py:91-153).

    forward = x @ W^T + b + (x @ A^T) @ B^T * (alpha / r).
    The base weight is frozen by the optimizer partition, not here.
    """

    features: int
    use_bias: bool = True
    lora_r: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype, name="base")
        y = d(x)
        if self.lora_r > 0:
            in_features = x.shape[-1]
            # A: kaiming-uniform (as torch), B: zeros
            a = self.param(
                "lora_A",
                nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
                (in_features, self.lora_r),
                jnp.float32,
            )
            b = self.param("lora_B", nn.initializers.zeros, (self.lora_r, self.features), jnp.float32)
            scaling = self.lora_alpha / self.lora_r
            y = y + ((x @ a.astype(self.dtype)) @ b.astype(self.dtype)) * scaling
        return y


class MLP(nn.Module):
    """ReLU MLP (`semantic_net/layers.py:34-50`): relu between layers, linear last."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class TransformerMLP(nn.Module):
    """ViT FFN: fc1 -> act -> fc2, with optional LoRA on both linears."""

    hidden_dim: int
    act: Callable = gelu_exact
    lora_r: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = x.shape[-1]
        x = LoRADense(self.hidden_dim, lora_r=self.lora_r, lora_alpha=self.lora_alpha,
                      dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = LoRADense(out_dim, lora_r=self.lora_r, lora_alpha=self.lora_alpha,
                      dtype=self.dtype, name="fc2")(x)
        return x


class AddFusion(nn.Module):
    """SAN fusion (`semantic_net/layers.py:75-101`): LN over channels + 1x1 conv
    on the CLIP map, bilinear-resize to the side-adapter grid, add to tokens.

    x: (B, L, C_side) tokens; y: (B, h, w, C_clip) CLIP map (channel-last).
    """

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, spatial_shape: Tuple[int, int]):
        # channel LayerNorm (ConvNeXt-style over C of NCHW == plain LN over
        # last axis in channel-last layout), eps=1e-6
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="ln")(y)
        y = nn.Dense(self.out_channels, dtype=self.dtype, name="proj")(y)
        y = resize_bilinear(y, spatial_shape, align_corners=False)
        y = y.reshape(y.shape[0], -1, y.shape[-1])
        return x + y


class CatFusionLift(nn.Module):
    """Lift fusion (`semantic_net/layers.py:154-199`): concat(supp, clip) ->
    LN+1x1 to C/4, clip -> LN+1x1 to 3C/4, concat, relu.

    x1: (B, h1, w1, C1) supp map; x2: (B, h2, w2, C2) clip map.
    """

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, spatial_shape: Tuple[int, int]):
        out_p1 = self.out_channels // 4
        out_p2 = self.out_channels - out_p1
        if x2.shape[-3:-1] != spatial_shape:
            x2 = resize_bilinear(x2, spatial_shape, align_corners=False)
        if x1.shape[-3:-1] != spatial_shape:
            x1 = resize_bilinear(x1, spatial_shape, align_corners=False)
        cat = jnp.concatenate([x1, x2], axis=-1)
        y1 = LayerNorm(eps=1e-6, dtype=self.dtype, name="ln1")(cat)
        y1 = nn.Dense(out_p1, dtype=self.dtype, name="proj1")(y1)
        y2 = LayerNorm(eps=1e-6, dtype=self.dtype, name="ln2")(x2)
        y2 = nn.Dense(out_p2, dtype=self.dtype, name="proj2")(y2)
        return nn.relu(jnp.concatenate([y1, y2], axis=-1))


class AddFusionLift(nn.Module):
    """Alternative lift fusion (`semantic_net/layers.py:111-151`)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, spatial_shape: Tuple[int, int]):
        y1 = LayerNorm(eps=1e-6, dtype=self.dtype, name="ln1")(x1)
        y1 = nn.Dense(self.out_channels, dtype=self.dtype, name="proj1")(y1)
        y2 = LayerNorm(eps=1e-6, dtype=self.dtype, name="ln2")(x2)
        y2 = nn.Dense(self.out_channels, dtype=self.dtype, name="proj2")(y2)
        y2 = resize_bilinear(y2, spatial_shape, align_corners=False)
        return nn.relu(y1 + y2)


class ConvFFNBlock(nn.Module):
    """HSA conv-FFN (`highres_side_adaptor.py:31-52` ConvBlock):
    3x3 conv -> gelu -> LN -> 3x3 conv -> LN, tokens <-> grid reshapes.

    x: (B, L, C) tokens with L == H*W of `size`.
    """

    hidden_dim: int
    out_dim: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size: Tuple[int, int]):
        B, L, C = x.shape
        H, W = size
        out_dim = C if self.out_dim == -1 else self.out_dim
        g = x.reshape(B, H, W, C)
        g = nn.Conv(self.hidden_dim, (3, 3), padding=1, dtype=self.dtype, name="conv1")(g)
        g = nn.gelu(g, approximate=False)
        g = LayerNorm(dtype=self.dtype, name="ln1")(g)
        g = nn.Conv(out_dim, (3, 3), padding=1, dtype=self.dtype, name="conv2")(g)
        g = LayerNorm(dtype=self.dtype, name="ln2")(g)
        return g.reshape(B, L, out_dim)


class FeedForward(nn.Module):
    """HSA head FFN (`highres_side_adaptor.py:17-28`): LN -> fc -> gelu -> fc."""

    hidden_dim: int
    out_dim: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = x.shape[-1] if self.out_dim == -1 else self.out_dim
        x = LayerNorm(dtype=self.dtype, name="ln")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        return x
