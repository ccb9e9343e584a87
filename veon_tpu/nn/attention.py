"""Attention primitives (batch-first, channel-last, fp32 softmax).

Includes the SAN recognition head's biased cross-attention with query-side
self term (`semantic_net/attn_helper.py:34-302` cross_attn_with_self_bias):
attention logits are [Q·K^T + bias  ∥  Q·K(Q)^T] with a joint softmax, and
the output adds self_weight * V(Q). It shares projection weights with the
block's regular self-attention, so both live on one module.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _split_heads(x, num_heads):
    B, L, C = x.shape
    return x.reshape(B, L, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, L, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * D)


def dot_product_attention(q, k, v, bias=None):
    """q,k,v: (B, H, L, D). bias: broadcastable to (B, H, Lq, Lk). fp32 softmax."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


class FusedQKVAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible MHA (fused in-proj layout)
    exposing both the standard self-attention and the SAN biased cross-attn
    with self term, sharing the same in_proj/out_proj parameters.
    """

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, mode: str = "self", mem=None):
        if mode == "self":
            return self._self_attn(x, bias)
        return self._cross_with_self_bias(x, mem, bias)

    def _projections(self, E):
        in_proj = nn.Dense(3 * E, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(E, dtype=self.dtype, name="out_proj")
        return in_proj, out_proj

    def _self_attn(self, x, bias):
        E = x.shape[-1]
        in_proj, out_proj = self._projections(E)
        qkv = in_proj(x)
        q, k, v = (
            _split_heads(qkv[..., :E], self.num_heads),
            _split_heads(qkv[..., E : 2 * E], self.num_heads),
            _split_heads(qkv[..., 2 * E :], self.num_heads),
        )
        out = _merge_heads(dot_product_attention(q, k, v, bias=bias))
        return out_proj(out)

    def _cross_with_self_bias(self, query, mem, bias):
        """query: (B, K, C) sos tokens; mem: (B, L, C); bias: (B, H, K, L)."""
        E = query.shape[-1]
        in_proj, out_proj = self._projections(E)
        qkv_query = in_proj(query)
        qkv_mem = in_proj(mem)
        q = _split_heads(qkv_query[..., :E], self.num_heads)
        q_k = _split_heads(qkv_query[..., E : 2 * E], self.num_heads)
        q_v = _split_heads(qkv_query[..., 2 * E :], self.num_heads)
        k = _split_heads(qkv_mem[..., E : 2 * E], self.num_heads)
        v = _split_heads(qkv_mem[..., 2 * E :], self.num_heads)
        scale = (E // self.num_heads) ** -0.5
        qs = q * scale
        logits = jnp.einsum("bhqd,bhkd->bhqk", qs, k).astype(jnp.float32)
        logits = logits + bias.astype(jnp.float32)
        self_logit = jnp.sum(qs * q_k, axis=-1, keepdims=True).astype(jnp.float32)
        joint = jnp.concatenate([logits, self_logit], axis=-1)
        w = jax.nn.softmax(joint, axis=-1).astype(q.dtype)
        attn_w, self_w = w[..., :-1], w[..., -1:]
        out = jnp.einsum("bhqk,bhkd->bhqd", attn_w, v) + self_w * q_v
        return out_proj(_merge_heads(out))


class SimpleAttention(nn.Module):
    """Separate-projection MHA (timm ViT / DINOv2 style: fused qkv Dense,
    separate proj) with optional LoRA on qkv and proj.
    """

    num_heads: int
    qkv_bias: bool = True
    lora_r: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .layers import LoRADense

        E = x.shape[-1]
        qkv = LoRADense(3 * E, use_bias=self.qkv_bias, lora_r=self.lora_r,
                        lora_alpha=self.lora_alpha, dtype=self.dtype, name="qkv")(x)
        q = _split_heads(qkv[..., :E], self.num_heads)
        k = _split_heads(qkv[..., E : 2 * E], self.num_heads)
        v = _split_heads(qkv[..., 2 * E :], self.num_heads)
        out = _merge_heads(dot_product_attention(q, k, v))
        return LoRADense(E, lora_r=self.lora_r, lora_alpha=self.lora_alpha,
                         dtype=self.dtype, name="proj")(out)
