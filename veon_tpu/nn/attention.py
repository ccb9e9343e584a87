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


def _attention_xla(q, k, v, bias=None):
    """Logits live in the compute dtype (bf16 mode halves the dominant
    (Lq, Lk) HBM traffic); the softmax itself upcasts to fp32 and XLA fuses
    the upcast, so no extra fp32 buffer is materialized."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _pad_to(x, axis, multiple):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


_FLASH_SEQ_MULTIPLE = 512


def dot_product_attention(q, k, v, bias=None):
    """q,k,v: (B, H, L, D). bias: broadcastable to (B, H, Lq, Lk).

    On TPU with no bias, lowers to the Pallas flash-attention kernel
    (sequence padded to a block multiple, padding masked via segment ids) —
    this avoids materializing fp32 (Lq, Lk) logits, the dominant memory
    cost of the ViT towers at 6-camera batch sizes. Elsewhere (CPU tests,
    biased paths) uses the einsum reference with fp32 softmax.
    """
    # measured on v5e: XLA's fused attention beats the pallas flash kernel
    # below ~4k tokens (our ViT seqs are 705-2916), so the flash path only
    # engages for long sequences
    if (
        bias is not None
        or q.shape[2] < 4096
        or jax.devices()[0].platform != "tpu"
    ):
        return _attention_xla(q, k, v, bias)
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)
    except Exception:
        return _attention_xla(q, k, v, bias)
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if D % 64 != 0:
        return _attention_xla(q, k, v, bias)
    qp, _ = _pad_to(q, 2, _FLASH_SEQ_MULTIPLE)
    kp, _ = _pad_to(k, 2, _FLASH_SEQ_MULTIPLE)
    vp, _ = _pad_to(v, 2, _FLASH_SEQ_MULTIPLE)
    # segment ids: real tokens 0, padding 1 -> padded keys invisible to real
    # queries; padded query rows are sliced off below
    q_seg = (jnp.arange(qp.shape[2]) >= Lq).astype(jnp.int32)[None].repeat(B, 0)
    kv_seg = (jnp.arange(kp.shape[2]) >= Lk).astype(jnp.int32)[None].repeat(B, 0)
    out = flash_attention(
        qp, kp, vp, segment_ids=SegmentIds(q=q_seg, kv=kv_seg),
        sm_scale=float(D) ** -0.5,
    )
    return out[:, :, :Lq]


class FusedQKVAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible MHA (fused in-proj layout)
    exposing both the standard self-attention and the SAN biased cross-attn
    with self term, sharing the same in_proj/out_proj parameters.
    """

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, mode: str = "self", mem=None, extra_qk=None):
        if mode == "self":
            return self._self_attn(x, bias, extra_qk)
        return self._cross_with_self_bias(x, mem, bias)

    def _projections(self, E):
        in_proj = nn.Dense(3 * E, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(E, dtype=self.dtype, name="out_proj")
        return in_proj, out_proj

    def _self_attn(self, x, bias, extra_qk=None):
        E = x.shape[-1]
        # a fully-degenerate (1,1,1,1) bias is the scan-body "no bias"
        # sentinel (zeros broadcast); drop it so the flash path can engage
        if bias is not None and all(s == 1 for s in bias.shape):
            bias = None
        if extra_qk is not None and all(s == 1 for s in extra_qk.shape):
            extra_qk = None
        in_proj, out_proj = self._projections(E)
        qkv = in_proj(x)
        q, k, v = (
            _split_heads(qkv[..., :E], self.num_heads),
            _split_heads(qkv[..., E : 2 * E], self.num_heads),
            _split_heads(qkv[..., 2 * E :], self.num_heads),
        )
        if extra_qk is not None:
            # factorized additive attention bias f@f^T fused as extra qk
            # channels: softmax(q*s @ k^T + f@f^T) == softmax([q*s, f] @
            # [k, f]^T). Replaces the dense (Lq, Lk) HSA bias
            # (`visual.py:258-285` + `highres_side_adaptor.py:182`).
            f = extra_qk.transpose(0, 2, 1, 3).astype(q.dtype)  # (B,H,L,Df)
            scale = (E // self.num_heads) ** -0.5
            q_aug = jnp.concatenate([q * scale, f], axis=-1)
            k_aug = jnp.concatenate([k, f], axis=-1)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q_aug, k_aug)
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        else:
            out = dot_product_attention(q, k, v, bias=bias)
        return out_proj(_merge_heads(out))

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
        logits = jnp.einsum("bhqd,bhkd->bhqk", qs, k)
        logits = logits + bias.astype(logits.dtype)
        self_logit = jnp.sum(qs * q_k, axis=-1, keepdims=True).astype(logits.dtype)
        joint = jnp.concatenate([logits, self_logit], axis=-1)
        w = jax.nn.softmax(joint.astype(jnp.float32), axis=-1).astype(q.dtype)
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
