"""ViT cores: CLIP visual trunk + recognition head, CLIP text tower,
timm-style blocks (side adapter), and the DINOv2 trunk with LoRA.

One transformer core with per-family variants, replacing the reference's
four vendored ViT stacks (open_clip visual `semantic_net/clip_utils/visual.py`,
open_clip text `clip_utils/classifier.py:47-60`, timm side-ViT
`side_adapter/timm_wrapper.py`, DINOv2 `depth_anything/dinov2.py`).
Batch-first tokens (B, L, C); images channel-last (B, H, W, 3).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bicubic, resize_bicubic_scaled, adaptive_max_pool2d, resize_bilinear
from .attention import FusedQKVAttention, SimpleAttention
from .layers import LayerNorm, TransformerMLP, quick_gelu
from .rematutil import RematSpec, remat_wrap

Dtype = Any


def resize_pos_embed_2d(
    posemb: jnp.ndarray, src_grid: Tuple[int, int], tgt_grid: Tuple[int, int],
    num_prefix: int = 1,
) -> jnp.ndarray:
    """Bicubic pos-embed resize (`attn_helper.py:330-364`), align_corners=False.

    posemb: (L_prefix + Hs*Ws, C) -> (L_prefix + Ht*Wt, C).
    """
    if src_grid == tgt_grid:
        return posemb
    prefix, grid = posemb[:num_prefix], posemb[num_prefix:]
    grid = grid.reshape(src_grid[0], src_grid[1], -1)
    grid = resize_bicubic(grid, tgt_grid, align_corners=False)
    grid = grid.reshape(tgt_grid[0] * tgt_grid[1], -1)
    return jnp.concatenate([prefix, grid], axis=0)


def dinov2_pos_embed(
    posemb: jnp.ndarray, src_grid: int, tgt_grid: Tuple[int, int], offset: float = 0.1
) -> jnp.ndarray:
    """DINOv2's scale-factor pos-embed interpolation (`dinov2.py:181-213`).

    posemb: (1 + N, C) with N = src_grid**2; returns (1 + Ht*Wt, C).
    """
    ht, wt = tgt_grid
    if src_grid * src_grid == ht * wt and ht == wt:
        return posemb
    cls, grid = posemb[:1], posemb[1:]
    grid = grid.reshape(src_grid, src_grid, -1)
    sy = float(ht + offset) / src_grid
    sx = float(wt + offset) / src_grid
    grid = resize_bicubic_scaled(grid, (ht, wt), (sy, sx))
    return jnp.concatenate([cls, grid.reshape(ht * wt, -1)], axis=0)


class _ScanBody(nn.Module):
    """Adapter turning a plain block into an nn.scan body (carry -> carry)."""

    block_cls: Any
    kwargs: Tuple[Tuple[str, Any], ...]

    @nn.compact
    def __call__(self, carry, _):
        blk = self.block_cls(**dict(self.kwargs), name="block")
        return blk(carry), None


class ScanBlocks(nn.Module):
    """lax.scan over `length` identical blocks with stacked parameters.

    On this TPU backend compilation cost scales with HLO size, so deep
    trunks compile one block body instead of `depth` copies. Param layout:
    {scope}/blocks/block/... with a leading (length,) axis — the checkpoint
    converter stacks the torch per-layer tensors accordingly.
    """

    block_cls: Any
    block_kwargs: Tuple[Tuple[str, Any], ...]
    length: int
    remat: RematSpec = False  # False / True (full) / policy name (selective)

    @nn.compact
    def __call__(self, x):
        body_cls = remat_wrap(_ScanBody, self.remat)
        body = nn.scan(
            body_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.length,
        )(self.block_cls, self.block_kwargs, name="blocks")
        x, _ = body(x, None)
        return x


class CLIPBlock(nn.Module):
    """open_clip ResidualAttentionBlock with QuickGELU (OpenAI weights).

    Also exposes `cross`: the rec head's cross_attn_layer
    (`attn_helper.py:303-314`) sharing this block's attention parameters.
    """

    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, mode: str = "self", mem=None,
                 extra_qk=None):
        E = x.shape[-1]
        ln_1 = LayerNorm(eps=1e-5, dtype=self.dtype, name="ln_1")
        attn = FusedQKVAttention(num_heads=self.heads, dtype=self.dtype, name="attn")
        ln_2 = LayerNorm(eps=1e-5, dtype=self.dtype, name="ln_2")
        mlp = TransformerMLP(hidden_dim=int(E * self.mlp_ratio), act=quick_gelu,
                             dtype=self.dtype, name="mlp")
        if mode == "self":
            x = x + attn(ln_1(x), bias=attn_mask, extra_qk=extra_qk)
            return x + mlp(ln_2(x))
        # cross: x are sos tokens, mem the patch tokens, attn_mask the bias
        q_x = ln_1(x)
        kv = ln_1(mem)
        x = x + attn(q_x, bias=attn_mask, mode="cross", mem=kv)
        return x + mlp(ln_2(x))


class CLIPVisualExtractor(nn.Module):
    """CLIP ViT shallow trunk saving selected layers (`clip_utils/visual.py:23-109`).

    The reference's FeatureExtractor saves EVERY layer; only the layers named
    by the side-adapter fusion map, the HSA fusion map, and the rec head are
    consumed, so we save exactly those (`save_layers`) and scan the blocks
    between consecutive saves (compile-time optimization; numerics identical).

    Returns {"0": (B,h,w,C), "0_cls": (B,1,C), ..., per save layer}.
    """

    width: int
    heads: int
    num_layers: int  # FEATURE_LAST_LAYER_IDX (9 B / 18 L)
    patch_size: int
    pretrain_grid: Tuple[int, int]
    save_layers: Tuple[int, ...] = ()
    remat: RematSpec = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        B, H, W, _ = images.shape
        h, w = H // self.patch_size, W // self.patch_size
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), use_bias=False,
                    padding="VALID", dtype=self.dtype, name="conv1")(images)
        x = x.reshape(B, h * w, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,), jnp.float32)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (self.pretrain_grid[0] * self.pretrain_grid[1] + 1, self.width),
                         jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, self.width)), x], axis=1)
        pos_r = resize_pos_embed_2d(pos, self.pretrain_grid, (h, w)).astype(x.dtype)
        x = x + pos_r[None]
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name="ln_pre")(x)

        saves = tuple(sorted(set(self.save_layers) | {0, self.num_layers}))
        feats: Dict[str, jnp.ndarray] = {}

        def save(i, t):
            feats[str(i)] = t[:, 1:].reshape(B, h, w, self.width)
            feats[f"{i}_cls"] = t[:, :1]

        save(0, x)
        kwargs = (("heads", self.heads), ("dtype", self.dtype))
        for si in range(len(saves) - 1):
            a, b = saves[si], saves[si + 1]
            x = ScanBlocks(CLIPBlock, kwargs, length=b - a, remat=self.remat,
                           name=f"segment_{a}_{b}")(x)
            save(b, x)
        return feats


def format_attn_biases(
    attn_bias: jnp.ndarray, target_hw: Tuple[int, int], num_heads: int,
    method: str = "max",
) -> jnp.ndarray:
    """SAN attn-bias formatting (`clip_utils/visual.py:218-256` _build_attn_biases).

    attn_bias: (B, H_bias, Q, h, w) -> (B, num_heads, Q, Ht*Wt), where the
    spatial map is adaptive-max downsampled and heads broadcast if H_bias==1.
    """
    B, hb, Q, h, w = attn_bias.shape
    x = attn_bias.reshape(B, hb * Q, h, w).transpose(0, 2, 3, 1)
    if method == "max":
        x = adaptive_max_pool2d(x, target_hw)
    elif method == "bilinear":
        x = resize_bilinear(x, target_hw, align_corners=False)
    else:
        raise ValueError(method)
    ht, wt = target_hw
    x = x.transpose(0, 3, 1, 2).reshape(B, hb, Q, ht * wt)
    if hb == 1 and num_heads > 1:
        x = jnp.broadcast_to(x, (B, num_heads, Q, ht * wt))
    return x


def rec_self_attn_mask(bias: jnp.ndarray) -> jnp.ndarray:
    """Dense self-attn mask for REC_CROSS_ATTN=False (`visual.py:240-253`).

    The sos/cls/pixel tokens run as ONE sequence; the mask encodes: nobody
    attends to sos tokens (-100) except each sos to itself (0); sos tokens
    do not attend to cls (-100); sos->pixel entries carry the SAN bias.

    bias: (B, heads, Q, L) -> (B, heads, Q+1+L, Q+1+L).
    """
    B, nh, Q, L = bias.shape
    S = Q + 1 + L
    base = np.zeros((S, S), np.float32)
    base[:, :Q] = -100.0
    base[np.arange(Q), np.arange(Q)] = 0.0
    base[:Q, Q] = -100.0
    top = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(base[:Q, : Q + 1]), (B, nh, Q, Q + 1)),
         bias], axis=-1)
    bottom = jnp.broadcast_to(jnp.asarray(base[Q:]), (B, nh, 1 + L, S))
    return jnp.concatenate([top, bottom], axis=-2)


class _RecSelfScanBody(nn.Module):
    """One deep-CLIP layer in REC_CROSS_ATTN=False mode (`visual.py:196-202`):
    a plain self-attn block over the joint [sos, cls, pixels] sequence with a
    dense additive mask (rec path) or extra_qk factors (update path)."""

    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, attn_mask, extra_qk):
        blk = CLIPBlock(heads=self.heads, dtype=self.dtype, name="block")
        x = blk(carry, attn_mask=attn_mask, extra_qk=extra_qk)
        return x, x


class _RecScanBody(nn.Module):
    """One deep-CLIP layer doing BOTH the sos cross-attention and the patch
    self-attention with one shared block (reference interleaves them:
    `visual.py:183-195`). cross_bias is broadcast over layers; extra_qk is
    per-layer: zeros sentinel in rec mode, the HSA bias factors in update
    mode (fused into the attention as augmented qk channels — exactly the
    dense f@f^T bias of `visual.py:258-285` without materializing it)."""

    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, cross_bias, extra_qk):
        sos, x = carry
        blk = CLIPBlock(heads=self.heads, dtype=self.dtype, name="block")
        new_sos = blk(sos, attn_mask=cross_bias, mode="cross", mem=x[:, 1:])
        new_x = blk(x, extra_qk=extra_qk)
        return (new_sos, new_x), new_x


class CLIPRecHead(nn.Module):
    """CLIP deep trunk with attention bias (`clip_utils/visual.py:112-285`).

    Two entry points sharing the resblock parameters:
      * __call__(feats, attn_bias) -> normalized mask embeddings (B, Q, out_dim)
        [cross-attn mode, sos_token_format="cls_token"]
      * update_remaining(feats, attns) -> feats extended to the last layer +
        "clip_feat_proj" dense CLIP-space map.
    """

    width: int
    heads: int
    first_layer_idx: int  # 9 (B) / 18 (L)
    total_layers: int  # 12 (B) / 24 (L)
    out_dim: int  # proj: 512 (B) / 768 (L)
    sos_token_num: int = 100
    downsample_method: str = "max"
    cross_attn: bool = True  # REC_CROSS_ATTN (san_config.py:48)
    remat: RematSpec = False
    dtype: Dtype = jnp.float32

    def setup(self):
        n = self.total_layers - self.first_layer_idx
        body_cls = _RecScanBody if self.cross_attn else _RecSelfScanBody
        body_cls = remat_wrap(body_cls, self.remat)
        scan_cls = nn.scan(
            body_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, 0),
            length=n,
        )
        self.scan = scan_cls(heads=self.heads, dtype=self.dtype, name="resblocks")
        self.num_blocks = n
        self.ln_post = LayerNorm(eps=1e-5, dtype=self.dtype)
        self.proj = self.param(
            "proj_kernel", nn.initializers.normal(0.02), (self.width, self.out_dim), jnp.float32
        )

    def _run(self, feats, cross_bias, extra_qk_stacked, sos):
        k = self.first_layer_idx
        cls = feats[f"{k}_cls"]
        pix = feats[str(k)]
        B, h, w, C = pix.shape
        x = jnp.concatenate([cls, pix.reshape(B, h * w, C)], axis=1)
        if self.cross_attn:
            (sos, x), xs = self.scan((sos, x), cross_bias, extra_qk_stacked)
        else:
            # plain self-attn blocks; cross_bias doubles as the dense mask
            x, xs = self.scan(x, cross_bias, extra_qk_stacked)
            sos = None
        return sos, xs, (B, h, w, C)

    def __call__(self, feats: Dict[str, jnp.ndarray], attn_bias: jnp.ndarray,
                 normalize: bool = True) -> jnp.ndarray:
        """Rec path (`visual.py:163-216`, sos=cls_token). cross_attn=True
        interleaves sos cross-attention with the patch trunk; cross_attn=False
        (`visual.py:196-202`) runs [sos, cls, pixels] as one self-attn
        sequence under rec_self_attn_mask.

        attn_bias: (B, Hb, Q, h_side, w_side) raw SAN bias."""
        k = self.first_layer_idx
        pix = feats[str(k)]
        B, h, w, C = pix.shape
        cls = feats[f"{k}_cls"]
        sos = jnp.broadcast_to(cls, (B, self.sos_token_num, C))
        bias = format_attn_biases(attn_bias, (h, w), self.heads, self.downsample_method)
        zeros_self = jnp.zeros((self.num_blocks, 1, 1, 1, 1), dtype=bias.dtype)
        if self.cross_attn:
            sos, _, _ = self._run(feats, bias, zeros_self, sos)
        else:
            mask = rec_self_attn_mask(bias)
            x = jnp.concatenate([sos, cls, pix.reshape(B, h * w, C)], axis=1)
            x, _ = self.scan(x, mask, zeros_self)
            sos = x[:, : self.sos_token_num]
        sos = self.ln_post(sos)
        sos = sos @ self.proj.astype(sos.dtype)
        if normalize:
            sos = sos / jnp.linalg.norm(sos, axis=-1, keepdims=True)
        return sos

    def update_remaining(self, feats: Dict[str, jnp.ndarray],
                         attn_factors: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        """Re-run the deep trunk with the HSA attention bias
        (`visual.py:258-285`), supplied in factorized form:
        attn_factors (num_layers>=n, B, L, heads, dh) with the dense bias
        being f@f^T per layer/head. The factors fuse into the attention as
        augmented qk channels; the cls row/col bias is zero (a zero factor
        row), matching build_attn_bias (visual.py:280-285).
        Returns feats + layers k+1..total and "clip_feat_proj" (B, h, w, out_dim).
        """
        k = self.first_layer_idx
        pix = feats[str(k)]
        B, h, w, C = pix.shape
        L = h * w
        cls = feats[f"{k}_cls"]
        if attn_factors is not None:
            f = attn_factors[: self.num_blocks]
            # zero factor row for the cls token
            f = jnp.pad(f, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))
        else:
            f = jnp.zeros((self.num_blocks, 1, 1, 1, 1), jnp.float32)
        zero_cross = jnp.zeros((1, 1, 1, 1), jnp.float32)
        _, xs, _ = self._run(feats, zero_cross, f, cls)  # dummy 1-token sos
        feats = dict(feats)
        for i in range(self.num_blocks):
            idx = k + i + 1
            feats[str(idx)] = xs[i][:, 1:].reshape(B, h, w, C)
            feats[f"{idx}_cls"] = xs[i][:, :1]
        last = feats[str(self.total_layers)]
        feats["clip_feat_proj"] = jnp.einsum(
            "bhwc,cd->bhwd", last, self.proj.astype(last.dtype)
        )
        return feats


class TimmBlock(nn.Module):
    """timm VisionTransformer block (norm eps 1e-6, exact GELU, qkv fused)."""

    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        E = x.shape[-1]
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + SimpleAttention(num_heads=self.heads, dtype=self.dtype, name="attn")(y)
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + TransformerMLP(hidden_dim=int(E * self.mlp_ratio), dtype=self.dtype,
                               name="mlp")(y)
        return x


class DinoBlock(nn.Module):
    """DINOv2 block: LayerScale(init 1.0) + optional LoRA on all linears
    (`dinov2_layers/block.py:36-95`, `attention.py:30-70`, `mlp.py`)."""

    heads: int
    mlp_ratio: float = 4.0
    lora_r: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        E = x.shape[-1]
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        y = SimpleAttention(num_heads=self.heads, lora_r=self.lora_r,
                            lora_alpha=self.lora_alpha, dtype=self.dtype, name="attn")(y)
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (E,), jnp.float32)
        x = x + y * ls1.astype(y.dtype)
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        y = TransformerMLP(hidden_dim=int(E * self.mlp_ratio), lora_r=self.lora_r,
                           lora_alpha=self.lora_alpha, dtype=self.dtype, name="mlp")(y)
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (E,), jnp.float32)
        return x + y * ls2.astype(y.dtype)


class DinoV2Trunk(nn.Module):
    """DINOv2 ViT trunk returning intermediate layers
    (`depth_anything/dinov2.py:44-330`, get_intermediate_layers with
    norm=True, return_class_token=True)."""

    width: int
    depth: int
    heads: int
    patch_size: int = 14
    pretrain_grid: int = 37  # 518/14
    take_layers: Tuple[int, ...] = (4, 11, 17, 23)
    lora_r: int = 0
    lora_alpha: float = 1.0
    interpolate_offset: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        """images: (B, H, W, 3). Returns [(patch_tokens (B,L,C), cls (B,C)), ...]."""
        B, H, W, _ = images.shape
        h, w = H // self.patch_size, W // self.patch_size
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images)
        x = x.reshape(B, h * w, self.width)
        cls_token = self.param("cls_token", nn.initializers.normal(1e-6),
                               (1, 1, self.width), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.pretrain_grid * self.pretrain_grid + 1, self.width),
                         jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls_token.astype(x.dtype), (B, 1, self.width)), x], axis=1)
        pos_r = dinov2_pos_embed(pos, self.pretrain_grid, (h, w), self.interpolate_offset)
        x = x + pos_r.astype(x.dtype)[None]

        outs = []
        norm = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm")
        kwargs = (
            ("heads", self.heads), ("lora_r", self.lora_r),
            ("lora_alpha", self.lora_alpha), ("dtype", self.dtype),
        )
        bounds = [0] + [t + 1 for t in sorted(self.take_layers)]
        for si in range(len(bounds) - 1):
            a, b = bounds[si], bounds[si + 1]
            x = ScanBlocks(DinoBlock, kwargs, length=b - a, name=f"segment_{a}_{b}")(x)
            xn = norm(x)
            outs.append((xn[:, 1:], xn[:, 0]))
        return outs


class _TextScanBody(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, mask):
        blk = CLIPBlock(heads=self.heads, dtype=self.dtype, name="block")
        return blk(carry, attn_mask=mask), None


class CLIPTextEncoder(nn.Module):
    """CLIP text tower (`clip_utils/classifier.py:47-60` encode_text).

    tokens: (B, 77) int32. Returns L2-normalized (B, out_dim) embeddings.
    """

    width: int
    heads: int
    num_layers: int
    out_dim: int
    vocab_size: int = 49408
    context_length: int = 77
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
        emb = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                       name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (self.context_length, self.width), jnp.float32)
        x = emb + pos.astype(emb.dtype)[None]
        # causal mask
        L = self.context_length
        mask = jnp.triu(jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1)[None, None]
        scan_cls = nn.scan(
            _TextScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            length=self.num_layers,
        )
        x, _ = scan_cls(heads=self.heads, dtype=self.dtype, name="resblocks")(x, mask)
        x = LayerNorm(eps=1e-5, dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.out_dim), jnp.float32)
        x = x @ proj.astype(x.dtype)
        if normalize:
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x
