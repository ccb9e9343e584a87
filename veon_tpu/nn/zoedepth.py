"""ZoeDepth-NK on a MiDaS DPT-BEiT-L-384 core — the reference's alternate
metric-depth branch (V14).

Re-derives `depth_midas/` for TPU: the BEiT trunk (relative-position-bias
attention with the MiDaS table-resize trick, LayerScale, q/v-only biases,
optional LoRA on qkv — `backbones/beit.py`), the MiDaS DPT decoder with
"project" readout (`midas/dpt_depth.py`, `midas/blocks.py`), and the
ZoeDepth metric-bins head (seed bin regressor, attractor refinement,
conditional log-binomial — `zoedepth/layers/*`,
`zoedepth/zoedepth_nk_v1.py:341-479` ZoeDepthNKAdaptor).

VEON-specific behavior reproduced: kitti-only bin head (no domain router),
`prev_b_embedding` frozen at the seed embedding through the attractor loop
(the adaptor comments out the update), inv/mean attractors with alpha=1000,
temperature in [0.0212, 50].
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..configs.base import ZoeConfig
from ..ops.resize import resize_bilinear
from .attention import _merge_heads, _split_heads
from .dpt import FeatureFusionBlock
from .layers import LayerNorm, LoRADense, gelu_exact

Dtype = Any


# ---------------------------------------------------------------------------
# BEiT relative position bias (MiDaS variable-resolution handling,
# backbones/beit.py:29-62): resize the trained (2*24-1)^2 sub-table
# bilinearly to the actual window, keep the 3 cls-interaction entries, and
# gather with the standard BEiT relative index (computed host-side).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def beit_relative_position_index(wh: int, ww: int) -> np.ndarray:
    """timm gen_relative_position_index for window (wh, ww) incl. cls."""
    area = wh * ww
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, area, area)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num_rel = (2 * wh - 1) * (2 * ww - 1)
    idx = np.zeros((area + 1, area + 1), dtype=np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel  # cls -> all
    idx[0:, 0] = num_rel + 1  # all -> cls
    idx[0, 0] = num_rel + 2  # cls -> cls
    return idx


def beit_rel_pos_bias(table: jnp.ndarray, pretrain_window: Tuple[int, int],
                      window: Tuple[int, int]) -> jnp.ndarray:
    """table: (M, H) with M = (2*Wh0-1)*(2*Ww0-1) + 3. Returns
    (H, L+1, L+1) bias for the actual window (L = Wh*Ww)."""
    wh0, ww0 = pretrain_window
    wh, ww = window
    heads = table.shape[-1]
    sub = table[:-3]
    if (wh, ww) != (wh0, ww0):
        grid = sub.reshape(2 * wh0 - 1, 2 * ww0 - 1, heads)
        grid = resize_bilinear(grid, (2 * wh - 1, 2 * ww - 1), align_corners=False)
        sub = grid.reshape(-1, heads)
    full = jnp.concatenate([sub, table[-3:]], axis=0)
    idx = jnp.asarray(beit_relative_position_index(wh, ww).reshape(-1))
    bias = full[idx].reshape(wh * ww + 1, wh * ww + 1, heads)
    return bias.transpose(2, 0, 1)


class BeitAttention(nn.Module):
    """BEiT attention: fused qkv with q/v-only biases, per-block relative
    position bias, optional LoRA on qkv (zoedepth_nk_v1.py:362-369)."""

    heads: int
    pretrain_window: Tuple[int, int] = (24, 24)
    lora_r: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, window: Tuple[int, int]):
        B, L1, C = x.shape
        qkv = LoRADense(3 * C, use_bias=False, lora_r=self.lora_r,
                        dtype=self.dtype, name="qkv")(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (C,), jnp.float32)
        v_bias = self.param("v_bias", nn.initializers.zeros, (C,), jnp.float32)
        qkv = qkv + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]
        ).astype(qkv.dtype)
        q = _split_heads(qkv[..., :C], self.heads)
        k = _split_heads(qkv[..., C:2 * C], self.heads)
        v = _split_heads(qkv[..., 2 * C:], self.heads)
        M = (2 * self.pretrain_window[0] - 1) * (2 * self.pretrain_window[1] - 1) + 3
        table = self.param("relative_position_bias_table",
                           nn.initializers.zeros, (M, self.heads), jnp.float32)
        bias = beit_rel_pos_bias(table, self.pretrain_window, window)[None]
        scale = (C // self.heads) ** -0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        logits = logits + bias.astype(logits.dtype)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", w, v))
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class BeitBlock(nn.Module):
    heads: int
    mlp_ratio: float = 4.0
    lora_r: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, window: Tuple[int, int]):
        C = x.shape[-1]
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        y = BeitAttention(heads=self.heads, lora_r=self.lora_r, dtype=self.dtype,
                          name="attn")(y, window)
        g1 = self.param("gamma_1", nn.initializers.ones, (C,), jnp.float32)
        x = x + y * g1.astype(y.dtype)
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        h = gelu_exact(h)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        g2 = self.param("gamma_2", nn.initializers.ones, (C,), jnp.float32)
        return x + h * g2.astype(h.dtype)


class BeitTrunk(nn.Module):
    """BEiT-L/16 trunk returning hook-layer token outputs (incl. cls).
    No absolute position embedding (BEiT uses relative only)."""

    width: int = 1024
    depth: int = 24
    heads: int = 16
    patch_size: int = 16
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    lora_r: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        B, H, W, _ = images.shape
        h, w = H // self.patch_size, W // self.patch_size
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images)
        x = x.reshape(B, h * w, self.width)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.width),
                         jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, self.width)), x], axis=1)
        saved = {}
        for i in range(self.depth):
            x = BeitBlock(heads=self.heads, lora_r=self.lora_r, dtype=self.dtype,
                          name=f"blocks_{i}")(x, (h, w))
            if i in self.hooks:
                saved[i] = x
        return [saved[i] for i in self.hooks], (h, w)


class ProjectReadout(nn.Module):
    """MiDaS "project" readout: concat cls onto every token, Linear(2C->C) +
    GELU; LoRA slot per zoedepth_nk_v1.py:371-377."""

    lora_r: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):  # (B, 1+L, C)
        C = tokens.shape[-1]
        cls = jnp.broadcast_to(tokens[:, :1], tokens[:, 1:].shape)
        x = jnp.concatenate([tokens[:, 1:], cls], axis=-1)
        x = LoRADense(C, lora_r=self.lora_r, dtype=self.dtype, name="project")(x)
        return gelu_exact(x)


class MidasDPT(nn.Module):
    """MiDaS DPT decoder over BEiT hooks (midas/dpt_depth.py + blocks.py):
    readout-project, per-level 1x1 projections + resize pyramid, 3x3 RN
    convs, refinenet cascade, 32-ch head activation + rel depth.

    Returns (rel_depth (B,H,W), feats = [out32, l4_rn, r4, r3, r2, r1]).
    """

    cfg: ZoeConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        c = self.cfg
        trunk = BeitTrunk(width=c.width, depth=c.depth, heads=c.heads,
                          patch_size=c.patch_size, hooks=c.hooks,
                          lora_r=c.lora_r if c.use_lora else 0,
                          dtype=self.dtype, name="pretrained")
        hook_tokens, (h, w) = trunk(images)
        B = images.shape[0]
        feats = []
        for i, t in enumerate(hook_tokens):
            x = ProjectReadout(lora_r=c.lora_r if c.use_lora else 0,
                               dtype=self.dtype, name=f"readout_{i}")(t)
            x = x.reshape(B, h, w, c.width)
            x = nn.Conv(c.pyramid_channels[i], (1, 1), dtype=self.dtype,
                        name=f"project_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(c.pyramid_channels[0], (4, 4), strides=(4, 4),
                                     dtype=self.dtype, name="resize_0")(x)
            elif i == 1:
                x = nn.ConvTranspose(c.pyramid_channels[1], (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(c.pyramid_channels[3], (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="resize_3")(x)
            feats.append(x)

        rn = [
            nn.Conv(c.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name=f"layer{i + 1}_rn")(feats[i])
            for i in range(4)
        ]
        path4 = FeatureFusionBlock(c.features, dtype=self.dtype, name="refinenet4")(
            rn[3], size=rn[2].shape[-3:-1])
        path3 = FeatureFusionBlock(c.features, dtype=self.dtype, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[-3:-1])
        path2 = FeatureFusionBlock(c.features, dtype=self.dtype, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[-3:-1])
        path1 = FeatureFusionBlock(c.features, dtype=self.dtype, name="refinenet1")(
            path2, rn[0])

        # output_conv (midas head): conv3x3 -> 2x up -> conv3x3(32) -> relu
        # [hooked 32-ch activation] -> conv1x1(1) -> relu (non_negative)
        x = nn.Conv(c.features // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv1")(path1)
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
        x = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="out_conv2")(x)
        out32 = nn.relu(x)
        rel = nn.Conv(1, (1, 1), dtype=self.dtype, name="out_conv3")(out32)
        rel = nn.relu(rel)[..., 0]
        return rel, [out32, rn[3], path4, path3, path2, path1]


def _inv_attractor(dx, alpha: float, gamma: int):
    return dx / (1.0 + alpha * jnp.power(dx, gamma))


def _exp_attractor(dx, alpha: float, gamma: int):
    return jnp.exp(-alpha * jnp.power(jnp.abs(dx), gamma)) * dx


class _ConvMLP(nn.Module):
    """1x1 conv -> relu -> 1x1 conv (+ optional act), channel-last."""

    hidden: int
    out: int
    final_act: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out, (1, 1), dtype=self.dtype, name="fc2")(x)
        if self.final_act == "relu":
            x = nn.relu(x)
        elif self.final_act == "softplus":
            x = jax.nn.softplus(x)
        return x


class ZoeDepthNK(nn.Module):
    """The full ZoeDepth-NK metric head on the MiDaS core
    (`zoedepth_nk_v1.py:341-479` ZoeDepthNKAdaptor behavior)."""

    cfg: ZoeConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) midas-normalized -> (B, H, W) metric depth."""
        c = self.cfg
        rel, feats = MidasDPT(cfg=c, dtype=self.dtype, name="core")(images)
        out32, btlnck, *x_blocks = feats

        x = nn.Conv(btlnck.shape[-1], (1, 1), dtype=self.dtype, name="conv2")(btlnck)

        # seed bins (softplus / unnormed variant)
        seed_centers = _ConvMLP(c.bin_embedding_dim // 2, c.n_bins,
                                final_act="softplus", dtype=self.dtype,
                                name="seed_bin_regressor")(x)
        b_prev = seed_centers  # (B, h, w, n_bins)
        prev_b_embedding = _ConvMLP(c.bin_embedding_dim // 2, c.bin_embedding_dim,
                                    dtype=self.dtype, name="seed_projector")(x)

        attractor_fn = _inv_attractor if c.attractor_type == "inv" else _exp_attractor
        b_centers = b_prev
        b_embedding = prev_b_embedding
        for i, xb in enumerate(x_blocks):
            b_embedding = _ConvMLP(c.bin_embedding_dim // 2, c.bin_embedding_dim,
                                   dtype=self.dtype, name=f"projector_{i}")(xb)
            # attractor (unnormed): A = softplus MLP(x + prev_embedding^)
            pe = resize_bilinear(prev_b_embedding, b_embedding.shape[1:3],
                                 align_corners=True)
            a_in = b_embedding + pe
            A = _ConvMLP(c.bin_embedding_dim, c.n_attractors[i],
                         final_act="softplus", dtype=self.dtype,
                         name=f"attractor_{i}")(a_in)
            bp = resize_bilinear(b_prev, A.shape[1:3], align_corners=True)
            dx = A[..., :, None] - bp[..., None, :]  # (B,h,w,n_attr,n_bins)
            delta = attractor_fn(dx.astype(jnp.float32), c.attractor_alpha,
                                 c.attractor_gamma)
            if c.attractor_kind == "mean":
                delta = jnp.mean(delta, axis=-2)
            else:
                delta = jnp.sum(delta, axis=-2)
            b_centers = bp + delta.astype(bp.dtype)
            b_prev = b_centers
            # NOTE: prev_b_embedding intentionally NOT updated
            # (ZoeDepthNKAdaptor comments out the update, :445)

        last = out32
        b_centers = resize_bilinear(b_centers, last.shape[1:3], align_corners=True)
        b_embedding = resize_bilinear(b_embedding, last.shape[1:3], align_corners=True)

        # conditional log binomial (dist_layers.py:49-100)
        pt = nn.Conv((32 + c.bin_embedding_dim) // 4, (1, 1), dtype=self.dtype,
                     name="clb_fc1")(jnp.concatenate([last, b_embedding], axis=-1))
        pt = gelu_exact(pt)
        pt = nn.Conv(4, (1, 1), dtype=self.dtype, name="clb_fc2")(pt)
        pt = jax.nn.softplus(pt).astype(jnp.float32)
        p_eps = 1e-4
        p = pt[..., 0:2] + p_eps
        p = p[..., 0] / (p[..., 0] + p[..., 1])
        t = pt[..., 2:4] + p_eps
        t = t[..., 0] / (t[..., 0] + t[..., 1])
        t = (c.max_temp - c.min_temp) * t + c.min_temp

        K = c.n_bins
        k_idx = jnp.arange(K, dtype=jnp.float32)
        # log-binomial coefficient via Stirling (dist_layers.py log_binom);
        # computed host-side: XLA's reassociation folds (K-1-k)+eps to an
        # exact zero at k=K-1 and produces 0*log(0)=NaN otherwise
        eps = 1e-7
        k_np = np.arange(K, dtype=np.float64)
        Km1 = float(K - 1)
        log_binom = jnp.asarray(
            (Km1 + eps) * np.log(Km1 + eps)
            - (k_np + eps) * np.log(k_np + eps)
            - (Km1 - k_np + eps) * np.log(Km1 - k_np + eps),
            dtype=jnp.float32,
        )
        pe_ = 1e-4
        pc = jnp.clip(p, pe_, 1.0)
        omp = jnp.clip(1.0 - p, pe_, 1.0)
        y = (log_binom[None, None, None]
             + k_idx * jnp.log(pc)[..., None]
             + (Km1 - k_idx) * jnp.log(omp)[..., None])
        probs = jax.nn.softmax(y / t[..., None], axis=-1)

        metric = jnp.sum(probs.astype(b_centers.dtype) * b_centers, axis=-1)
        if metric.shape[1:3] != images.shape[1:3]:
            metric = resize_bilinear(metric[..., None], images.shape[1:3],
                                     align_corners=True)[..., 0]
        return metric
