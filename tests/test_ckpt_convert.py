"""Checkpoint-converter parity tests.

Builds small torch modules implementing the published architectures (CLIP
residual block w/ QuickGELU, timm ViT block, DINOv2 block with LoRA, DPT
pieces, Conv3d+BN3d), exports their state dicts, converts with
veon_tpu.ckpt.convert, and checks numeric agreement of the forwards.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from veon_tpu.ckpt import convert as C  # noqa: E402
from veon_tpu.nn.vit import CLIPBlock, TimmBlock, DinoBlock  # noqa: E402
from veon_tpu.nn.dpt import DPTHead, ResidualConvUnit, FeatureFusionBlock  # noqa: E402
from veon_tpu.nn.alignnet import ConvBN3D  # noqa: E402

RNG = np.random.default_rng(0)
KEY = jax.random.PRNGKey(0)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


class TorchQuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchCLIPBlock(tnn.Module):
    """open_clip ResidualAttentionBlock semantics (public architecture)."""

    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(d)
        self.attn = tnn.MultiheadAttention(d, heads)
        self.ln_2 = tnn.LayerNorm(d)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(d, 4 * d))
        self.mlp.add_module("gelu", TorchQuickGELU())
        self.mlp.add_module("c_proj", tnn.Linear(4 * d, d))

    def forward(self, x):  # x: (L, N, D)
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


def test_clip_block_conversion_parity():
    d, heads, L, B = 16, 4, 7, 2
    tb = TorchCLIPBlock(d, heads).eval()
    sd = _sd(tb)
    params = C._clip_block(sd, "")
    x = RNG.standard_normal((B, L, d)).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.from_numpy(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()
    blk = CLIPBlock(heads=heads)
    got = blk.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


class TorchTimmBlock(tnn.Module):
    """timm VisionTransformer block semantics (qkv fused, eps 1e-6)."""

    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = tnn.Linear(d, 3 * d)
                self.proj = tnn.Linear(d, d)
                self.heads = heads

            def forward(self, x):
                B, L, C = x.shape
                qkv = self.qkv(x).reshape(B, L, 3, self.heads, C // self.heads)
                qkv = qkv.permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                a = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
                a = a.softmax(-1)
                return self.proj((a @ v).transpose(1, 2).reshape(B, L, C))

        self.attn = Attn()
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)

        class Mlp(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = tnn.Linear(d, 4 * d)
                self.fc2 = tnn.Linear(4 * d, d)

            def forward(self, x):
                return self.fc2(tF.gelu(self.fc1(x)))

        self.mlp = Mlp()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


def test_timm_block_conversion_parity():
    d, heads = 16, 4
    tb = TorchTimmBlock(d, heads).eval()
    params = C._timm_block(_sd(tb), "")
    x = RNG.standard_normal((2, 9, d)).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.from_numpy(x)).numpy()
    got = TimmBlock(heads=heads).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


class TorchLoRALinear(tnn.Linear):
    def __init__(self, i, o, r):
        super().__init__(i, o)
        self.lora_A = tnn.Parameter(torch.randn(r, i) * 0.1)
        self.lora_B = tnn.Parameter(torch.randn(o, r) * 0.1)
        self.scaling = 1.0 / r

    def forward(self, x):
        return super().forward(x) + (x @ self.lora_A.T @ self.lora_B.T) * self.scaling


class TorchDinoBlock(tnn.Module):
    def __init__(self, d, heads, r):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = TorchLoRALinear(d, 3 * d, r)
                self.proj = TorchLoRALinear(d, d, r)
                self.heads = heads

            def forward(self, x):
                B, L, C = x.shape
                qkv = self.qkv(x).reshape(B, L, 3, self.heads, C // self.heads)
                qkv = qkv.permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0] * (C // self.heads) ** -0.5, qkv[1], qkv[2]
                a = (q @ k.transpose(-2, -1)).softmax(-1)
                return self.proj((a @ v).transpose(1, 2).reshape(B, L, C))

        self.attn = Attn()

        class LS(tnn.Module):
            def __init__(self):
                super().__init__()
                self.gamma = tnn.Parameter(torch.ones(d))

            def forward(self, x):
                return x * self.gamma

        self.ls1 = LS()
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)

        class Mlp(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = TorchLoRALinear(d, 4 * d, r)
                self.fc2 = TorchLoRALinear(4 * d, d, r)

            def forward(self, x):
                return self.fc2(tF.gelu(self.fc1(x)))

        self.mlp = Mlp()
        self.ls2 = LS()

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


def test_dino_block_with_lora_parity():
    d, heads, r = 16, 4, 2
    tb = TorchDinoBlock(d, heads, r).eval()
    params = C._dino_block(_sd(tb), "")
    x = RNG.standard_normal((2, 9, d)).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.from_numpy(x)).numpy()
    got = DinoBlock(heads=heads, lora_r=r, lora_alpha=1.0).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_conv_transpose_parity():
    """flax ConvTranspose vs torch ConvTranspose2d for k==s (DPT resize)."""
    from flax import linen as fnn

    for k in (2, 4):
        t = tnn.ConvTranspose2d(5, 7, kernel_size=k, stride=k).eval()
        w = C._convT2d(_sd(t), "")
        x = RNG.standard_normal((1, 3, 4, 5)).astype(np.float32)
        with torch.no_grad():
            want = t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        mod = fnn.ConvTranspose(7, (k, k), strides=(k, k))
        got = mod.apply({"params": jax.tree_util.tree_map(jnp.asarray, w)}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TorchRCU(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, padding=1)
        self.conv2 = tnn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        out = tF.relu(x)
        out = self.conv1(out)
        out = tF.relu(out)
        out = self.conv2(out)
        return out + x


def test_residual_conv_unit_parity():
    t = TorchRCU(6).eval()
    sd = _sd(t)
    params = {"conv1": C._conv2d(sd, "conv1"), "conv2": C._conv2d(sd, "conv2")}
    x = RNG.standard_normal((2, 5, 5, 6)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = ResidualConvUnit(6).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_conv_bn3d_eval_parity():
    t = tnn.Sequential()
    t.add_module("conv", tnn.Conv3d(4, 6, 3, padding=1, bias=False))
    t.add_module("bn", tnn.BatchNorm3d(6))
    t.eval()
    with torch.no_grad():
        t.bn.running_mean.normal_()
        t.bn.running_var.uniform_(0.5, 2.0)
        t.bn.weight.normal_()
        t.bn.bias.normal_()
    sd = _sd(t)
    p, s = C._bn(sd, "bn")
    params = {"conv": C._conv3d(sd, "conv"), "bn": p}
    stats = {"bn": s}
    x = RNG.standard_normal((1, 3, 4, 5, 4)).astype(np.float32)
    with torch.no_grad():
        want = tF.relu(t(torch.from_numpy(x).permute(0, 4, 1, 2, 3))).permute(0, 2, 3, 4, 1).numpy()
    got = ConvBN3D(6).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_merge_lora_equivalence():
    """Folded-LoRA params through a lora_r=0 module == LoRA module output."""
    from veon_tpu.ckpt.convert import merge_lora
    from veon_tpu.nn.layers import LoRADense

    x = jnp.asarray(RNG.standard_normal((3, 6)).astype(np.float32))
    mod = LoRADense(4, lora_r=2, lora_alpha=1.0)
    params = mod.init(KEY, x)["params"]
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(RNG.standard_normal(a.shape).astype(np.float32)), params)
    want = mod.apply({"params": params}, x)
    folded = merge_lora(jax.tree_util.tree_map(np.asarray, {"d": params}))["d"]
    mod0 = LoRADense(4, lora_r=0)
    got = mod0.apply({"params": jax.tree_util.tree_map(jnp.asarray, folded)}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_rec_head_self_attn_mode_parity():
    """REC_CROSS_ATTN=False numerics vs a torch oracle built from the
    published formulation (`visual.py:196-202, 240-253`): joint
    [sos, cls, pixels] sequence through plain CLIP blocks whose additive
    attention mask carries the SAN bias on the sos->pixel entries."""
    from veon_tpu.nn.vit import CLIPRecHead

    d, heads, Q, B, h, w = 16, 4, 3, 2, 2, 3
    L = h * w
    S = Q + 1 + L
    n = 2

    class TorchMaskBlock(TorchCLIPBlock):
        def forward(self, x, attn_mask):  # x: (S, N, D)
            y = self.ln_1(x)
            x = x + self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
            x = x + self.mlp(self.ln_2(x))
            return x

    blocks = [TorchMaskBlock(d, heads).eval() for _ in range(n)]
    ln_post = tnn.LayerNorm(d).eval()
    proj = torch.from_numpy(RNG.standard_normal((d, 8)).astype(np.float32))

    # inputs
    pix = RNG.standard_normal((B, h, w, d)).astype(np.float32)
    cls = RNG.standard_normal((B, 1, d)).astype(np.float32)
    bias = RNG.standard_normal((B, heads, Q, L)).astype(np.float32)

    # reference mask construction (visual.py:240-250)
    base = np.zeros((S, S), np.float32)
    base[:, :Q] = -100.0
    base[np.arange(Q), np.arange(Q)] = 0.0
    base[:Q, Q] = -100.0
    mask = np.broadcast_to(base, (B, heads, S, S)).copy()
    mask[..., :Q, -L:] = bias
    tmask = torch.from_numpy(mask.reshape(B * heads, S, S))

    with torch.no_grad():
        sos = torch.from_numpy(cls).permute(1, 0, 2).repeat(Q, 1, 1)  # (Q,B,d)
        xpix = torch.from_numpy(pix.reshape(B, L, d)).permute(1, 0, 2)
        x = torch.cat([sos, torch.from_numpy(cls).permute(1, 0, 2), xpix], dim=0)
        for blk, m in zip(blocks, [tmask] * n):
            x = blk(x, m)
        out = ln_post(x[:Q].permute(1, 0, 2)) @ proj
        want = tF.normalize(out, dim=-1).numpy()

    # convert per-layer torch weights into the scanned param tree
    params = {
        "resblocks": {"block": C._stack([C._clip_block(_sd(b), "") for b in blocks])},
        "ln_post": C._ln(_sd(ln_post), ""),
        "proj_kernel": proj.numpy(),
    }
    head = CLIPRecHead(width=d, heads=heads, first_layer_idx=2, total_layers=4,
                       out_dim=8, sos_token_num=Q, cross_attn=False)
    feats = {"2": jnp.asarray(pix), "2_cls": jnp.asarray(cls)}
    got = head.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                     feats, jnp.asarray(bias.reshape(B, heads, Q, h, w)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)


def test_fuse_conv_bn_is_exact_identity():
    """fuse_conv_bn (tools/test.py --fuse-conv-bn counterpart): folded
    params produce bit-near-identical eval outputs through the UNCHANGED
    model graph, with nontrivial running stats."""
    import jax

    from veon_tpu.ckpt.convert import fuse_conv_bn
    from veon_tpu.configs import presets
    from veon_tpu.nn.alignnet import AlignNet3D

    cfg = presets.veon_tiny_test()
    net = AlignNet3D(cfg=cfg.propagation, clip_outdim=cfg.propagation.clip_proj_dim)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 10, 10, cfg.propagation.dim))
                    .astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    # randomize running stats so the fold is non-trivial
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape).astype(a.dtype)),
        variables["batch_stats"])
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape).astype(a.dtype) * 0.1),
        variables["params"])
    want = net.apply({"params": params, "batch_stats": stats}, x, train=False)

    fp, fs = fuse_conv_bn(params, stats)
    got = net.apply({"params": fp, "batch_stats": fs}, x, train=False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=2e-5, atol=2e-5)
