"""ZoeDepth-NK branch tests: BEiT rel-pos machinery, attractor math vs a
torch oracle, and the full tiny tower forward."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from veon_tpu.configs.base import ZoeConfig
from veon_tpu.nn.zoedepth import (BeitBlock, ZoeDepthNK, _exp_attractor,
                                  _inv_attractor, beit_relative_position_index,
                                  beit_rel_pos_bias)

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(0)


def test_beit_relative_position_index_matches_timm_semantics():
    idx = beit_relative_position_index(3, 3)
    assert idx.shape == (10, 10)
    num_rel = (2 * 3 - 1) * (2 * 3 - 1)
    assert idx[0, 0] == num_rel + 2
    assert (idx[0, 1:] == num_rel).all()
    assert (idx[1:, 0] == num_rel + 1).all()
    # center-to-center (zero displacement) uses the middle entry
    assert idx[1, 1] == idx[5, 5]
    assert idx.max() == num_rel + 2


def test_beit_rel_pos_bias_identity_window():
    heads = 2
    M = (2 * 3 - 1) ** 2 + 3
    table = jnp.asarray(RNG.standard_normal((M, heads)).astype(np.float32))
    bias = beit_rel_pos_bias(table, (3, 3), (3, 3))
    assert bias.shape == (heads, 10, 10)
    np.testing.assert_allclose(bias[0, 0, 0], table[-1, 0])  # cls->cls
    # resized window shape
    bias2 = beit_rel_pos_bias(table, (3, 3), (2, 5))
    assert bias2.shape == (heads, 11, 11)


def test_attractor_functions_match_torch():
    torch = pytest.importorskip("torch")
    dx = RNG.standard_normal(100).astype(np.float32) * 0.1
    t = torch.from_numpy(dx)
    want_inv = (t / (1 + 1000.0 * t.pow(2))).numpy()
    got_inv = np.asarray(_inv_attractor(jnp.asarray(dx), 1000.0, 2))
    np.testing.assert_allclose(got_inv, want_inv, rtol=1e-5)
    want_exp = (torch.exp(-300.0 * torch.abs(t) ** 2) * t).numpy()
    got_exp = np.asarray(_exp_attractor(jnp.asarray(dx), 300.0, 2))
    np.testing.assert_allclose(got_exp, want_exp, rtol=1e-5)


def _tiny_zoe():
    return ZoeConfig(width=32, depth=2, heads=2, patch_size=16, hooks=(0, 1, 1, 1),
                     pyramid_channels=(8, 16, 16, 16), features=8, n_bins=6,
                     bin_embedding_dim=8, n_attractors=(4, 2, 2, 1), lora_r=2)


def test_beit_block_forward():
    blk = BeitBlock(heads=2, lora_r=2)
    x = jnp.asarray(RNG.standard_normal((2, 10, 32)).astype(np.float32))
    # pretrain window default (24,24): table sized for it
    params = blk.init(KEY, x, (3, 3))
    y = blk.apply(params, x, (3, 3))
    assert y.shape == x.shape and not bool(jnp.isnan(y).any())


def test_zoedepth_full_forward_tiny():
    cfg = _tiny_zoe()
    model = ZoeDepthNK(cfg=cfg)
    img = jnp.asarray(RNG.standard_normal((1, 64, 96, 3)).astype(np.float32))
    params = jax.jit(model.init)(KEY, img)
    depth = jax.jit(model.apply)(params, img)
    assert depth.shape == (1, 64, 96)
    assert bool(jnp.all(depth >= 0)) and not bool(jnp.isnan(depth).any())
    # metric depth bounded by attractor-refined centers (positive softplus)
    assert float(depth.max()) < 1e4


def test_zoe_model_integration():
    """VeonModel with depth_mode=zoedepth runs estimate_depth."""
    from veon_tpu.configs import presets
    from veon_tpu.model.veon import VeonModel

    cfg = presets.veon_tiny_test()
    cfg = dataclasses.replace(cfg, depth_mode="zoedepth", zoe=_tiny_zoe())
    model = VeonModel(cfg=cfg)
    dimgs = jnp.asarray(RNG.standard_normal((1, 1, 2, 64, 96, 3)).astype(np.float32))
    params = jax.jit(model.init, static_argnames=("method",))(
        KEY, dimgs, method=VeonModel.estimate_depth)
    d = model.apply(params, dimgs, method=VeonModel.estimate_depth)
    assert d.shape == (1, 1, 2, cfg.data.input_size[0] // 2, cfg.data.input_size[1] // 2)


def test_zoe_converter_shapes():
    """Synthetic torch-layout state dict converts into the flax tree."""
    torch = pytest.importorskip("torch")
    cfg = _tiny_zoe()
    sd = {}

    def lin(key, i, o, lora=None, bias=True):
        sd[f"{key}.weight"] = np.zeros((o, i), np.float32)
        if bias:
            sd[f"{key}.bias"] = np.zeros((o,), np.float32)
        if lora:
            sd[f"{key}.lora_A"] = np.zeros((lora, i), np.float32)
            sd[f"{key}.lora_B"] = np.zeros((o, lora), np.float32)

    def conv(key, i, o, k=1, bias=True):
        sd[f"{key}.weight"] = np.zeros((o, i, k, k), np.float32)
        if bias:
            sd[f"{key}.bias"] = np.zeros((o,), np.float32)

    def ln(key, c):
        sd[f"{key}.weight"] = np.ones((c,), np.float32)
        sd[f"{key}.bias"] = np.zeros((c,), np.float32)

    C = cfg.width
    p = "core.core.pretrained.model."
    conv(f"{p}patch_embed.proj", 3, C, 16)
    sd[f"{p}cls_token"] = np.zeros((1, 1, C), np.float32)
    M = (2 * 24 - 1) ** 2 + 3
    for i in range(cfg.depth):
        b = f"{p}blocks.{i}"
        ln(f"{b}.norm1", C)
        lin(f"{b}.attn.qkv", C, 3 * C, lora=cfg.lora_r, bias=False)
        sd[f"{b}.attn.q_bias"] = np.zeros((C,), np.float32)
        sd[f"{b}.attn.v_bias"] = np.zeros((C,), np.float32)
        sd[f"{b}.attn.relative_position_bias_table"] = np.zeros((M, cfg.heads), np.float32)
        lin(f"{b}.attn.proj", C, C)
        sd[f"{b}.gamma_1"] = np.ones((C,), np.float32)
        ln(f"{b}.norm2", C)
        lin(f"{b}.mlp.fc1", C, 4 * C)
        lin(f"{b}.mlp.fc2", 4 * C, C)
        sd[f"{b}.gamma_2"] = np.ones((C,), np.float32)
    ap = "core.core.pretrained."
    for i in range(4):
        lin(f"{ap}act_postprocess{i + 1}.0.project.0", 2 * C, C, lora=cfg.lora_r)
        conv(f"{ap}act_postprocess{i + 1}.3", C, cfg.pyramid_channels[i])
    for i, k in ((1, 4), (2, 2)):
        sd[f"{ap}act_postprocess{i}.4.weight"] = np.zeros(
            (cfg.pyramid_channels[i - 1], cfg.pyramid_channels[i - 1], k, k), np.float32)
        sd[f"{ap}act_postprocess{i}.4.bias"] = np.zeros(
            (cfg.pyramid_channels[i - 1],), np.float32)
    conv(f"{ap}act_postprocess4.4", cfg.pyramid_channels[3], cfg.pyramid_channels[3], 3)
    sc = "core.core.scratch."
    for i in range(4):
        conv(f"{sc}layer{i + 1}_rn", cfg.pyramid_channels[i], cfg.features, 3, bias=False)
    for i in (1, 2, 3, 4):
        for u in (1, 2):
            conv(f"{sc}refinenet{i}.resConfUnit{u}.conv1", cfg.features, cfg.features, 3)
            conv(f"{sc}refinenet{i}.resConfUnit{u}.conv2", cfg.features, cfg.features, 3)
        conv(f"{sc}refinenet{i}.out_conv", cfg.features, cfg.features)
    conv(f"{sc}output_conv.0", cfg.features, cfg.features // 2, 3)
    conv(f"{sc}output_conv.2", cfg.features // 2, 32, 3)
    conv(f"{sc}output_conv.4", 32, 1)
    conv("conv2", cfg.features, cfg.features)
    E = cfg.bin_embedding_dim
    conv("seed_bin_regressors.kitti._net.0", cfg.features, E // 2)
    conv("seed_bin_regressors.kitti._net.2", E // 2, cfg.n_bins)
    conv("seed_projector._net.0", cfg.features, E // 2)
    conv("seed_projector._net.2", E // 2, E)
    for i in range(4):
        conv(f"projectors.{i}._net.0", cfg.features, E // 2)
        conv(f"projectors.{i}._net.2", E // 2, E)
        conv(f"attractors.kitti.{i}._net.0", E, E)
        conv(f"attractors.kitti.{i}._net.2", E, cfg.n_attractors[i])
    conv("conditional_log_binomial.kitti.mlp.0", 32 + E, (32 + E) // 4)
    conv("conditional_log_binomial.kitti.mlp.2", (32 + E) // 4, 4)

    from veon_tpu.ckpt.convert import convert_zoedepth

    params = convert_zoedepth(sd, cfg)
    assert "core" in params and "blocks_0" in params["core"]["pretrained"]
    assert params["core"]["readout_0"]["project"]["lora_A"].shape == (2 * C, cfg.lora_r)
    assert params["attractor_0"]["fc2"]["kernel"].shape == (1, 1, E, cfg.n_attractors[0])
