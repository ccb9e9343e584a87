"""Whole-model checkpoint-conversion dress rehearsal (round-1 verdict #4).

Synthesizes COMPLETE reference-layout state dicts from torch mirrors that
reproduce the reference module nesting exactly (tests/ref_layout_mirror.py,
with per-family file:line citations), then asserts:

1. the assemblers (convert_san_semantic / convert_dav2) consume every key
   (modulo a documented ignore list) — a key the converter never reads means
   the mapping silently dropped weights;
2. the converted trees merge into `VeonModel.init`'s param/batch_stats
   structure with EXACT shape agreement — any key/layout drift between the
   converter and the flax model fails here;
3. the merged variables drive a full forward.

Reference load path being rehearsed: `apis/train.py:316-325` dual-checkpoint
load + `process_san_pth.py:20-36` dump conventions.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from veon_tpu.ckpt import convert as C
from veon_tpu.configs import presets
from veon_tpu.model.veon import VeonModel

from ref_layout_mirror import make_dav2_sd, make_san_semantic_sd

# keys a real dump contains that the converter intentionally ignores:
# BN bookkeeping, the text tower's causal-mask buffer, and refinenet4's
# resConfUnit1 (constructed but never used by the DPT forward — the top
# fusion block has no skip input)
IGNORED_SUFFIXES = ("num_batches_tracked",)
IGNORED_KEYS = ("ov_classifier.attn_mask",)
IGNORED_PREFIXES = ("depth_head.scratch.refinenet4.resConfUnit1.",
                    "core.core.scratch.refinenet4.resConfUnit1.")


class TrackingSD(dict):
    """Records every key the converter reads (getitem or containment hit)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        hit = super().__contains__(k)
        if hit:
            self.read.add(k)
        return hit


def _shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), tree)


def assert_same_structure(converted, init_tree, where):
    """Exact structural + shape equality between a converted subtree and the
    model-init subtree."""
    cs, it = _shapes(converted), _shapes(init_tree)
    flat_c = dict(jax.tree_util.tree_flatten_with_path(cs)[0])
    flat_i = dict(jax.tree_util.tree_flatten_with_path(it)[0])
    missing = sorted(set(map(str, flat_i)) - set(map(str, flat_c)))
    extra = sorted(set(map(str, flat_c)) - set(map(str, flat_i)))
    assert not missing and not extra, (
        f"{where}: tree drift\n  missing from checkpoint: {missing[:6]}\n"
        f"  extra in checkpoint: {extra[:6]}")
    for path, shape in flat_c.items():
        assert shape == flat_i[path], (
            f"{where}{jax.tree_util.keystr(path)}: converted {shape} != "
            f"model {flat_i[path]}")


def _unread(sd: TrackingSD):
    return sorted(
        k for k in sd
        if k not in sd.read
        and not k.endswith(IGNORED_SUFFIXES)
        and not k.startswith(IGNORED_PREFIXES)
        and k not in IGNORED_KEYS
    )


@pytest.fixture(scope="module")
def tiny_model_variables():
    cfg = presets.veon_tiny_test()
    from veon_tpu.cli.shapes import example_batch_full

    model = VeonModel(cfg=cfg)
    imgs, depth_imgs, metas = example_batch_full(cfg, B=1)
    ovw = jnp.zeros((3, cfg.san.clip_embed_dim), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train", "method"))(
        jax.random.PRNGKey(0), imgs, depth_imgs, metas, ovw, train=False,
        method=VeonModel.full_forward,
    )
    return cfg, model, variables, (imgs, depth_imgs, metas, ovw)


def test_san_semantic_full_dress_rehearsal(tiny_model_variables):
    cfg, model, variables, batch = tiny_model_variables
    sd = TrackingSD(make_san_semantic_sd(cfg))
    params, stats, extras = C.convert_san_semantic(sd, cfg)

    # 1. every checkpoint key consumed
    assert _unread(sd) == [], f"converter never read: {_unread(sd)[:10]}"

    # 2. exact structure/shape match vs the model tree, family by family
    for fam in ("clip_visual", "rec_head", "side_adapter", "hsa",
                "alignnet", "lift_fusion"):
        assert_same_structure(params[fam], variables["params"][fam], fam)
    for fam, sub in stats.items():
        assert_same_structure(sub, variables["batch_stats"][fam], f"stats.{fam}")

    # text-tower extras load into CLIPTextEncoder's structure
    from veon_tpu.nn.vit import CLIPTextEncoder

    enc = CLIPTextEncoder(
        width=cfg.san.text_width, heads=cfg.san.text_heads,
        num_layers=cfg.san.text_layers, out_dim=cfg.san.clip_embed_dim,
        vocab_size=cfg.san.text_vocab_size,
        context_length=cfg.san.text_context_length,
    )
    tvars = enc.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, cfg.san.text_context_length), jnp.int32))
    assert_same_structure(extras["text_tower"], tvars["params"], "text_tower")
    assert extras["bg_embed"].shape == (1, cfg.san.clip_embed_dim)
    assert np.shape(extras["logit_scale"]) == ()

    # 3. merged variables drive a forward
    merged = dict(variables)
    merged["params"] = C.merge_params(variables["params"], params)
    merged["batch_stats"] = C.merge_params(variables["batch_stats"], stats)
    imgs, depth_imgs, metas, ovw = batch
    out = model.apply(merged, imgs, depth_imgs, metas, ovw, train=False,
                      method=VeonModel.full_forward)
    assert np.isfinite(np.asarray(out["bin_occ"])).all()


def test_san_semantic_temporal_fusion_keys(tiny_model_variables):
    """A num_temporal=2 checkpoint's temporal_fusion weights convert and
    match the temporal model's alignnet structure."""
    cfg2 = presets.veon_tiny_test(num_temporal=2)
    sd = TrackingSD(make_san_semantic_sd(cfg2, num_temporal=2))
    params, stats, _ = C.convert_san_semantic(sd, cfg2)
    assert "temporal_fusion" in params["alignnet"]
    assert _unread(sd) == [], f"converter never read: {_unread(sd)[:10]}"

    from veon_tpu.cli.shapes import example_batch_full

    model = VeonModel(cfg=cfg2)
    imgs, depth_imgs, metas = example_batch_full(cfg2, B=1)
    ovw = jnp.zeros((3, cfg2.san.clip_embed_dim), jnp.float32)
    # structure/shape assertions only -> abstract init (no compile/run)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), imgs, depth_imgs, metas,
                           ovw, train=False, method=VeonModel.full_forward))
    assert_same_structure(params["alignnet"], variables["params"]["alignnet"],
                          "alignnet[temporal]")
    assert_same_structure(stats["alignnet"],
                          variables["batch_stats"]["alignnet"],
                          "stats.alignnet[temporal]")


def test_dav2_full_dress_rehearsal(tiny_model_variables):
    """DAV2 release dump (no LoRA) loads into a use_lora model: converted
    leaves replace init ones, LoRA adapters keep their init values."""
    cfg, model, variables, batch = tiny_model_variables
    sd = TrackingSD(make_dav2_sd(cfg.depth, lora_r=0))
    depth_params = C.convert_dav2(sd, cfg.depth)
    assert _unread(sd) == [], f"converter never read: {_unread(sd)[:10]}"

    merged_depth = C.merge_params(variables["params"]["depth"], depth_params)
    assert_same_structure(merged_depth, variables["params"]["depth"], "depth")

    merged = dict(variables)
    merged["params"] = C.merge_params(variables["params"],
                                      {"depth": depth_params})
    imgs, depth_imgs, metas, ovw = batch
    d = model.apply(merged, depth_imgs,
                    method=VeonModel.estimate_depth)
    assert np.isfinite(np.asarray(d)).all()


def test_dav2_pretrained_lora_dump(tiny_model_variables):
    """A VEON depth-pretrain dump (with LoRA adapters) converts with exact
    structural agreement including lora_A/lora_B."""
    cfg, model, variables, _ = tiny_model_variables
    r = cfg.depth.lora_r
    sd = TrackingSD(make_dav2_sd(cfg.depth, lora_r=r))
    depth_params = C.convert_dav2(sd, cfg.depth)
    assert _unread(sd) == [], f"converter never read: {_unread(sd)[:10]}"
    assert_same_structure(depth_params, variables["params"]["depth"], "depth")


ZOE_IGNORED_SUFFIXES = ("num_batches_tracked", "relative_position_index")


def _tiny_zoe():
    from veon_tpu.configs.base import ZoeConfig

    return ZoeConfig(width=32, depth=4, heads=2, patch_size=16,
                     hooks=(0, 1, 2, 3), pyramid_channels=(8, 8, 8, 8),
                     features=8, n_bins=4, bin_embedding_dim=8,
                     n_attractors=(2, 2, 1, 1), lora_r=4)


def _zoe_unread(sd):
    return sorted(
        k for k in sd
        if k not in sd.read
        and not k.endswith(ZOE_IGNORED_SUFFIXES)
        and not k.startswith(IGNORED_PREFIXES)
    )


@pytest.mark.parametrize("lora", [0, 4])
def test_zoedepth_full_dress_rehearsal(lora):
    """ZoeDepth-NK dump (MiDaS BEiT core + kitti bins head; with and
    without the VEON adaptor's LoRA) converts with every key consumed and
    exact structural agreement with nn.zoedepth.ZoeDepthNK's init tree."""
    import jax.numpy as jnp

    from ref_layout_mirror import make_zoedepth_sd
    from veon_tpu.nn.zoedepth import ZoeDepthNK

    zc = _tiny_zoe()
    sd = TrackingSD(make_zoedepth_sd(zc, lora_r=lora))
    params = C.convert_zoedepth(sd, zc)
    assert _zoe_unread(sd) == [], f"converter never read: {_zoe_unread(sd)[:10]}"

    model = ZoeDepthNK(cfg=zc)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    if lora:
        assert_same_structure(params, variables["params"], "zoe")
        merged = {"params": params}
    else:
        merged = {"params": C.merge_params(variables["params"], params)}
        assert_same_structure(merged["params"], variables["params"], "zoe")
    d = model.apply(
        jax.tree_util.tree_map(jnp.asarray, merged),
        jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert np.isfinite(np.asarray(d)).all()


def test_build_model_and_params_routes_zoe_depth_ckpt(tmp_path):
    """CLI model builder: --depth-load-from with a ZOE preset must convert
    through convert_zoedepth (zoedepth_nk_v1.py layout), not convert_dav2 —
    cache-depth / test / serve on the zoe branch all load this way."""
    import os

    import torch

    from tests.test_zoedepth import _tiny_zoe

    from ref_layout_mirror import make_zoedepth_sd
    from veon_tpu.cli.main import _build_model_and_params

    cfg = presets.veon_tiny_test()
    cfg = dataclasses.replace(cfg, depth_mode="zoedepth", zoe=_tiny_zoe())
    sd = make_zoedepth_sd(cfg.zoe, lora_r=cfg.zoe.lora_r)
    # load_torch_state_dict keeps only tensor-like values
    sd = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
    path = os.path.join(str(tmp_path), "zoe.pth")
    torch.save(sd, path)
    model, variables, _, _, _ = _build_model_and_params(cfg, depth_ckpt=path)
    # converted trunk landed under depth/ with the model's structure
    assert "core" in variables["params"]["depth"]
    assert "pretrained" in variables["params"]["depth"]["core"]
    out = model.apply(
        variables,
        jnp.zeros((1, 1, 2, 64, 96, 3), jnp.float32),
        method=type(model).estimate_depth)
    assert np.isfinite(np.asarray(out)).all()
