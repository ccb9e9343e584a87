"""Train-step, EMA, depth-pretrain and CLI smoke tests (tiny config, CPU)."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from veon_tpu.configs import presets
from veon_tpu.configs.base import DepthConfig, GridConfig, LossConfig
from veon_tpu.model.veon import VeonModel
from veon_tpu.nn import text as text_mod
from veon_tpu.nn.dpt import DepthAnythingV2
from veon_tpu.cli.shapes import example_batch
from veon_tpu.train.step import (
    create_train_state,
    ema_decay,
    make_optimizer,
    make_train_step,
    stage2_trainable,
    trainable_mask,
)
from veon_tpu.train.depth_pretrain import depth_trainable, make_depth_pretrain_step
from veon_tpu.utils.params import count_parameters, param_table


def test_ema_decay_ramp():
    np.testing.assert_allclose(float(ema_decay(jnp.asarray(0.0))), 0.0)
    # at init_updates=10560 the ramp is nearly saturated
    assert float(ema_decay(jnp.asarray(10560.0))) > 0.99


def test_stage2_trainable_partition():
    assert not stage2_trainable(("depth", "pretrained", "x"))
    assert not stage2_trainable(("side_adapter", "last_block", "kernel"))
    assert not stage2_trainable(("rec_head", "resblocks", "k"))
    # frozen_exclude=["positional_embedding"] (san_config.py:46) is vacuous
    # in stage 2: the whole extractor runs under torch.no_grad
    # (san_in_veon_temporal.py:123-139), so pos-embed never moves
    assert not stage2_trainable(("clip_visual", "positional_embedding"))
    assert not stage2_trainable(("clip_visual", "segment_0_3", "kernel"))
    assert stage2_trainable(("hsa", "x"))
    assert stage2_trainable(("alignnet", "x"))


def test_single_device_train_step_updates_only_trainable():
    cfg = presets.veon_tiny_test()
    model = VeonModel(cfg=cfg)
    B = 1
    imgs, depth, metas = example_batch(cfg, B=B)
    prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    rng = np.random.default_rng(0)
    ovw = jnp.asarray(rng.standard_normal((len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, depth, metas, ovw, train=True
    )
    labels = trainable_mask(variables["params"], stage2_trainable)
    tx = make_optimizer(labels=labels)
    state = create_train_state(model, variables, tx)
    nx, ny, nz = cfg.grid.size
    batch = {
        "imgs": imgs, "depth": depth, "metas": metas,
        "voxel_semantics": jnp.asarray(rng.integers(0, 18, size=(B, nx, ny, nz)).astype(np.int32)),
        "mask_camera": jnp.ones((B, nx, ny, nz), jnp.int32),
        "ov_weight": ovw, "epoch": jnp.asarray(0, jnp.int32),
    }
    membership = text_mod.merge_matrix(refl)
    step = make_train_step(model, tx, cfg, membership, mesh=None)
    old_params = jax.tree_util.tree_map(jnp.copy, state.params)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss_total"]))

    # frozen subtrees unchanged; trainable ones moved
    def moved(a, b):
        return float(jnp.abs(a - b).max()) > 0

    assert not any(
        moved(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(old_params["side_adapter"]),
            jax.tree_util.tree_leaves(state.params["side_adapter"]))
    )
    assert not any(
        moved(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(old_params["clip_visual"]),
            jax.tree_util.tree_leaves(state.params["clip_visual"]))
    )
    assert any(
        moved(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(old_params["alignnet"]),
            jax.tree_util.tree_leaves(state.params["alignnet"]))
    )
    # EMA moved toward new params
    assert float(state.ema_updates) == 10561.0


def test_depth_pretrain_step():
    grid = GridConfig()
    dcfg = DepthConfig(encoder="vits", features=8, out_channels=(4, 8, 8, 8),
                       lora_r=2)
    model = DepthAnythingV2(cfg=dcfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((1, 1, 2, 28, 42, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(1, 40, size=(1, 2, 32, 48)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs[0, 0])
    labels = trainable_mask(variables["params"], depth_trainable)
    tx = make_optimizer(labels=labels)
    from veon_tpu.train.step import create_train_state

    state = create_train_state(model, variables, tx, init_updates=0)
    step = make_depth_pretrain_step(model, tx, grid, LossConfig(),
                                    pred_downsample=8, gt_downsample=16)
    old = jax.tree_util.tree_map(jnp.copy, state.params)
    state, losses = step(state, {"depth_imgs": imgs, "gt_depth": gt})
    assert np.isfinite(float(losses["loss_total"]))
    # trunk base weights frozen, LoRA + head move
    base = old["pretrained"]["segment_0_3"]["blocks"]["block"]["attn"]["qkv"]["base"]["kernel"]
    new_base = state.params["pretrained"]["segment_0_3"]["blocks"]["block"]["attn"]["qkv"]["base"]["kernel"]
    np.testing.assert_array_equal(np.asarray(base), np.asarray(new_base))
    lora = old["pretrained"]["segment_0_3"]["blocks"]["block"]["attn"]["qkv"]["lora_B"]
    new_lora = state.params["pretrained"]["segment_0_3"]["blocks"]["block"]["attn"]["qkv"]["lora_B"]
    assert float(jnp.abs(lora - new_lora).max()) > 0


def test_depth_pretrain_step_norm_in_graph_parity():
    """Stage-1 with raw uint8 frames + norm_in_graph must reproduce the
    host-normalized float path's losses exactly (DataConfig.raw_uint8)."""
    from veon_tpu.data.transforms import NORMALIZERS
    from veon_tpu.train.step import create_train_state

    grid = GridConfig()
    dcfg = DepthConfig(encoder="vits", features=8, out_channels=(4, 8, 8, 8),
                       lora_r=2)
    model = DepthAnythingV2(cfg=dcfg)
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(1, 1, 2, 28, 42, 3)).astype(np.uint8)
    host = NORMALIZERS["depthanythingv2"](raw.astype(np.float32))
    gt = jnp.asarray(rng.uniform(1, 40, size=(1, 2, 32, 48)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(host[0, 0]))
    variables_copy = jax.tree_util.tree_map(jnp.array, variables)
    labels = trainable_mask(variables["params"], depth_trainable)
    tx = make_optimizer(labels=labels)

    step_f32 = make_depth_pretrain_step(model, tx, grid, LossConfig())
    _, losses_f32 = step_f32(create_train_state(model, variables, tx,
                                                init_updates=0),
                             {"depth_imgs": jnp.asarray(host), "gt_depth": gt})
    step_u8 = make_depth_pretrain_step(model, tx, grid, LossConfig(),
                                       norm_in_graph="depthanythingv2")
    _, losses_u8 = step_u8(create_train_state(model, variables_copy, tx,
                                              init_updates=0),
                           {"depth_imgs": jnp.asarray(raw), "gt_depth": gt})
    for k, v in losses_f32.items():
        np.testing.assert_allclose(np.asarray(losses_u8[k]), np.asarray(v),
                                   rtol=1e-6, err_msg=k)


def test_param_table_runs():
    cfg = presets.veon_tiny_test()
    model = VeonModel(cfg=cfg)
    imgs, depth, metas = example_batch(cfg, B=1)
    prompts, _ = text_mod.build_vocabulary(cfg.vocabulary)
    ovw = jnp.zeros((len(prompts) + 1, cfg.san.clip_embed_dim))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, depth, metas, ovw, train=False
    )
    table = param_table(variables["params"], stage2_trainable)
    assert "alignnet" in table and "TOTAL" in table
    assert count_parameters(variables["params"]) > 0


def test_cli_selftest_runs(capsys):
    from veon_tpu.cli.main import main

    main(["selftest"])
    out = capsys.readouterr().out
    assert "selftest ok" in out


def test_metric_writer(tmp_path):
    import json

    from veon_tpu.utils.logging import MetricWriter

    with MetricWriter(str(tmp_path)) as w:
        w.write({"loss": 1.5, "lr": 1e-4}, step=10, epoch=0)
        w.write({"loss": 1.25}, step=20, epoch=0)
    lines = [json.loads(l) for l in open(w.path)]
    assert len(lines) == 2
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 10 and lines[0]["epoch"] == 0
    assert lines[1]["step"] == 20
    # append-only across sessions
    with MetricWriter(str(tmp_path)) as w2:
        w2.write({"loss": 1.0}, step=30)
    assert len(open(w2.path).readlines()) == 3


def test_text_classifier_from_extras():
    """CLI _text_classifier: converted text tower + bg + logit_scale ->
    (P+1, out_dim) classifier with rows of norm exp(logit_scale)."""
    import jax
    import jax.numpy as jnp

    from veon_tpu.cli.main import _text_classifier
    from veon_tpu.configs import presets
    from veon_tpu.nn import text as text_mod
    from veon_tpu.nn.vit import CLIPTextEncoder

    cfg = presets.veon_tiny_test()
    prompts, _ = text_mod.build_vocabulary(cfg.vocabulary)
    enc = CLIPTextEncoder(
        width=cfg.san.text_width, heads=cfg.san.text_heads,
        num_layers=cfg.san.text_layers, out_dim=cfg.san.clip_embed_dim,
        vocab_size=cfg.san.text_vocab_size,
        context_length=cfg.san.text_context_length,
    )
    tower = enc.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, cfg.san.text_context_length), jnp.int32))["params"]
    rng = np.random.default_rng(0)
    extras = {
        "text_tower": jax.tree_util.tree_map(np.asarray, tower),
        "bg_embed": rng.standard_normal((1, cfg.san.clip_embed_dim)).astype(np.float32),
        "logit_scale": np.float32(2.0),
    }
    # default: real tower + no BPE vocab must FAIL LOUD (round-1 weak #5)
    with pytest.raises(ValueError, match="bpe"):
        _text_classifier(cfg, prompts, extras)
    ovw, enc2, text_params = _text_classifier(cfg, prompts, extras,
                                              require_bpe=False)
    assert ovw.shape == (len(prompts) + 1, cfg.san.clip_embed_dim)
    norms = np.asarray(jnp.linalg.norm(ovw, axis=-1))
    np.testing.assert_allclose(norms, np.exp(2.0), rtol=1e-4)
    # returned tower params reusable for free-text encoding
    emb = enc2.apply(text_params, jnp.zeros((1, cfg.san.text_context_length), jnp.int32))
    assert emb.shape == (1, cfg.san.clip_embed_dim)


def test_weights_dir_resolution(tmp_path):
    """The weights-arrival drill resolves the reference README's ckpts/
    layout (README.md:118-131) and names exactly what is missing."""
    import pytest

    from veon_tpu.cli.main import _resolve_weights_dir

    with pytest.raises(FileNotFoundError) as e:
        _resolve_weights_dir(str(tmp_path), "veon_b")
    assert "clipsan/SAN_ViT-B.pth" in str(e.value)

    (tmp_path / "clipsan").mkdir()
    (tmp_path / "clipsan" / "SAN_ViT-B.pth").write_bytes(b"x")
    (tmp_path / "depth_pretrain").mkdir()
    (tmp_path / "depth_pretrain" / "depthanythingv2_pretrain_large.pth").write_bytes(b"x")
    got = _resolve_weights_dir(str(tmp_path), "veon_b")
    assert got["san"].endswith("SAN_ViT-B.pth")
    assert "bpe" not in got

    # zoe preset wants the zoedepth pretrain file instead
    with pytest.raises(FileNotFoundError) as e:
        _resolve_weights_dir(str(tmp_path), "veon_b_zoe")
    assert "zoedepth_pretrain.pth" in str(e.value)


def test_zoe_depth_pretrain_step():
    """veon-pretrain-zoedepth.py counterpart: one stage-1 step on the tiny
    ZoeDepth-NK tower. Reference freeze rule (veon_depth_pretrain.py:82-88:
    'pretrain' in name and 'lora' not in name -> frozen): BEiT trunk frozen
    except LoRA; the MiDaS scratch decoder and metric-bins head train."""
    from veon_tpu.nn.zoedepth import ZoeDepthNK
    from veon_tpu.train.depth_pretrain import (make_depth_pretrain_step,
                                               zoe_trainable)
    from veon_tpu.train.step import create_train_state
    from tests.test_zoedepth import _tiny_zoe

    grid = GridConfig()
    model = ZoeDepthNK(cfg=_tiny_zoe())
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((1, 1, 2, 64, 96, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(1, 40, size=(1, 2, 64, 96)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs[0, 0])
    labels = trainable_mask(variables["params"], zoe_trainable)
    tx = make_optimizer(labels=labels)
    state = create_train_state(model, variables, tx, init_updates=0)
    step = make_depth_pretrain_step(model, tx, grid, LossConfig())
    old = jax.tree_util.tree_map(jnp.copy, state.params)
    state, losses = step(state, {"depth_imgs": imgs, "gt_depth": gt})
    losses = jax.device_get(losses)
    assert np.isfinite(float(losses["loss_total"])), losses
    # BEiT trunk base weights frozen, its LoRA adapters move
    qkv_old = old["core"]["pretrained"]["blocks_0"]["attn"]["qkv"]
    qkv_new = state.params["core"]["pretrained"]["blocks_0"]["attn"]["qkv"]
    np.testing.assert_array_equal(np.asarray(qkv_old["base"]["kernel"]),
                                  np.asarray(qkv_new["base"]["kernel"]))
    assert float(jnp.abs(qkv_old["lora_B"] - qkv_new["lora_B"]).max()) > 0
    # bins head + scratch decoder train
    sb_old = old["seed_bin_regressor"]["fc1"]["kernel"]
    sb_new = state.params["seed_bin_regressor"]["fc1"]["kernel"]
    assert float(jnp.abs(sb_old - sb_new).max()) > 0
    rn_old = old["core"]["refinenet1"]
    rn_new = state.params["core"]["refinenet1"]
    import optax as _optax

    diff = jax.tree_util.tree_map(lambda a, b: a - b, rn_old, rn_new)
    assert float(_optax.global_norm(diff)) > 0


def test_make_optimizer_grad_accumulation():
    """--accum-steps (optax.MultiSteps): mid-accumulation micro-steps leave
    params untouched; the k-th applies the update of the AVERAGED gradient
    (== a single step on the mean grad); frozen labels stay frozen
    throughout. Grows effective batch beyond the B=1-per-chip HBM limit —
    an axis the reference lacks (it scales batch only by adding GPUs)."""
    import optax

    params = {"a": jnp.ones((3,)), "b": jnp.ones((3,))}
    labels = {"a": "train", "b": "frozen"}
    tx = make_optimizer(lr=0.1, labels=labels, accum_steps=2)
    state = tx.init(params)
    g1 = {"a": jnp.full((3,), 1.0), "b": jnp.full((3,), 1.0)}
    g2 = {"a": jnp.full((3,), 3.0), "b": jnp.full((3,), 3.0)}
    up1, state = tx.update(g1, state, params)
    p1 = optax.apply_updates(params, up1)
    np.testing.assert_array_equal(np.asarray(p1["a"]), np.asarray(params["a"]))
    up2, state = tx.update(g2, state, p1)
    p2 = optax.apply_updates(p1, up2)
    assert float(jnp.abs(p2["a"] - 1.0).max()) > 0
    np.testing.assert_array_equal(np.asarray(p2["b"]), np.ones(3))

    tx1 = make_optimizer(lr=0.1, labels=labels)
    s1 = tx1.init(params)
    gm = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    upm, _ = tx1.update(gm, s1, params)
    pm = optax.apply_updates(params, upm)
    np.testing.assert_allclose(np.asarray(p2["a"]), np.asarray(pm["a"]),
                               rtol=1e-6)


def test_ema_gating_under_accumulation():
    """EMA advances per OPTIMIZER update, not per micro-step: with
    accum_steps=k the MEGVII ramp/horizon would otherwise be divided by k
    and the EMA would get k-1 extra pulls toward frozen params."""
    import optax

    from veon_tpu.train.step import ema_decay, ema_step_fields

    tx = make_optimizer(lr=0.1, accum_steps=2)
    params = {"a": jnp.ones(2)}
    st = tx.init(params)

    class S:
        ema_updates = jnp.asarray(5.0)

    _, st1 = tx.update({"a": jnp.ones(2)}, st, params)
    d, upd = ema_step_fields(S, st1)  # mid-accumulation micro-step
    assert float(d) == 1.0 and float(upd) == 5.0
    _, st2 = tx.update({"a": jnp.ones(2)}, st1, params)
    d2, upd2 = ema_step_fields(S, st2)  # averaged update applied
    assert float(upd2) == 6.0
    np.testing.assert_allclose(float(d2), float(ema_decay(jnp.asarray(6.0))),
                               rtol=1e-5)

    # plain chain (no MultiSteps): every step counts, as before
    tx0 = make_optimizer(lr=0.1)
    st0 = tx0.init(params)
    _, st0 = tx0.update({"a": jnp.ones(2)}, st0, params)
    d0, upd0 = ema_step_fields(S, st0)
    assert float(upd0) == 6.0
    np.testing.assert_allclose(float(d0), float(ema_decay(jnp.asarray(6.0))),
                               rtol=1e-5)


def test_depth_pretrain_step_with_accumulation():
    """accum_steps=2 through the REAL jitted step (TrainState + MultiSteps
    opt_state + donate): micro-step 1 leaves params and the EMA counter
    untouched; micro-step 2 applies the averaged update and ticks the EMA
    exactly once."""
    from veon_tpu.train.step import create_train_state

    grid = GridConfig()
    dcfg = DepthConfig(encoder="vits", features=8, out_channels=(4, 8, 8, 8),
                       lora_r=2)
    model = DepthAnythingV2(cfg=dcfg)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((1, 1, 2, 28, 42, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(1, 40, size=(1, 2, 32, 48)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs[0, 0])
    labels = trainable_mask(variables["params"], depth_trainable)
    tx = make_optimizer(labels=labels, accum_steps=2)
    state = create_train_state(model, variables, tx, init_updates=0)
    step = make_depth_pretrain_step(model, tx, grid, LossConfig())
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    ema0 = jax.tree_util.tree_map(jnp.copy, state.ema_params)
    state, _ = step(state, {"depth_imgs": imgs, "gt_depth": gt})
    # mid-accumulation: nothing moved, EMA untouched, counter not advanced
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(ema0),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(state.ema_updates) == 0.0
    state, losses = step(state, {"depth_imgs": imgs, "gt_depth": gt})
    assert np.isfinite(float(losses["loss_total"]))
    assert float(state.ema_updates) == 1.0
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(state.params)))
    assert moved


def test_pretrain_depth_cli_end_to_end(tmp_path, monkeypatch):
    """Stage-1 (`tools/dist_train.sh configs/veon/veon-pretrain-*.py`)
    through the CLI on the mini nuScenes fixture: dataset -> LiDAR depth GT
    -> jitted LoRA pretrain step -> checkpoint in work_dir."""
    from tests.test_data_pipeline import _make_fixture

    from veon_tpu.ckpt.io import find_latest
    from veon_tpu.cli.main import main
    from veon_tpu.configs import presets

    root = str(tmp_path)
    pkl = _make_fixture(root)

    def veon_tiny_fixture(num_temporal=1):
        cfg = presets.veon_tiny_test(num_temporal=num_temporal)
        return dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, src_size=(90, 160)))

    monkeypatch.setattr(presets, "veon_tiny_fixture", veon_tiny_fixture,
                        raising=False)
    work = os.path.join(root, "work_pretrain")
    main(["pretrain-depth", "--preset", "veon_tiny_fixture",
          "--data-root", root, "--ann", pkl, "--workers", "1",
          "--epochs", "1", "--work-dir", work])
    latest = find_latest(work)
    assert latest is not None, os.listdir(work)


def test_benchmark_streaming_tiny():
    """`benchmark --num-temporal 2` (benchmark_sequential.py counterpart):
    the on-device sequential loop rolls the early-vox cache as the scan
    carry and reports steady-state fps as one JSON-able dict."""
    import argparse

    from veon_tpu.cli.main import _benchmark_streaming

    args = argparse.Namespace(preset="veon_tiny_test", num_temporal=2)
    out = _benchmark_streaming(args, n_iters=2, outer=1)
    assert out["metric"] == "veon_tiny_test_streaming_t2_frames_per_sec"
    assert out["value"] > 0 and out["detail"]["ms_per_frame"] > 0
    assert out["detail"]["device_loop_iters"] == 2


def test_publish_checkpoint(tmp_path):
    """publish (tools/model_converters/publish_model.py counterpart):
    training state strips to {params, batch_stats}, the output dir is
    stamped with a deterministic content hash, and --ema publishes the
    EMA shadow as the weights."""
    import glob

    from veon_tpu.ckpt.io import (load_checkpoint, publish_checkpoint,
                                  save_checkpoint)

    state = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "batch_stats": {"bn": {"mean": np.zeros(3, np.float32)}},
        "ema_params": {"w": np.ones((2, 3), np.float32)},
        "ema_batch_stats": {"bn": {"mean": np.ones(3, np.float32)}},
        "opt_state": {"mu": {"w": np.full((2, 3), 7.0, np.float32)}},
        "step": np.int32(5),
        "ema_updates": np.float32(3.0),
    }
    path = save_checkpoint(str(tmp_path / "ckpt"), 5, state)
    out = publish_checkpoint(path, str(tmp_path / "pub"), ema=False)
    assert len(out.rsplit("-", 1)[1]) == 8
    pub = load_checkpoint(out)
    assert set(pub) == {"params", "batch_stats"}
    np.testing.assert_array_equal(pub["params"]["w"], state["params"]["w"])
    out_ema = publish_checkpoint(path, str(tmp_path / "pub_ema"), ema=True)
    np.testing.assert_array_equal(load_checkpoint(out_ema)["params"]["w"],
                                  np.ones((2, 3), np.float32))
    # content hash: differs across different weights, stable across re-runs
    assert out.rsplit("-", 1)[1] != out_ema.rsplit("-", 1)[1]
    out2 = publish_checkpoint(path, str(tmp_path / "again" / "pub"),
                              ema=False)
    assert out2.rsplit("-", 1)[1] == out.rsplit("-", 1)[1]
    # CLI wrapper
    from veon_tpu.cli.main import main as cli_main

    cli_main(["publish", "--ckpt", path,
              "--out-prefix", str(tmp_path / "pub2")])
    assert glob.glob(str(tmp_path / "pub2-*"))


def test_ckpt_eval_variables_guard():
    """The --ema published-checkpoint guard applies uniformly (single --ckpt
    AND per checkpoint in an --all-ckpts sweep): a stripped/published state
    dict with --ema exits with the clear message, not a raw KeyError."""
    from veon_tpu.cli.main import _ckpt_eval_variables

    full = {"params": {"w": 1}, "batch_stats": {"b": 2},
            "ema_params": {"w": 3}, "ema_batch_stats": {"b": 4}}
    assert _ckpt_eval_variables(full, ema=False) == {
        "params": {"w": 1}, "batch_stats": {"b": 2}}
    assert _ckpt_eval_variables(full, ema=True) == {
        "params": {"w": 3}, "batch_stats": {"b": 4}}
    published = {"params": {"w": 1}, "batch_stats": {"b": 2}}
    assert _ckpt_eval_variables(published, ema=False)["params"] == {"w": 1}
    with pytest.raises(SystemExit, match="published"):
        _ckpt_eval_variables(published, ema=True, path="work/step_5")


def test_list_checkpoints_range(tmp_path):
    """--sweep-from/--sweep-to (dist_test_all.sh $start/$end counterpart):
    list_checkpoints bounds the sweep by step."""
    from veon_tpu.ckpt.io import list_checkpoints

    for n in (5, 10, 15, 20):
        os.makedirs(tmp_path / f"step_{n}")
    (tmp_path / "step_bogus").mkdir()
    allsteps = [s for s, _ in list_checkpoints(str(tmp_path))]
    assert allsteps == [5, 10, 15, 20]
    assert [s for s, _ in list_checkpoints(str(tmp_path), min_step=10)] == [10, 15, 20]
    assert [s for s, _ in list_checkpoints(str(tmp_path), max_step=15)] == [5, 10, 15]
    assert [s for s, _ in list_checkpoints(str(tmp_path), 10, 15)] == [10, 15]


def test_fast_preset_ladder_config():
    """veon_b_fast/fast2 differ from veon_b ONLY in dav2_target (the
    accuracy-gated serving knob) — same weights contract, same topology."""
    import dataclasses

    from veon_tpu.configs import presets

    base = presets.veon_b()
    for name, tgt in (("veon_b_fast", 224), ("veon_b_fast2", 196)):
        fast = getattr(presets, name)()
        assert fast.data.dav2_target == tgt
        assert dataclasses.replace(
            fast, data=dataclasses.replace(fast.data, dav2_target=252)) == base
        # same CLI contract as veon_b (benchmark passes compute_dtype)
        assert getattr(presets, name)(
            num_temporal=2, compute_dtype="bfloat16").num_temporal == 2
