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
    state = create_train_state(model, variables, tx)
    membership = text_mod.merge_matrix(refl)
    step = make_train_step(model, tx, cfg, membership, mesh=None)
    batch = _to_device(batch)
    batch["ov_weight"] = ovw
    batch["epoch"] = jnp.asarray(0, jnp.int32)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss_total"]))


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
