"""Camera-sharded SPMD serving parity (serve/camshard.py).

The sharded graph must reproduce the single-device forward exactly (up to
fp32 summation order in the voxel pool): towers run on each shard's local
cameras, the lifted grids psum over the "cam" mesh axis, and the 3D stage
runs replicated. No reference counterpart (the reference serves
single-GPU); parity is against our own single-device graph.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from veon_tpu.serve.camshard import (make_camera_sharded_forward,
                                     prepare_camshard_metas)


def _compare(out, ref, rtol=2e-4, atol=2e-4):
    assert set(out.keys()) == set(ref.keys())
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=rtol, atol=atol,
            err_msg=k)


@pytest.mark.parametrize("num_shards", [2, 3])
def test_camshard_parity_banded(tiny_graph, num_shards):
    g = tiny_graph(1)
    mesh = Mesh(np.asarray(jax.devices()[:num_shards]), ("cam",))
    metas = prepare_camshard_metas(g["cfg"], g["metas"], num_shards)
    fwd = make_camera_sharded_forward(g["cfg"], mesh, method="forward")
    out = fwd(g["params"], g["imgs"], g["depth"], metas, g["ovw"])
    # per-camera leaves keep the full camera count after unsharding
    assert out["sem_seg_ds"].shape == g["out"]["sem_seg_ds"].shape
    _compare(out, g["out"])


def test_camshard_2d_mesh_train_step_agreement():
    """2D (data x camera) parallel training: one step on a ("batch", "cam")
    = (2, 3) mesh must agree with the single-device step on the same batch.

    Gradient reduction over the cam axis is a uniform pmean: under
    check_rep=False every loss->tower-param backward path crosses exactly
    one cam collective (lift psum or output all_gather), whose transpose
    multiplies each shard's contribution by the shard count S, so
    pmean(S * contrib_s) = total; replicated 3D-stage grads cross none and
    pmean is their identity (train/step.py comment). A wrong combine is an
    exact S x gradient-scale error, so the test uses plain SGD and compares
    the parameter DELTAS (= -lr * grad elementwise), which Adam's
    sign-normalized update would mask."""
    import jax.numpy as jnp
    import optax
    from veon_tpu.cli.shapes import example_batch
    from veon_tpu.configs import presets
    from veon_tpu.model.veon import VeonModel
    from veon_tpu.nn import text as text_mod
    from veon_tpu.train.step import create_train_state, make_train_step

    cfg = presets.veon_tiny_test()
    B, lr = 2, 0.1
    imgs, depth, metas = example_batch(cfg, B=B)
    metas = prepare_camshard_metas(cfg, metas, 3)
    prompts, refl = text_mod.build_vocabulary(cfg.vocabulary)
    rng = np.random.default_rng(7)
    ovw = jnp.asarray(rng.standard_normal(
        (len(prompts) + 1, cfg.san.clip_embed_dim)).astype(np.float32))
    nx, ny, nz = cfg.grid.size
    batch = {
        "imgs": imgs, "depth": depth, "metas": metas,
        "voxel_semantics": jnp.asarray(
            rng.integers(0, 18, size=(B, nx, ny, nz)).astype(np.int32)),
        "mask_camera": jnp.ones((B, nx, ny, nz), jnp.int32),
        "ov_weight": ovw, "epoch": jnp.asarray(0, jnp.int32),
    }
    membership = text_mod.merge_matrix(refl)
    tx = optax.sgd(lr)

    model_1 = VeonModel(cfg=cfg)
    variables = jax.jit(model_1.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs[:1], depth[:1],
        jax.tree_util.tree_map(lambda x: x[:1], metas), ovw, train=True)
    v_copy = jax.tree_util.tree_map(jnp.copy, variables)
    # host snapshot before the steps donate/consume the device buffers
    base_params = jax.tree_util.tree_map(np.asarray, variables["params"])

    mesh = Mesh(np.asarray(jax.devices()[:6]).reshape(2, 3),
                ("batch", "cam"))
    model_2d = VeonModel(cfg=cfg, bn_axis_name="batch", cam_axis_name="cam")
    step_2d = make_train_step(model_2d, tx, cfg, membership, mesh=mesh,
                              cam_axis="cam")
    state_2d, losses_2d = step_2d(
        create_train_state(model_2d, v_copy, tx), batch)
    losses_2d = {k: float(v) for k, v in jax.device_get(losses_2d).items()}

    step_1 = make_train_step(model_1, tx, cfg, membership, mesh=None)
    state_1, losses_1 = step_1(
        create_train_state(model_1, variables, tx), batch)
    losses_1 = {k: float(v) for k, v in jax.device_get(losses_1).items()}

    for k in losses_1:
        np.testing.assert_allclose(
            losses_2d[k], losses_1[k], rtol=2e-4,
            err_msg=f"{k}: 2D {losses_2d[k]} vs single {losses_1[k]}")

    # compare the parameter DELTAS (= -lr * grad with SGD), not the params:
    # a cam-axis reduction error (e.g. psum where pmean belongs = 3x
    # gradient scale) changes the delta, which a params-level rtol would
    # swallow whenever |lr*grad| << rtol*|param|
    flat_2d = jax.tree_util.tree_leaves_with_path(state_2d.params)
    flat_1 = jax.tree_util.tree_leaves_with_path(state_1.params)
    base = jax.tree_util.tree_leaves_with_path(base_params)
    moved = 0.0
    for (p2, l2), (p1, l1), (_, lb) in zip(flat_2d, flat_1, base):
        assert p2 == p1
        d2 = np.asarray(l2) - np.asarray(lb)
        d1 = np.asarray(l1) - np.asarray(lb)
        # atol 1e-5: fp32 summation-order noise (the sharded lift psum /
        # batch pmean reassociate the reductions) reaches ~4e-6 on deltas of
        # ~1e-4 magnitude; a wrong cam-axis combine would be a 3x/6x scale
        # error, orders of magnitude above this bound
        np.testing.assert_allclose(
            d2, d1, rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(p2))
        if d1.size:
            moved = max(moved, float(np.abs(d1).max()))
    # the comparison must not be vacuous: something actually trained
    assert moved > 1e-6, "no parameter moved — vacuous agreement"


def test_camshard_parity_presorted(tiny_graph):
    """Fixed-rig accelerate serving under camera sharding: per-shard
    precomputed rank sorts (padded to a common length with overflow rows)
    must agree with the banded single-device graph — both are exact
    formulations of the same two-hot splat."""
    g = tiny_graph(1)
    num_shards = 2
    mesh = Mesh(np.asarray(jax.devices()[:num_shards]), ("cam",))
    metas = prepare_camshard_metas(g["cfg"], g["metas"], num_shards,
                                   presort=True)
    assert metas["lift_sorted"]["order"].shape[0] == num_shards
    fwd = make_camera_sharded_forward(g["cfg"], mesh, method="forward")
    out = fwd(g["params"], g["imgs"], g["depth"], metas, g["ovw"])
    _compare(out, g["out"])


def test_train_cli_cam_shards_wiring(tmp_path, monkeypatch):
    """`veon_tpu train --cam-shards 2` plumbing: the CLI must build the 2D
    ("batch", "cam") mesh, clone the step model with cam_axis_name="cam",
    pass cam_axis through to make_train_step, and pin full-rig
    sensor2keyegos into every batch's metas. The step math itself is proven
    by test_camshard_2d_mesh_train_step_agreement — here the factory is
    stubbed so the test costs no train-graph compile."""
    import dataclasses
    import os

    from tests.test_data_pipeline import _make_fixture

    from veon_tpu.cli.main import main
    from veon_tpu.configs import presets
    from veon_tpu.train import step as step_mod

    root = str(tmp_path)
    pkl = _make_fixture(root)

    def veon_tiny_fixture(num_temporal=1):
        cfg = presets.veon_tiny_test(num_temporal=num_temporal)
        return dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, src_size=(90, 160)))

    monkeypatch.setattr(presets, "veon_tiny_fixture", veon_tiny_fixture,
                        raising=False)

    seen = {}

    def fake_make_train_step(model, tx, cfg, membership, mesh=None,
                             cam_axis=None):
        seen["mesh_axes"] = mesh.axis_names if mesh is not None else None
        seen["mesh_shape"] = tuple(mesh.devices.shape) if mesh is not None else None
        seen["cam_axis"] = cam_axis
        seen["model_cam_axis_name"] = model.cam_axis_name

        def step(state, batch):
            s2k = batch["metas"]["sensor2keyegos"]
            assert s2k.ndim == 5 and s2k.shape[2] == 6, s2k.shape
            seen["batches"] = seen.get("batches", 0) + 1
            return state, {"loss_total": np.float32(0.0)}

        return step

    monkeypatch.setattr(step_mod, "make_train_step", fake_make_train_step)
    work = os.path.join(root, "work_camshard")
    main(["train", "--preset", "veon_tiny_fixture", "--data-root", root,
          "--ann", pkl, "--workers", "1", "--epochs", "1",
          "--batch-size", "1", "--cam-shards", "2", "--work-dir", work])
    assert seen["mesh_axes"] == ("batch", "cam")
    assert seen["mesh_shape"] == (4, 2)  # 8 virtual devices / 2 cam shards
    assert seen["cam_axis"] == "cam"
    assert seen["model_cam_axis_name"] == "cam"
    assert seen.get("batches", 0) >= 1


def test_camshard_streaming_session_parity(tiny_graph):
    """Camera sharding composed with the streaming temporal cache: a
    3-shard TemporalSession rolled through (prev, current) frames must
    reproduce the batched single-device recompute output — i.e. the two
    serving accelerations (early-vox reuse + cam-axis tower sharding)
    compose exactly. Steady-state latency model: tower/S + warp + fusion."""
    from veon_tpu.serve import TemporalSession

    g = tiny_graph(2)
    model, params = g["model"], g["params"]
    imgs, depth, metas = g["imgs"], g["depth"], g["metas"]

    def frame_metas(f):
        m = {k: v[:, f:f + 1] for k, v in metas.items()
             if k in ("sensor2egos", "ego2globals", "intrins", "post_rots",
                      "post_trans")}
        m["bda"] = metas["bda"]
        return m

    mesh = Mesh(np.asarray(jax.devices()[:3]), ("cam",))
    sess = TemporalSession(model, params, g["ovw"], estimate_depth=False,
                           mesh=mesh)

    m1 = frame_metas(1)
    m1["lidarego2global"] = metas["prev_lidarego2global"][:, 0]
    sess.infer(imgs[:, 1:2], depth[:, 1:2], m1)

    m0 = frame_metas(0)
    m0["lidarego2global"] = metas["lidarego2global"]
    out = sess.infer(imgs[:, 0:1], depth[:, 0:1], m0)
    assert sess.calls == 2

    for k in g["out"]:  # batched recompute (frame 0 current, frame 1 prev)
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(g["out"][k]),
            rtol=2e-4, atol=2e-4, err_msg=k)


def test_camshard_serve_handler_full_forward_parity():
    """`veon_tpu serve --cam-shards 3` (single-frame mode): the sharded
    handler must match the unsharded handler on the same request. This is
    also the only test driving the DEPTH TOWER under camera sharding
    (full_forward; the other parity tests feed metric depth), plus the
    fusion rule and in-graph retrieval on the replicated voxel leaves."""
    import argparse

    from veon_tpu.cli.main import _build_serve_handler
    from veon_tpu.cli.shapes import example_batch_full
    from veon_tpu.configs import presets

    cfg = presets.veon_tiny_test()
    imgs, depth_imgs, metas = example_batch_full(cfg, B=1)
    te = np.random.default_rng(11).standard_normal(
        cfg.propagation.clip_proj_dim).astype(np.float32)
    req = dict(imgs=np.asarray(imgs), depth_imgs=np.asarray(depth_imgs),
               text_embed=te)

    outs = {}
    for shards in (1, 3):
        args = argparse.Namespace(
            preset="veon_tiny_test", num_temporal=1, load_from=None,
            depth_load_from=None, bpe_path=None, cam_shards=shards)
        handler, required, _expect, exclusive = _build_serve_handler(args)
        assert required == ("imgs", "depth_imgs")
        assert not exclusive
        outs[shards] = handler(**req)

    # int32 fusion-rule classes: identical up to fp32 psum-reorder ties
    same = np.mean(outs[1]["pred"] == outs[3]["pred"])
    assert same >= 0.999, f"pred agreement {same}"
    np.testing.assert_allclose(outs[3]["retrieval"], outs[1]["retrieval"],
                               rtol=2e-4, atol=2e-4)
