"""End-to-end graph tests for VeonModel on the tiny test config (CPU).

The (cfg, model, params, inputs, outputs) tuples come from the session-
scoped `tiny_graph` fixture (tests/conftest.py) — one init + apply compile
per num_temporal, shared with test_precision."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from veon_tpu.model.veon import VeonModel, fusion_rule
from veon_tpu.nn import text as text_mod


def _metas(B, F, N, rng):
    def eye(n, *lead):
        return np.tile(np.eye(n, dtype=np.float32), lead + (1, 1))

    s2e = eye(4, B, F, N)
    for i in range(N):
        th = i * 2 * np.pi / N
        R = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
            np.float32,
        )
        s2e[:, :, i, :3, :3] = R
    e2g = eye(4, B, F, N)
    e2g[..., 0, 3] = rng.normal(0, 1, size=(B, F, N)).astype(np.float32)
    K = eye(3, B, F, N)
    K[..., 0, 0] = 60.0
    K[..., 1, 1] = 60.0
    K[..., 0, 2] = 88.0
    K[..., 1, 2] = 32.0
    post_rot = eye(3, B, F, N)
    post_tran = np.zeros((B, F, N, 3), np.float32)
    bda = eye(3, B)
    metas = {
        "sensor2egos": jnp.asarray(s2e),
        "ego2globals": jnp.asarray(e2g),
        "intrins": jnp.asarray(K),
        "post_rots": jnp.asarray(post_rot),
        "post_trans": jnp.asarray(post_tran),
        "bda": jnp.asarray(bda),
        "lidarego2global": jnp.asarray(eye(4, B)),
        "prev_lidarego2global": jnp.asarray(eye(4, B, max(F - 1, 1))),
    }
    return metas


def test_full_graph_single_frame(tiny_graph):
    g = tiny_graph(1)
    cfg, refl, out = g["cfg"], g["refl"], g["out"]
    nx, ny, nz = cfg.grid.size
    P = 66
    assert out["bin_occ"].shape == (1, nz, ny, nx, 2)
    assert out["feat_occ"].shape == (1, nz, ny, nx, cfg.propagation.clip_proj_dim)
    assert out["sem_occ_raw"].shape == (1, nz, ny, nx, P + 1)
    assert out["sem_seg_ds"].shape[0:2] == (1, 6)
    assert out["sem_seg_ds"].shape[-1] == P
    for v in out.values():
        assert not bool(jnp.isnan(v).any())

    # synonym merge + fusion rule
    m = text_mod.merge_matrix(refl)
    merged = text_mod.merge_classes_max(out["sem_occ_raw"], m, axis=-1)
    assert merged.shape == (1, nz, ny, nx, 18)
    pred = fusion_rule(merged, out["bin_occ"])
    assert pred.shape == (1, nx, ny, nz)
    assert int(pred.max()) <= 17 and int(pred.min()) >= 0


def test_full_graph_temporal(tiny_graph):
    g = tiny_graph(2)
    cfg, out = g["cfg"], g["out"]
    nx, ny, nz = cfg.grid.size
    assert out["bin_occ"].shape == (1, nz, ny, nx, 2)
    for v in out.values():
        assert not bool(jnp.isnan(v).any())


def test_full_graph_temporal_t3(tiny_graph):
    """num_temporal=3 (README.md:254-266 trains N_T up to 4): exercises the
    pairwise cat-conv chain in TemporalFusion (t_fuse_0 merges the two prev
    frames, t_fuse_1 merges with current — Middle3x3Seq semantics,
    align_net_occ3d.py:25-72) and the deformable stencil at F>2."""
    g = tiny_graph(3)
    cfg, out = g["cfg"], g["out"]
    nx, ny, nz = cfg.grid.size
    assert out["bin_occ"].shape == (1, nz, ny, nx, 2)
    for v in out.values():
        assert not bool(jnp.isnan(v).any())


@pytest.mark.parametrize("preset", ["veon_l", "veon_l_zoe"])
def test_veon_l_config_wiring_eval_shape(preset):
    """VEON-L (SAN ViT-L-14-336 + HSA-1024 + 768-d CLIP space), both depth
    branches, wires end-to-end: abstract-trace the full forward at
    production L dims via eval_shape (no FLOPs run) and check the output
    contract. Catches any dimension mismatch across the L preset's fusion
    maps / head widths (configs/veon/veon-temporal-large-*)."""
    import jax

    from veon_tpu.cli.shapes import example_batch_full
    from veon_tpu.configs import presets

    cfg = getattr(presets, preset)()
    model = VeonModel(cfg=cfg)
    imgs, depth_imgs, metas = example_batch_full(cfg, B=1)
    ovw = jnp.zeros((67, cfg.san.clip_embed_dim), jnp.float32)

    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), imgs, depth_imgs, metas,
                           ovw, train=False, method=VeonModel.full_forward))

    def fwd(variables):
        return model.apply(variables, imgs, depth_imgs, metas, ovw,
                           train=False, method=VeonModel.full_forward)

    out = jax.eval_shape(fwd, var_shapes)
    nx, ny, nz = cfg.grid.size
    assert out["feat_occ"].shape == (1, nz, ny, nx, cfg.propagation.clip_proj_dim)
    assert out["bin_occ"].shape == (1, nz, ny, nx, 2)
    assert out["sem_occ_raw"].shape == (1, nz, ny, nx, 67)
    assert cfg.propagation.clip_proj_dim == 768  # L-specific CLIP space
    assert out["clip_feat"].shape[-1] == 768


def test_streaming_temporal_parity(tiny_graph):
    """Streaming serving (cache each frame's forward_early vox, reuse it as
    "previous" next step) must equal the batched temporal recompute path —
    same tensors by construction, so outputs match to fp tolerance. This is
    the TPU-first serving mode with steady-state cost ~ T1 + warp + fusion
    instead of the reference's full recompute (san_in_veon_temporal.py:
    158-173)."""
    g = tiny_graph(2)
    model, params = g["model"], g["params"]
    imgs, depth, metas, ovw = g["imgs"], g["depth"], g["metas"], g["ovw"]
    out_ref = g["out"]

    # streaming: frame 1 (the previous frame) goes through forward_early
    # with ITS OWN single-frame metas, gets cached, then the current frame
    # runs forward_streaming against the cache
    def frame_metas(f):
        m = {k: v[:, f:f + 1] for k, v in metas.items()
             if k in ("sensor2egos", "ego2globals", "intrins", "post_rots",
                      "post_trans")}
        m["bda"] = metas["bda"]
        return m

    vox_prev = jax.jit(
        lambda p, i, d, m: model.apply(p, i, d, m, method=VeonModel.forward_early)
    )(params, imgs[:, 1:2], depth[:, 1:2], frame_metas(1))

    metas_cur = frame_metas(0)
    metas_cur["lidarego2global"] = metas["lidarego2global"]
    out_stream = jax.jit(
        lambda p, i, d, m, o, pv, pl: model.apply(
            p, i, d, m, o, pv, pl, method=VeonModel.forward_streaming)
    )(params, imgs[:, 0:1], depth[:, 0:1], metas_cur, ovw,
      vox_prev[:, None], metas["prev_lidarego2global"])

    # streaming additionally returns the current frame's pre-fusion vox so
    # the serving loop can cache it for the next step at zero extra cost
    assert set(out_stream) == set(out_ref) | {"early_vox"}
    for k in out_ref:
        np.testing.assert_allclose(
            np.asarray(out_stream[k]), np.asarray(out_ref[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)

    # the cached vox must equal what forward_early would produce for the
    # current frame (it becomes the next step's prev_vox)
    vox_cur = jax.jit(
        lambda p, i, d, m: model.apply(p, i, d, m, method=VeonModel.forward_early)
    )(params, imgs[:, 0:1], depth[:, 0:1], frame_metas(0))
    np.testing.assert_allclose(np.asarray(out_stream["early_vox"]),
                               np.asarray(vox_cur), rtol=2e-4, atol=2e-5)


def test_full_graph_temporal_t4_wiring_eval_shape():
    """num_temporal=4 (the reference's maximum, README.md:254-266): abstract-
    trace init + apply at tiny dims — the pairwise cat-conv chain grows to
    t_fuse_0..2 and the stencil-deformable runs over 3 prev frames. T3 runs
    concretely (test_full_graph_temporal_t3 / the T3 train-step test); T4
    checks the wiring contract without another ~35 s compile."""
    from veon_tpu.configs import presets

    cfg = presets.veon_tiny_test(num_temporal=4)
    rng = np.random.default_rng(0)
    B, F, N = 1, 4, 6
    H, W = cfg.data.input_size
    imgs = jnp.zeros((B, F, N, H, W, 3), jnp.float32)
    depth = jnp.ones((B, F, N, H // 2, W // 2), jnp.float32)
    metas = _metas(B, F, N, rng)
    from veon_tpu.nn import text as text_mod

    prompts, _ = text_mod.build_vocabulary()
    ovw = jnp.zeros((len(prompts) + 1, cfg.san.clip_embed_dim), jnp.float32)
    model = VeonModel(cfg=cfg)
    var_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), imgs, depth, metas, ovw,
                           train=False))
    # 3 prev frames -> pairwise merges t_fuse_0..1 + final fuse t_fuse_2
    # (exactly; a num_temporal=2 model only has t_fuse_0)
    tf = var_shapes["params"]["alignnet"]["temporal_fusion"]
    got = {k for k in tf if k.startswith("t_fuse")}
    assert got == {"t_fuse_0", "t_fuse_1", "t_fuse_2"}, sorted(tf)
    out = jax.eval_shape(
        lambda v: model.apply(v, imgs, depth, metas, ovw, train=False),
        var_shapes)
    nx, ny, nz = cfg.grid.size
    assert out["bin_occ"].shape == (1, nz, ny, nx, 2)
    assert out["sem_occ_raw"].shape[-1] == len(prompts) + 1
