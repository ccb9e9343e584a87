"""Tests for frustum geometry, voxel ranks and the LSS lift.

Validates against a torch re-derivation of the reference math
(`view_transformer_raw.py:121-158, 244-302, 406-429`) using only public
torch ops, plus invariants (mass conservation of the scatter).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from veon_tpu.configs.base import GridConfig
from veon_tpu.geometry.frustum import create_frustum, frustum_to_ego, voxel_ranks
from veon_tpu.lift.lss import (
    LSSLift,
    depth_bins_one_hot_gt,
    min_pool_depth,
    one_hot_depth,
    two_hot_depth,
)

torch = pytest.importorskip("torch")

GRID = GridConfig(
    x=(-8.0, 8.0, 2.0), y=(-8.0, 8.0, 2.0), z=(-1.0, 3.0, 1.0), depth=(1.0, 9.0, 1.0)
)


def _identity_metas(B, N):
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    # put cameras at origin looking +z with a simple pinhole
    K = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    K[..., 0, 0] = 10.0
    K[..., 1, 1] = 10.0
    K[..., 0, 2] = 8.0
    K[..., 1, 2] = 4.0
    post_rot = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    post_tran = np.zeros((B, N, 3), dtype=np.float32)
    bda = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    return s2e, K, post_rot, post_tran, bda


def test_frustum_template_matches_reference_semantics():
    fr = create_frustum(GRID, (16, 16), 4)
    D = fr.shape[0]
    assert D == 8  # (9-1)/1
    assert fr.shape == (8, 4, 4, 3)
    # x spans [0, 15] in 4 samples, depth is bin lower edges 1..8
    np.testing.assert_allclose(fr[0, 0, :, 0], np.linspace(0, 15, 4))
    np.testing.assert_allclose(fr[:, 0, 0, 2], np.arange(1.0, 9.0))


def _torch_get_lidar_coor(frustum, s2e, K, post_rot, post_tran, bda):
    """Re-derivation of get_lidar_coor with public torch ops."""
    B, N = s2e.shape[:2]
    fr = torch.from_numpy(frustum)
    points = fr[None, None] - torch.from_numpy(post_tran).view(B, N, 1, 1, 1, 3)
    points = torch.inverse(torch.from_numpy(post_rot)).view(B, N, 1, 1, 1, 3, 3).matmul(
        points.unsqueeze(-1)
    )
    points = torch.cat(
        (points[..., :2, :] * points[..., 2:3, :], points[..., 2:3, :]), 5
    )
    s2e_t = torch.from_numpy(s2e)
    combine = s2e_t[:, :, :3, :3].matmul(torch.inverse(torch.from_numpy(K)))
    points = combine.view(B, N, 1, 1, 1, 3, 3).matmul(points).squeeze(-1)
    points = points + s2e_t[:, :, :3, 3].view(B, N, 1, 1, 1, 3)
    points = torch.from_numpy(bda).view(B, 1, 1, 1, 1, 3, 3).matmul(
        points.unsqueeze(-1)
    ).squeeze(-1)
    return points.numpy()


def test_frustum_to_ego_matches_torch_chain():
    B, N = 2, 3
    rng = np.random.default_rng(3)
    fr = create_frustum(GRID, (16, 16), 4)
    s2e, K, post_rot, post_tran, bda = _identity_metas(B, N)
    # random small rotations/translations to exercise the full chain
    s2e[..., :3, 3] += rng.normal(0, 0.5, size=(B, N, 3)).astype(np.float32)
    post_tran += rng.normal(0, 1.0, size=(B, N, 3)).astype(np.float32)
    th = 0.1
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        dtype=np.float32,
    )
    bda[:] = rot
    want = _torch_get_lidar_coor(fr, s2e, K, post_rot, post_tran, bda)
    got = np.asarray(
        frustum_to_ego(
            jnp.asarray(fr), jnp.asarray(s2e), jnp.asarray(K),
            jnp.asarray(post_rot), jnp.asarray(post_tran), jnp.asarray(bda),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_voxel_ranks_layout_and_mask():
    # single point at known location
    coor = jnp.zeros((1, 1, 1, 1, 3, 3))
    coor = coor.at[0, 0, 0, 0, 0].set(jnp.array([-7.9, -7.9, -0.9]))  # voxel (0,0,0)
    coor = coor.at[0, 0, 0, 0, 1].set(jnp.array([7.9, 7.9, 2.9]))  # voxel (7,7,3)
    coor = coor.at[0, 0, 0, 0, 2].set(jnp.array([100.0, 0.0, 0.0]))  # out of range
    ranks, valid = voxel_ranks(coor, GRID)
    nx, ny, nz = GRID.size
    assert (nx, ny, nz) == (8, 8, 4)
    assert int(ranks[0, 0, 0, 0, 0]) == 0
    assert int(ranks[0, 0, 0, 0, 1]) == ((3 * ny + 7) * nx + 7)
    assert int(ranks[0, 0, 0, 0, 2]) == nx * ny * nz
    assert bool(valid[0, 0, 0, 0, 0]) and not bool(valid[0, 0, 0, 0, 2])


def _torch_two_hot(depth, grid: GridConfig, gamma=4.0):
    """Reference semantics of get_two_hot_depth (view_transformer_raw.py:406-429)."""
    D = grid.num_depth_bins
    t = torch.from_numpy(depth)
    centers = torch.arange(D + 1).float() * grid.depth[2] + (
        grid.depth[0] + grid.depth[2] / 2
    )
    gap = -torch.abs(t[..., None] - centers) * gamma
    gap = torch.clamp(gap, min=-16.0)
    dist = torch.softmax(gap, dim=-1)[..., :D]
    return np.moveaxis(dist.numpy(), -1, -3)


def test_two_hot_depth_matches_reference_semantics():
    rng = np.random.default_rng(5)
    depth = rng.uniform(0.2, 12.0, size=(2, 3, 4, 5)).astype(np.float32)
    got = np.asarray(two_hot_depth(jnp.asarray(depth), GRID))
    want = _torch_two_hot(depth, GRID)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # rows sum to <= 1 (overflow bin dropped)
    assert got.sum(axis=-3).max() <= 1.0 + 1e-5


def test_one_hot_depth_is_hard_and_correct_bin():
    depth = jnp.asarray([[[[1.6, 3.4]]]])  # centers at 1.5, 2.5, ...
    oh = one_hot_depth(depth, GRID)
    assert oh.shape == (1, 1, 8, 1, 2)
    assert int(jnp.argmax(oh[0, 0, :, 0, 0])) == 0  # 1.6 closest to 1.5
    assert int(jnp.argmax(oh[0, 0, :, 0, 1])) == 2  # 3.4 closest to 3.5
    np.testing.assert_allclose(np.asarray(oh.sum(axis=2)), 1.0)


def test_min_pool_depth_ignores_zeros():
    d = np.zeros((1, 4, 4), dtype=np.float32)
    d[0, 0, 0] = 5.0
    d[0, 1, 1] = 3.0
    out = np.asarray(min_pool_depth(jnp.asarray(d), 2))
    assert out[0, 0, 0] == 3.0
    assert out[0, 1, 1] == 1e5  # empty block


def test_depth_bins_one_hot_gt_quantization():
    # GT depth 1.2 -> (1.2 - (1-1))/1 = 1.2 -> bin index 1 -> one-hot slot 0
    d = np.full((1, 2, 2), 1.2, dtype=np.float32)
    oh = np.asarray(depth_bins_one_hot_gt(jnp.asarray(d), GRID, downsample=2))
    assert oh.shape == (1, 1, 1, 8)
    assert oh[0, 0, 0, 0] == 1.0 and oh.sum() == 1.0
    # depth 0 (missing) -> all zeros
    oh0 = np.asarray(depth_bins_one_hot_gt(jnp.zeros((1, 2, 2)), GRID, downsample=2))
    assert oh0.sum() == 0.0


def test_lss_lift_mass_conservation():
    """Sum of voxel features over valid points equals sum of depth*feat mass."""
    B, N = 1, 2
    lift = LSSLift(grid=GRID, input_size=(16, 16), downsample=4, out_channels=3,
                   ds_feat=(1, 1, 1))
    s2e, K, post_rot, post_tran, bda = _identity_metas(B, N)
    rng = np.random.default_rng(7)
    feat = jnp.asarray(rng.standard_normal((B, N, 4, 4, 3)).astype(np.float32))
    metric = jnp.asarray(rng.uniform(1.0, 8.0, size=(B, N, 4, 4)).astype(np.float32))
    depth = two_hot_depth(metric, GRID)
    vox = lift(feat, depth, jnp.asarray(s2e), jnp.asarray(K), jnp.asarray(post_rot),
               jnp.asarray(post_tran), jnp.asarray(bda))
    assert vox.shape == (B, 4, 8, 8, 3)
    fr = jnp.asarray(create_frustum(GRID, (16, 16), 4))
    coor = frustum_to_ego(fr, jnp.asarray(s2e), jnp.asarray(K), jnp.asarray(post_rot),
                          jnp.asarray(post_tran), jnp.asarray(bda))
    _, valid = voxel_ranks(coor, GRID)
    # expected mass: sum over valid points of depth_prob * feat
    mass = jnp.einsum("bndhw,bnhwc->c", depth * valid[:, :, :, :, :].astype(depth.dtype), feat)
    np.testing.assert_allclose(np.asarray(vox.sum(axis=(0, 1, 2, 3))),
                               np.asarray(mass), rtol=1e-3, atol=1e-3)


def test_lss_lift_ds_maxpool_shape():
    lift = LSSLift(grid=GRID, input_size=(16, 16), downsample=4, out_channels=3,
                   ds_feat=(2, 2, 2))
    B, N = 1, 1
    s2e, K, post_rot, post_tran, bda = _identity_metas(B, N)
    feat = jnp.ones((B, N, 4, 4, 3))
    depth = jnp.ones((B, N, 8, 4, 4)) / 8
    vox = lift(feat, depth, jnp.asarray(s2e), jnp.asarray(K), jnp.asarray(post_rot),
               jnp.asarray(post_tran), jnp.asarray(bda))
    assert vox.shape == (B, 2, 4, 4, 3)


def test_banded_two_hot_matches_full():
    """banded_two_hot_with_floor is an EXACT decomposition of the full
    softmax: in-band bins carry exp(gap)/Z, every out-of-band bin carries the
    clamped floor exp(-16)/Z — incl. depths below d0, beyond d1 (where the
    distribution degenerates toward uniform 1/(D+1)), and at band-clip
    edges."""
    from veon_tpu.lift.lss import banded_two_hot_with_floor

    grid = GridConfig(x=(-40, 40, 8.0), y=(-40, 40, 8.0), z=(-1, 3, 1.0),
                      depth=(1.0, 45.0, 0.5))
    D = grid.num_depth_bins
    rng = np.random.default_rng(11)
    depth = np.concatenate([
        rng.uniform(1.0, 44.0, size=(1, 1, 2, 13)),
        np.array([0.3, 1.0, 4.9, 44.9, 45.3, 60.0, 80.0, 2.501, 42.499,
                  47.0, 48.9, 49.25, 22.0]).reshape(1, 1, 1, 13),
    ], axis=2).astype(np.float32)
    w, bins, floor = banded_two_hot_with_floor(jnp.asarray(depth), grid, K=17)
    assert w.shape == depth.shape + (17,)
    dense = np.broadcast_to(np.asarray(floor)[..., None],
                            depth.shape + (D + 1,)).copy()
    np.put_along_axis(dense, np.asarray(bins), np.asarray(w), axis=-1)
    want = _torch_two_hot(depth, grid)  # (..., D, h, w) plane-major
    got = np.moveaxis(dense[..., :D], -1, -3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)
    # total probability (incl. the dropped overflow bin) is conserved
    np.testing.assert_allclose(dense.sum(-1), 1.0, rtol=1e-5)


def test_banded_lift_matches_full_lift():
    """lift_from_metric (banded + pixel-ray geometry + banded pallas pool)
    vs the reference-faithful full path (two_hot + frustum + scan pool)."""
    import dataclasses

    grid = GridConfig(x=(-40, 40, 8.0), y=(-40, 40, 8.0), z=(-1, 3, 1.0),
                      depth=(1.0, 45.0, 0.5))
    B, N = 1, 3
    lift = LSSLift(grid=grid, input_size=(16, 32), downsample=4,
                   out_channels=5, ds_feat=(1, 1, 1), impl="scan")
    s2e, K, post_rot, post_tran, bda = _identity_metas(B, N)
    rng = np.random.default_rng(13)
    # ringed cameras + mild aug so the geometry chain is non-trivial
    for n in range(N):
        th = 2 * np.pi * n / N
        c, s = np.cos(th), np.sin(th)
        s2e[:, n, :3, :3] = np.array(
            [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
        s2e[:, n, :3, :3] = np.array(
            [[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32) @ s2e[:, n, :3, :3]
        s2e[:, n, :3, 3] = (0.5 * c, 0.5 * s, 1.5)
    post_rot[:, :, :2, :2] *= 0.5
    post_tran[:, :, :2] = rng.normal(0, 1, size=(B, N, 2)).astype(np.float32)
    feat = jnp.asarray(rng.standard_normal((B, N, 4, 8, 5)).astype(np.float32))
    metric = jnp.asarray(rng.uniform(1.5, 50.0, size=(B, N, 4, 8)).astype(np.float32))
    args = (jnp.asarray(s2e), jnp.asarray(K), jnp.asarray(post_rot),
            jnp.asarray(post_tran), jnp.asarray(bda))
    want = lift(feat, two_hot_depth(metric, grid), *args)
    got = lift.lift_from_metric(feat, metric, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # without the far spray the >46m uniform ray mass is (documentedly) lost
    lift_ns = dataclasses.replace(lift, far_spray=False)
    got_ns = np.asarray(lift_ns.lift_from_metric(feat, metric, *args))
    assert np.abs(got_ns - np.asarray(want)).max() > 1e-3


def test_banded_lift_gradients_match_full():
    """d(out)/d(feat) through the banded custom VJP equals the full path's."""
    grid = GridConfig(x=(-40, 40, 8.0), y=(-40, 40, 8.0), z=(-1, 3, 1.0),
                      depth=(1.0, 45.0, 0.5))
    B, N = 1, 2
    lift = LSSLift(grid=grid, input_size=(16, 16), downsample=4,
                   out_channels=3, ds_feat=(1, 1, 1), impl="scan")
    s2e, K, post_rot, post_tran, bda = _identity_metas(B, N)
    rng = np.random.default_rng(17)
    feat = jnp.asarray(rng.standard_normal((B, N, 4, 4, 3)).astype(np.float32))
    # up to 55 m so some pixels exercise the spray pool's VJP too
    metric = jnp.asarray(rng.uniform(1.5, 55.0, size=(B, N, 4, 4)).astype(np.float32))
    args = (jnp.asarray(s2e), jnp.asarray(K), jnp.asarray(post_rot),
            jnp.asarray(post_tran), jnp.asarray(bda))

    def loss_full(f):
        return jnp.sum(lift(f, two_hot_depth(metric, grid), *args) ** 2)

    def loss_banded(f):
        return jnp.sum(lift.lift_from_metric(f, metric, *args) ** 2)

    g_full = jax.grad(loss_full)(feat)
    g_banded = jax.grad(loss_banded)(feat)
    np.testing.assert_allclose(np.asarray(g_banded), np.asarray(g_full),
                               rtol=1e-4, atol=1e-5)

    # d/d(metric depth) is APPROXIMATE (documented in
    # banded_two_hot_with_floor): the full path's straight-through clamp
    # feeds every out-of-band bin's +-gamma into Z while the banded
    # normalizer term is an analytic constant. Bound the deviation here.
    def loss_full_d(m):
        return jnp.sum(lift(feat, two_hot_depth(m, grid), *args) ** 2)

    def loss_banded_d(m):
        return jnp.sum(lift.lift_from_metric(feat, m, *args) ** 2)

    gd_full = np.asarray(jax.grad(loss_full_d)(metric))
    gd_banded = np.asarray(jax.grad(loss_banded_d)(metric))
    scale = np.abs(gd_full).max()
    assert scale > 0
    # measured: max deviation 3.6e-2 * max|grad| (out-of-range pixels whose
    # clamped bins keep the straight-through +-gamma in the full path),
    # mean 2e-3 * max|grad|. Dead in practice: full_forward stop_gradients
    # the depth tower (veon.py full_forward), so d/d(depth) never flows.
    np.testing.assert_allclose(gd_banded, gd_full, atol=5e-2 * scale,
                               err_msg="banded d/d(depth) drifted beyond the "
                               "documented bound")
    assert np.abs(gd_banded - gd_full).mean() < 5e-3 * scale


def test_presorted_lift_matches_full_and_grads():
    """lift_presorted (accelerate mode: host-precomputed sort, exact
    in-grid-count prefix) == the reference-faithful scan path, values and
    gradients, with NO cap parameter to get wrong."""
    grid = GridConfig(x=(-40, 40, 8.0), y=(-40, 40, 8.0), z=(-1, 3, 1.0),
                      depth=(1.0, 45.0, 0.5))
    B, N = 1, 3
    lift = LSSLift(grid=grid, input_size=(16, 32), downsample=4,
                   out_channels=5, ds_feat=(1, 1, 1), impl="scan")
    s2e, K, post_rot, post_tran, bda = _identity_metas(B, N)
    rng = np.random.default_rng(23)
    for n in range(N):
        th = 2 * np.pi * n / N
        c, s = np.cos(th), np.sin(th)
        s2e[:, n, :3, :3] = (np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
                             @ np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32))
        s2e[:, n, :3, 3] = (0.5 * c, 0.5 * s, 1.5)
    feat = jnp.asarray(rng.standard_normal((B, N, 4, 8, 5)).astype(np.float32))
    metric = jnp.asarray(rng.uniform(1.5, 55.0, size=(B, N, 4, 8)).astype(np.float32))
    args = (jnp.asarray(s2e), jnp.asarray(K), jnp.asarray(post_rot),
            jnp.asarray(post_tran), jnp.asarray(bda))
    pre = lift.precompute_sorted(*args)
    dist = two_hot_depth(metric, grid)

    want = lift(feat, dist, *args)
    got = lift.lift_presorted(feat, dist, pre)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)

    g_full = jax.grad(lambda f: jnp.sum(lift(f, dist, *args) ** 2))(feat)
    g_pre = jax.grad(lambda f: jnp.sum(lift.lift_presorted(f, dist, pre) ** 2))(feat)
    np.testing.assert_allclose(np.asarray(g_pre), np.asarray(g_full),
                               rtol=1e-4, atol=1e-6)


def test_absolute_depth_and_sid():
    from veon_tpu.lift.lss import absolute_depth_from_bins, sid_depth_values
    from veon_tpu.geometry.frustum import create_frustum

    bins = jnp.zeros((2, 10)).at[:, 3].set(0.6).at[:, 4].set(0.4)
    avg, hard = absolute_depth_from_bins(bins, GRID)
    # centers: k*1 + (1 - 0.5) = k + 0.5
    np.testing.assert_allclose(np.asarray(avg), 0.6 * 3.5 + 0.4 * 4.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hard), 3.5, rtol=1e-6)

    sid = sid_depth_values(GRID)
    assert sid.shape == (8,)
    np.testing.assert_allclose(sid[0], GRID.depth[0], rtol=1e-5)
    np.testing.assert_allclose(sid[-1], GRID.depth[1] - 1.0, rtol=1e-5)
    assert np.all(np.diff(sid) > 0) and np.diff(sid)[-1] > np.diff(sid)[0]
    fr = create_frustum(GRID, (16, 16), 4, sid=True)
    np.testing.assert_allclose(fr[:, 0, 0, 2], sid, rtol=1e-6)


def test_temporal_prev_frame_alignment_consistency():
    """Prev frames are lifted in their OWN ego frame (prepare_meta runs with
    num_frame=1 per forward_early call — `configs/veon/...py:65`,
    `san_in_veon_temporal.py:281-293`), and align_to_prev applies the whole
    ego-motion warp. With an ego translation of an exact voxel multiple, the
    align_corners grid_sample lands on voxel centers, so own-anchor lift +
    warp must equal lifting the same cameras directly in the current key
    frame. A frame-0 anchor (the pre-round-3 bug) double-counts the ego
    motion and fails this by a 2x shift."""
    import dataclasses

    from veon_tpu.configs import presets
    from veon_tpu.geometry.frustum import sensor2keyego_chain
    from veon_tpu.model.veon import VeonModel

    grid = GridConfig(x=(-8.0, 8.0, 0.8), y=(-8.0, 8.0, 0.8),
                      z=(-1.0, 3.0, 0.8), depth=(1.0, 9.0, 0.5))
    B, N, F = 1, 2, 2
    lift = LSSLift(grid=grid, input_size=(16, 16), downsample=4,
                   out_channels=3, ds_feat=(1, 1, 1), impl="scan")
    s2e1, K, post_rot, post_tran, bda = _identity_metas(B, N)
    # non-round intrinsics: the default fx=10/cx=8 rig puts frustum points
    # EXACTLY on voxel boundaries ((u-cx)/fx * d hits multiples of 0.8),
    # where the two paths' fp rounding legitimately bins differently
    K[..., 0, 0] = 9.7
    K[..., 1, 1] = 10.3
    K[..., 0, 2] = 7.93
    K[..., 1, 2] = 4.07
    # second camera yawed 0.5 rad so the two frustums cover different voxels.
    # NOT 90 degrees: an axis-aligned yaw maps depth planes straight onto x,
    # and planes at d=4.0/8.0 land EXACTLY on voxel boundaries, where the
    # two paths' fp rounding legitimately bins differently.
    th = 0.5
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    s2e1[:, 1, :3, :3] = R
    s2e = np.tile(s2e1[:, None], (1, F, 1, 1, 1))  # (B, F, N, 4, 4)
    tx = 2 * 0.8  # ego moved exactly 2 voxels in x between frames
    e2g = np.tile(np.eye(4, dtype=np.float32), (B, F, N, 1, 1))
    e2g[:, 1, :, 0, 3] = -tx  # prev frame sat 2 voxels behind in global x

    rng = np.random.default_rng(5)
    feat = jnp.asarray(rng.standard_normal((B, N, 4, 4, 3)).astype(np.float32))
    metric = jnp.asarray(rng.uniform(1.2, 8.5, size=(B, N, 4, 4)).astype(np.float32))
    dw = two_hot_depth(metric, grid)

    def lift_with(s2k_f):
        return lift(feat, dw, s2k_f, jnp.asarray(K), jnp.asarray(post_rot),
                    jnp.asarray(post_tran), jnp.asarray(bda))

    s2e_flat = jnp.asarray(s2e.reshape(B, F * N, 4, 4))
    e2g_flat = jnp.asarray(e2g.reshape(B, F * N, 4, 4))
    s2k_own = sensor2keyego_chain(s2e_flat, e2g_flat, F, N)  # per-frame anchor
    s2k_key = sensor2keyego_chain(s2e_flat, e2g_flat, F, N,
                                  per_frame_anchor=False)  # frame-0 anchor

    vox_own = lift_with(s2k_own[:, 1])   # prev frame, own ego coords
    vox_direct = lift_with(s2k_key[:, 1])  # prev frame, current key coords

    cfg = presets.veon_tiny_test()
    cfg = dataclasses.replace(cfg, grid=grid, lss_feat_ds=(1, 1, 1))
    model = VeonModel(cfg=cfg)
    l2g = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    prev_l2g = l2g.at[:, 0, 3].add(-tx)
    aligned = model.apply({}, vox_own, l2g, prev_l2g,
                          method=VeonModel.align_to_prev)

    a = np.asarray(aligned)
    b = np.asarray(vox_direct)
    # exclude a 3-voxel x-border (content shifts in/out of the two grids'
    # coverage there) and 1 elsewhere for edge-of-grid binning
    inner = (slice(None), slice(1, -1), slice(1, -1), slice(3, -3))
    assert np.abs(b[inner]).max() > 0  # the comparison region is not empty
    np.testing.assert_allclose(a[inner], b[inner], rtol=1e-4, atol=1e-5)
