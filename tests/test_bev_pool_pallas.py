"""Pallas bev_pool kernel: parity vs the XLA reference + custom-VJP checks
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from veon_tpu.ops.bev_pool import bev_pool, bev_pool_pallas, count_valid_ranks


def _case(B, N, D, h, w, C, grid_size, seed=0, valid_frac=0.5):
    rng = np.random.default_rng(seed)
    nx, ny, nz = grid_size
    V = B * nx * ny * nz
    depth = rng.random((B, N, D, h, w)).astype(np.float32)
    feat = rng.standard_normal((B, N, h, w, C)).astype(np.float32)
    ranks = rng.integers(0, V, size=(B, N, D, h, w)).astype(np.int32)
    ranks[rng.random(ranks.shape) > valid_frac] = V
    return jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(ranks)


def test_pallas_matches_reference_small():
    grid_size = (10, 10, 2)  # V=200, far below one block
    depth, feat, ranks = _case(1, 2, 4, 3, 5, 8, grid_size)
    want = bev_pool(depth, feat, ranks, grid_size)
    got = bev_pool_pallas(depth, feat, ranks, grid_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_matches_reference_multiblock_nonaligned():
    # V = 2*5*7*31 = 2170 cells -> 3 blocks, not a multiple of 1024
    grid_size = (31, 7, 5)
    depth, feat, ranks = _case(2, 3, 6, 4, 9, 16, grid_size, seed=1)
    want = bev_pool(depth, feat, ranks, grid_size)
    got = bev_pool_pallas(depth, feat, ranks, grid_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_pallas_vjp_matches_reference_vjp():
    grid_size = (9, 8, 3)
    depth, feat, ranks = _case(1, 2, 5, 3, 4, 8, grid_size, seed=2)
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 3, 8, 9, 8)).astype(np.float32)
    )

    def f_ref(d, ft):
        return jnp.sum(bev_pool(d, ft, ranks, grid_size) * cot)

    def f_pal(d, ft):
        return jnp.sum(bev_pool_pallas(d, ft, ranks, grid_size) * cot)

    gd_r, gf_r = jax.grad(f_ref, argnums=(0, 1))(depth, feat)
    gd_p, gf_p = jax.grad(f_pal, argnums=(0, 1))(depth, feat)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r), rtol=1e-4, atol=1e-5)


def test_pallas_golden_semantics():
    """The 8-point golden case expressed through the production interface."""
    # one pixel grid 2x2, D=2, feed known weights; all points to cell 0 or 1
    depth = jnp.asarray([[[[[0.3, 0.4]], [[0.2, 0.1]]]]]).reshape(1, 1, 2, 1, 2)
    feat = jnp.ones((1, 1, 1, 2, 2))
    ranks = jnp.asarray([0, 1, 0, 1]).reshape(1, 1, 2, 1, 2)
    out = bev_pool_pallas(depth, feat, ranks, (1, 2, 1))
    # cell0 = 0.3 (pix0,d0) + 0.2 (pix0,d1)? layout: ranks[...,d,h,w]
    want = bev_pool(depth, feat, ranks, (1, 2, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


def test_valid_cap_drop_is_detectable_by_guard():
    """The round-1 hazard, pinned: when count_valid_ranks exceeds cap*P, the
    capped path silently drops tail mass — the guard is how callers must
    detect it, and raising the cap (or using the uncapped presorted/banded
    paths) restores exactness."""
    grid_size = (10, 10, 2)
    depth, feat, ranks = _case(1, 2, 8, 6, 8, 8, grid_size, seed=7,
                               valid_frac=0.8)  # valid fraction ~0.8
    P = ranks.size
    num_cells = 1 * 10 * 10 * 2
    n_valid = int(count_valid_ranks(ranks, num_cells))
    assert n_valid / P > 0.5  # the scenario: real fraction above the cap
    want = bev_pool(depth, feat, ranks, grid_size)

    lossy = bev_pool_pallas(depth, feat, ranks, grid_size, 0.5)
    # guard fires exactly when the result is lossy
    assert n_valid > 0.5 * P
    assert np.abs(np.asarray(lossy) - np.asarray(want)).max() > 1e-3

    exact = bev_pool_pallas(depth, feat, ranks, grid_size, 1.0)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_presorted_production_geometry_exact():
    """lift_presorted at the PRODUCTION frustum geometry (512x1408/16,
    200x200x16 grid, 88 bins -> 1.49M points) matches the XLA scatter pool
    bit-for-bit in mass accounting; the sorted prefix equals the exact
    in-grid count rounded up to the DMA chunk (nothing can be dropped).
    C is kept small so the CPU reference stays tractable."""
    from veon_tpu.configs.base import GridConfig
    from veon_tpu.lift.lss import LSSLift, two_hot_depth

    grid = GridConfig()  # production: 200x200x16 @ 0.4m, 88 bins
    B, N, C = 1, 6, 2
    lift = LSSLift(grid=grid, input_size=(512, 1408), downsample=16,
                   out_channels=C, ds_feat=(2, 2, 2))
    rng = np.random.default_rng(11)
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(N):
        th = 2 * np.pi * n / N
        c, s = np.cos(th), np.sin(th)
        s2e[:, n, :3, :3] = (
            np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            @ np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32))
        s2e[:, n, :3, 3] = (0.5 * c, 0.5 * s, 1.5)
    K = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    K[:, :, 0, 0] = K[:, :, 1, 1] = 560.0
    K[:, :, 0, 2], K[:, :, 1, 2] = 704.0, 256.0
    post_rot = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    post_tran = np.zeros((B, N, 3), np.float32)
    bda = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    args = tuple(map(jnp.asarray, (s2e, K, post_rot, post_tran, bda)))

    pre = lift.precompute_sorted(*args, fuse_ds_pool=False)
    from veon_tpu.ops.bev_pool import BEV_POOL_CHUNK

    num_cells = B * 200 * 200 * 16
    n_valid = int(count_valid_ranks(pre["ranks"], num_cells))
    p_cap = pre["order"].shape[0]
    assert p_cap == min(-(-n_valid // BEV_POOL_CHUNK) * BEV_POOL_CHUNK,
                        pre["ranks"].size)
    # every in-grid rank is inside the prefix (lossless by construction)
    assert int(jnp.sum(pre["rk_sorted"] < num_cells)) == n_valid

    hf, wf = 512 // 16, 1408 // 16
    feat = jnp.asarray(rng.standard_normal((B, N, hf, wf, C)).astype(np.float32))
    metric = jnp.asarray(rng.uniform(1.5, 60.0, size=(B, N, hf, wf)).astype(np.float32))
    dist = two_hot_depth(metric, grid)
    got = lift.lift_presorted(feat, dist, pre)
    want = lift._ds_pool(bev_pool(dist, feat, pre["ranks"], grid.size))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # fused-pool layout (default precompute): the kernel max-pools its
    # accumulator in VMEM and writes only the pooled grid — must match
    # the unfused lift + XLA max-pool at the same production geometry
    pre_fused = lift.precompute_sorted(*args)
    assert "rk_pooled" in pre_fused and "rk_sorted" not in pre_fused
    got_fused = lift.lift_presorted(feat, dist, pre_fused)
    assert got_fused.shape == want.shape
    np.testing.assert_allclose(np.asarray(got_fused), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def _tiny_rig(B=1, N=3, seed=5):
    rng = np.random.default_rng(seed)
    s2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(N):
        th = 2 * np.pi * n / N
        c, s = np.cos(th), np.sin(th)
        s2e[:, n, :3, :3] = (
            np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            @ np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32))
        s2e[:, n, :3, 3] = (0.3 * c, 0.3 * s, 1.0)
    K = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    K[:, :, 0, 0] = K[:, :, 1, 1] = 40.0
    K[:, :, 0, 2], K[:, :, 1, 2] = 32.0, 16.0
    post_rot = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    post_tran = np.zeros((B, N, 3), np.float32)
    bda = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    return tuple(map(jnp.asarray, (s2e, K, post_rot, post_tran, bda)))


def test_pooled_rank_remap_roundtrip():
    """Coarse-major remap: every in-grid rank maps to coarse*R + offset with
    the right coarse cell; overflow ranks are preserved."""
    from veon_tpu.ops.bev_pool import pooled_rank_remap

    nx, ny, nz, B = 6, 4, 4, 2
    ds = (2, 2, 2)
    num_cells = B * nx * ny * nz
    r = jnp.arange(num_cells + 1)  # includes the overflow sentinel
    rp = np.asarray(pooled_rank_remap(r, (nx, ny, nz), ds, num_cells))
    assert rp[-1] == num_cells  # overflow preserved
    # invertibility: the remap is a bijection on [0, num_cells)
    assert sorted(rp[:-1].tolist()) == list(range(num_cells))
    # group consistency: fine cells of one [2,2,2] block share a coarse id
    fine = [((0 * nz + z) * ny + yy) * nx + xx
            for z in (0, 1) for yy in (2, 3) for xx in (2, 3)]
    coarse_ids = {int(rp[f]) // 8 for f in fine}
    assert len(coarse_ids) == 1
    offsets = sorted(int(rp[f]) % 8 for f in fine)
    assert offsets == list(range(8))


def test_presorted_pooled_fused_gradients_match_unfused(monkeypatch):
    """d/d(depth), d/d(feat) through the fused-pool presorted lift ==
    gradients through the unfused lift + _ds_pool composite (the custom VJP
    routes the cotangent through jnp.max exactly like _ds_pool does)."""
    from veon_tpu.configs.base import GridConfig
    from veon_tpu.lift.lss import LSSLift, two_hot_depth

    grid = GridConfig(x=(-8.0, 8.0, 1.0), y=(-8.0, 8.0, 1.0),
                      z=(-1.0, 3.0, 1.0), depth=(1.0, 9.0, 0.5))
    B, N, C = 1, 3, 8
    lift = LSSLift(grid=grid, input_size=(32, 64), downsample=8,
                   out_channels=C, ds_feat=(2, 2, 2))
    args = _tiny_rig(B, N)
    pre_u = lift.precompute_sorted(*args, fuse_ds_pool=False)
    pre_f = lift.precompute_sorted(*args, fuse_ds_pool=True)
    rng = np.random.default_rng(9)
    hf, wf = 32 // 8, 64 // 8
    feat = jnp.asarray(rng.standard_normal((B, N, hf, wf, C)).astype(np.float32))
    metric = jnp.asarray(rng.uniform(1.2, 8.5, size=(B, N, hf, wf)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal(
        (B, grid.size[2] // 2, grid.size[1] // 2, grid.size[0] // 2, C)
    ).astype(np.float32))

    def loss(pre, m, f):
        return jnp.sum(lift.lift_presorted(f, two_hot_depth(m, grid), pre) * cot)

    out_u = loss(pre_u, metric, feat)
    out_f = loss(pre_f, metric, feat)
    np.testing.assert_allclose(float(out_f), float(out_u), rtol=1e-5)
    gm_u, gf_u = jax.grad(lambda m, f: loss(pre_u, m, f), (0, 1))(metric, feat)
    gm_f, gf_f = jax.grad(lambda m, f: loss(pre_f, m, f), (0, 1))(metric, feat)
    np.testing.assert_allclose(np.asarray(gm_f), np.asarray(gm_u),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_u),
                               rtol=1e-4, atol=1e-6)
