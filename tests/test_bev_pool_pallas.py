"""Pallas bev_pool kernel: parity vs the XLA reference + custom-VJP checks
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from veon_tpu.ops.bev_pool import bev_pool, bev_pool_pallas


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
