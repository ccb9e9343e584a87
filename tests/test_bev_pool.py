"""Golden tests for the voxel pooling op.

Ports the semantics of the reference's only kernel test,
`test_bev_pool_v2` (mmdet3d/ops/bev_pool_v2/bev_pool.py:145-176):
8-point hand-computed forward (loss == 4.4) and exact gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from veon_tpu.ops.bev_pool import bev_pool, bev_pool_points


def _golden_inputs():
    depth = jnp.asarray(
        [0.3, 0.4, 0.2, 0.1, 0.7, 0.6, 0.8, 0.9], dtype=jnp.float32
    )
    feat = jnp.ones((4, 2), dtype=jnp.float32)  # 4 pixels, C=2
    ranks_depth = jnp.asarray([0, 4, 1, 6], dtype=jnp.int32)
    ranks_feat = jnp.asarray([0, 0, 1, 2], dtype=jnp.int32)
    ranks_bev = jnp.asarray([0, 0, 1, 1], dtype=jnp.int32)
    return depth, feat, ranks_depth, ranks_feat, ranks_bev


def test_bev_pool_points_golden_forward():
    depth, feat, rd, rf, rb = _golden_inputs()
    out = bev_pool_points(depth, feat, rd, rf, rb, num_cells=8)
    loss = jnp.sum(out)
    np.testing.assert_allclose(float(loss), 4.4, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0]), [1.0, 1.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), [1.2, 1.2], rtol=1e-6)


def test_bev_pool_points_golden_backward():
    depth, feat, rd, rf, rb = _golden_inputs()

    def loss_fn(d, f):
        return jnp.sum(bev_pool_points(d, f, rd, rf, rb, num_cells=8))

    gd, gf = jax.grad(loss_fn, argnums=(0, 1))(depth, feat)
    np.testing.assert_allclose(
        np.asarray(gd), [2.0, 2.0, 0.0, 0.0, 2.0, 0.0, 2.0, 0.0], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gf),
        [[1.0, 1.0], [0.4, 0.4], [0.8, 0.8], [0.0, 0.0]],
        rtol=1e-6,
    )


def _numpy_oracle(depth, feat, ranks, grid_size):
    """Torch-free reference implementation of the production bev_pool."""
    B, N, D, h, w = depth.shape
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    out = np.zeros((B * nz * ny * nx, C), dtype=np.float64)
    d = np.asarray(depth, dtype=np.float64)
    f = np.asarray(feat, dtype=np.float64)
    r = np.asarray(ranks)
    for b in range(B):
        for n in range(N):
            for k in range(D):
                for i in range(h):
                    for j in range(w):
                        rank = r[b, n, k, i, j]
                        if rank < out.shape[0]:
                            out[rank] += d[b, n, k, i, j] * f[b, n, i, j]
    return out.reshape(B, nz, ny, nx, C)


def test_bev_pool_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    B, N, D, h, w, C = 2, 3, 5, 4, 6, 7
    grid_size = (5, 4, 3)
    num_cells = B * grid_size[0] * grid_size[1] * grid_size[2]
    depth = rng.standard_normal((B, N, D, h, w)).astype(np.float32)
    feat = rng.standard_normal((B, N, h, w, C)).astype(np.float32)
    # random ranks including overflow cells
    ranks = rng.integers(0, num_cells + 1, size=(B, N, D, h, w)).astype(np.int32)
    out = bev_pool(jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(ranks), grid_size)
    expected = _numpy_oracle(depth, feat, ranks, grid_size)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_bev_pool_gradients_match_oracle():
    rng = np.random.default_rng(1)
    B, N, D, h, w, C = 1, 2, 3, 2, 2, 4
    grid_size = (3, 3, 2)
    num_cells = B * 3 * 3 * 2
    depth = jnp.asarray(rng.standard_normal((B, N, D, h, w)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((B, N, h, w, C)).astype(np.float32))
    ranks = jnp.asarray(rng.integers(0, num_cells + 1, size=(B, N, D, h, w)).astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((B, 2, 3, 3, C)).astype(np.float32))

    def f(d, ft):
        return jnp.sum(bev_pool(d, ft, ranks, grid_size) * cot)

    gd, gf = jax.grad(f, argnums=(0, 1))(depth, feat)
    # finite differences on a few random coordinates
    eps = 1e-2
    for _ in range(5):
        idx = tuple(rng.integers(0, s) for s in depth.shape)
        d_plus = depth.at[idx].add(eps)
        d_minus = depth.at[idx].add(-eps)
        fd = (f(d_plus, feat) - f(d_minus, feat)) / (2 * eps)
        np.testing.assert_allclose(float(gd[idx]), float(fd), rtol=2e-2, atol=2e-3)
    for _ in range(5):
        idx = tuple(rng.integers(0, s) for s in feat.shape)
        f_plus = feat.at[idx].add(eps)
        f_minus = feat.at[idx].add(-eps)
        fd = (f(depth, f_plus) - f(depth, f_minus)) / (2 * eps)
        np.testing.assert_allclose(float(gf[idx]), float(fd), rtol=2e-2, atol=2e-3)
