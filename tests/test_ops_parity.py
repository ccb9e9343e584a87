"""Parity tests of resize / grid_sample / pooling ops against torch (CPU).

The reference's numerics flow through torch F.interpolate / F.grid_sample /
adaptive pools in accuracy-sensitive places; these tests pin our jnp ops to
torch semantics exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from veon_tpu.ops.resize import (  # noqa: E402
    adaptive_max_pool2d,
    resize_bicubic,
    resize_bilinear,
    resize_nearest,
    resize_trilinear,
)
from veon_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d  # noqa: E402


RNG = np.random.default_rng(42)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("size", [(7, 9), (16, 44), (3, 5)])
def test_resize_bilinear_matches_torch(align_corners, size):
    x = _rand(2, 5, 11, 3)
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="bilinear",
        align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("size", [(10, 6), (3, 17)])
def test_resize_bicubic_matches_torch(align_corners, size):
    x = _rand(1, 6, 8, 2)
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="bicubic",
        align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_bicubic(jnp.asarray(x), size, align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_nearest_matches_torch():
    x = _rand(2, 5, 9, 4)
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(11, 4), mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_nearest(jnp.asarray(x), (11, 4)))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_trilinear_matches_torch(align_corners):
    x = _rand(1, 4, 5, 6, 3)
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3), size=(8, 10, 12),
        mode="trilinear", align_corners=align_corners,
    ).permute(0, 2, 3, 4, 1).numpy()
    got = np.asarray(resize_trilinear(jnp.asarray(x), (8, 10, 12), align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("size", [(4, 4), (3, 7), (5, 11)])
def test_adaptive_max_pool2d_matches_torch(size):
    x = _rand(2, 9, 13, 3)
    want = F.adaptive_max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), output_size=size
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(adaptive_max_pool2d(jnp.asarray(x), size))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(align_corners, padding_mode):
    x = _rand(2, 6, 7, 3)
    grid = (RNG.uniform(-1.3, 1.3, size=(2, 4, 5, 2))).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding_mode, align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        grid_sample_2d(jnp.asarray(x), jnp.asarray(grid), align_corners, padding_mode)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_3d_matches_torch(align_corners, padding_mode):
    x = _rand(2, 4, 5, 6, 3)
    grid = (RNG.uniform(-1.3, 1.3, size=(2, 3, 4, 2, 3))).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding_mode, align_corners=align_corners,
    ).permute(0, 2, 3, 4, 1).numpy()
    got = np.asarray(
        grid_sample_3d(jnp.asarray(x), jnp.asarray(grid), align_corners, padding_mode)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ln_dense_pallas_matches_xla_pair():
    """Fused LN->Dense kernel == the unfused LayerNorm+matmul pair it
    replaces (fp32 LN internals, fp32-accumulated matmul), bf16 and f32,
    including non-tile-multiple M."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from veon_tpu.ops.fused_ln import ln_dense_pallas, ln_dense_xla

    rng = np.random.default_rng(0)
    for dt, M, C, N, rtol in ((jnp.float32, 700, 128, 256, 2e-6),
                              (jnp.bfloat16, 1500, 384, 1152, 2e-2)):
        x = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32)).astype(dt)
        s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
        b = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32) / np.sqrt(C)).astype(dt)
        wb = jnp.asarray(0.1 * rng.standard_normal(N).astype(np.float32))
        got = ln_dense_pallas(x, s, b, w, wb)
        want = jax.jit(ln_dense_xla)(x, s, b, w, wb)
        assert got.dtype == want.dtype == dt
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=rtol, atol=rtol)
