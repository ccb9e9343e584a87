"""Native C++ data plane: parity with the numpy reference path."""

import numpy as np
import pytest

from veon_tpu.configs.base import GridConfig
from veon_tpu.data import native
from veon_tpu.data.depth_gt import points_to_depth_map, project_points
from veon_tpu.geometry.frustum import voxel_ranks

import jax.numpy as jnp

GRID = GridConfig()


@pytest.mark.skipif(not native.available(), reason="no g++ / native lib")
def test_points_to_depth_native_matches_numpy():
    rng = np.random.default_rng(0)
    P, N, H, W = 5000, 3, 64, 176
    pts = rng.uniform(-50, 50, size=(P, 3)).astype(np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    for n in range(N):
        th = n * 2.0
        l2i[n, :3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
            np.float32) * 30.0
        l2i[n, 0, 3] = 80.0
        l2i[n, 1, 3] = 30.0
    post_rots = np.tile(np.eye(3, dtype=np.float32) * 0.5, (N, 1, 1))
    post_rots[:, 2, 2] = 1.0
    post_trans = rng.normal(0, 2, size=(N, 3)).astype(np.float32)
    post_trans[:, 2] = 0

    got = native.points_to_depth_native(pts, l2i, post_rots, post_trans,
                                        (H, W), (GRID.depth[0], GRID.depth[1]))
    assert got is not None
    for n in range(N):
        p = pts @ l2i[n, :3, :3].T + l2i[n, :3, 3]
        pim = np.concatenate([p[:, :2] / p[:, 2:3], p[:, 2:3]], 1)
        pim = pim @ post_rots[n].T + post_trans[n]
        want = points_to_depth_map(pim.astype(np.float32), H, W, GRID)
        np.testing.assert_allclose(got[n], want, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="no g++ / native lib")
def test_voxel_ranks_native_matches_jnp():
    rng = np.random.default_rng(1)
    coor = rng.uniform(-50, 50, size=(1, 2, 3, 4, 5, 3)).astype(np.float32)
    want, _ = voxel_ranks(jnp.asarray(coor), GRID)
    got = native.voxel_ranks_native(coor, GRID.lower_bound, GRID.interval, GRID.size)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want)[0] if False else np.asarray(want))


def test_native_jpeg_decode_matches_pil(tmp_path):
    """Native libjpeg decode is byte-identical to PIL (same library, same
    default IDCT); open_image_native returns a PIL-compatible image."""
    import io

    from PIL import Image

    from veon_tpu.data.native import decode_jpeg_native, open_image_native

    rng = np.random.default_rng(0)
    # smooth-ish content (random noise stresses the IDCT identically anyway)
    base = rng.integers(0, 255, size=(45, 67, 3), dtype=np.uint8)
    img = Image.fromarray(base)
    p = str(tmp_path / "cam.jpg")
    img.save(p, quality=90)

    with open(p, "rb") as f:
        data = f.read()
    got = decode_jpeg_native(data)
    if got is None:  # no libjpeg toolchain on this box: fallback contract
        assert open_image_native(p).size == (67, 45)
        return
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, want)

    via_open = np.asarray(open_image_native(p))
    np.testing.assert_array_equal(via_open, want)
