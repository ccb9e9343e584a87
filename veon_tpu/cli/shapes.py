"""Synthetic, geometrically sane example batches for smoke tests / entry.

The camera rig mimics nuScenes: N cameras ringed around the ego, optical
axes horizontal (camera +z forward, +x right, +y down; ego +x forward,
+y left, +z up), so a healthy fraction of the occupancy grid's voxel
centers project inside at least one image. This matters: the 2D->3D
distillation loss (`occ3d_nuscenes.py:356-523` semantics) is only
exercised when voxels actually land in-frustum — an inconsistent rig
silently zeroes `loss_featalign_*` and the dryrun proves nothing.
"""

from __future__ import annotations

import numpy as np

from ..configs.base import VeonConfig

# cam->ego axis permutation for a camera whose optical axis points along
# ego +x: columns are the camera's (right, down, forward) axes in ego coords.
_CAM_TO_EGO_BASE = np.array(
    [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], dtype=np.float32
)


def camera_ring(N: int, radius: float = 0.5, height: float = 1.5) -> np.ndarray:
    """(N, 4, 4) cam->ego SE(3): camera i yawed 2*pi*i/N around ego z,
    displaced `radius` meters along its viewing direction at `height` m."""
    out = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    for i in range(N):
        th = 2.0 * np.pi * i / N
        c, s = np.cos(th), np.sin(th)
        rz = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)
        out[i, :3, :3] = rz @ _CAM_TO_EGO_BASE
        out[i, :3, 3] = (radius * c, radius * s, height)
    return out


def example_batch(cfg: VeonConfig, B: int = 1):
    import jax.numpy as jnp

    F, N = cfg.num_temporal, cfg.data.num_cams
    H, W = cfg.data.input_size
    rng = np.random.default_rng(0)

    def eye(n, *lead):
        return np.tile(np.eye(n, dtype=np.float32), lead + (1, 1))

    ring = camera_ring(N)  # (N, 4, 4)
    s2e = np.broadcast_to(ring, (B, F, N, 4, 4)).copy()
    # ego motion: frame f (older) sat 0.8*f meters behind the key frame in
    # global coords — exercises sensor2keyego_chain and align_to_prev.
    e2g = eye(4, B, F, N)
    for f in range(1, F):
        e2g[:, f, :, 0, 3] = -0.8 * f
    prev_e2g = eye(4, B, max(F - 1, 1))
    for f in range(1, F):
        prev_e2g[:, f - 1, 0, 3] = -0.8 * f
    # nuScenes-faithful intrinsics at input scale: fx ~1266 at 1600 px wide
    # -> x(1408/1600) = 0.79*W; the reference test-time aug (resize 0.88 +
    # bottom-biased crop, bevdet data_config crop_h with (0.0, 0.0) offsets)
    # lands the principal point ~0.34*H from the top (sky mostly cropped).
    # This sets the frustum's in-grid fraction (~0.58) and therefore the
    # lift's true workload — a wider synthetic FOV would distort benchmarks.
    K = eye(3, B, F, N)
    K[..., 0, 0] = K[..., 1, 1] = 0.79 * W
    K[..., 0, 2] = W / 2.0
    K[..., 1, 2] = 0.34 * H
    metas = {
        "sensor2egos": jnp.asarray(s2e),
        "ego2globals": jnp.asarray(e2g),
        "intrins": jnp.asarray(K),
        "post_rots": jnp.asarray(eye(3, B, F, N)),
        "post_trans": jnp.zeros((B, F, N, 3)),
        "bda": jnp.asarray(eye(3, B)),
        "lidarego2global": jnp.asarray(eye(4, B)),
        "prev_lidarego2global": jnp.asarray(prev_e2g),
        "cam2camego": jnp.asarray(np.broadcast_to(ring, (B, N, 4, 4)).copy()),
        "camego2global": jnp.asarray(eye(4, B, N)),
    }
    imgs = jnp.asarray(rng.standard_normal((B, F, N, H, W, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(1.0, 44.0, size=(B, F, N, H // 2, W // 2)).astype(np.float32)
    )
    return imgs, depth, metas


def example_batch_full(cfg: VeonConfig, B: int = 1):
    """(imgs, depth_imgs, metas) for the full pipeline incl. the depth tower.
    depth_imgs carry the DA-V2 lower-bound multiple-of-14 resolution for the
    dav2 branch; midasNormalize does no resize (loading.py:1037-1045), so
    the zoe branch keeps cfg.data.depth_input_size (same as the dataset,
    data/nuscenes.py:142-143)."""
    import jax.numpy as jnp

    from ..data.transforms import dav2_size

    imgs, _depth, metas = example_batch(cfg, B)
    F, N = cfg.num_temporal, cfg.data.num_cams
    if cfg.data.depth_norm_method == "depthanythingv2":
        dh, dw = dav2_size(*cfg.data.depth_input_size,
                           target=cfg.data.dav2_target)
    else:
        dh, dw = cfg.data.depth_input_size
    rng = np.random.default_rng(3)
    depth_imgs = jnp.asarray(
        rng.standard_normal((B, F, N, dh, dw, 3)).astype(np.float32)
    )
    return imgs, depth_imgs, metas
