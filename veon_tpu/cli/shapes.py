"""Synthetic, geometrically sane example batches for smoke tests / entry."""

from __future__ import annotations

import numpy as np

from ..configs.base import VeonConfig


def example_batch(cfg: VeonConfig, B: int = 1):
    import jax.numpy as jnp

    F, N = cfg.num_temporal, cfg.data.num_cams
    H, W = cfg.data.input_size
    rng = np.random.default_rng(0)

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
    K = eye(3, B, F, N)
    K[..., 0, 0] = K[..., 1, 1] = 0.6 * W
    K[..., 0, 2] = W / 2.0
    K[..., 1, 2] = H / 2.0
    metas = {
        "sensor2egos": jnp.asarray(s2e),
        "ego2globals": jnp.asarray(eye(4, B, F, N)),
        "intrins": jnp.asarray(K),
        "post_rots": jnp.asarray(eye(3, B, F, N)),
        "post_trans": jnp.zeros((B, F, N, 3)),
        "bda": jnp.asarray(eye(3, B)),
        "lidarego2global": jnp.asarray(eye(4, B)),
        "prev_lidarego2global": jnp.asarray(eye(4, B, max(F - 1, 1))),
        "cam2camego": jnp.asarray(eye(4, B, N)),
        "camego2global": jnp.asarray(eye(4, B, N)),
    }
    imgs = jnp.asarray(rng.standard_normal((B, F, N, H, W, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(1.0, 44.0, size=(B, F, N, H // 2, W // 2)).astype(np.float32)
    )
    return imgs, depth, metas


def example_batch_full(cfg: VeonConfig, B: int = 1):
    """(imgs, depth_imgs, metas) for the full pipeline incl. the depth tower.
    depth_imgs carry the DA-V2 lower-bound multiple-of-14 resolution."""
    import jax.numpy as jnp

    from ..data.transforms import dav2_size

    imgs, _depth, metas = example_batch(cfg, B)
    F, N = cfg.num_temporal, cfg.data.num_cams
    dh, dw = dav2_size(*cfg.data.depth_input_size, target=cfg.data.dav2_target)
    rng = np.random.default_rng(3)
    depth_imgs = jnp.asarray(
        rng.standard_normal((B, F, N, dh, dw, 3)).astype(np.float32)
    )
    return imgs, depth_imgs, metas
