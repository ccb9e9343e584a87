"""`F.grid_sample` equivalents as gather-based jnp ops (channel-last).

The reference uses grid_sample in three places (SURVEY.md hard-part 5):
  * temporal ego-alignment of occ features (`san_in_veon_temporal.py:358-364`,
    3D, bilinear, zeros padding, align_corners=True)
  * 3D deformable attention sampling (`align_net_occ3d.py:176-182`,
    3D, bilinear, border padding, align_corners=True)
  * 2D semseg sampling in the distillation loss (`occ3d_nuscenes.py:313`,
    2D, bilinear, zeros padding, align_corners=False)

Grid convention matches torch: last dim is (x, y[, z]) in [-1, 1] where x
indexes the innermost spatial axis (W) and z the outermost (D).
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def _gather_corner_2d(x, iy, ix, H, W, padding_mode):
    """x: (N, H, W, C); iy/ix: (N, L) int32. Returns (N, L, C) with OOB -> 0."""
    if padding_mode == "border":
        iy_c = jnp.clip(iy, 0, H - 1)
        ix_c = jnp.clip(ix, 0, W - 1)
        flat = iy_c * W + ix_c
        vals = jnp.take_along_axis(
            x.reshape(x.shape[0], H * W, x.shape[-1]), flat[..., None], axis=1
        )
        return vals
    # zeros padding
    valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    iy_c = jnp.clip(iy, 0, H - 1)
    ix_c = jnp.clip(ix, 0, W - 1)
    flat = iy_c * W + ix_c
    vals = jnp.take_along_axis(
        x.reshape(x.shape[0], H * W, x.shape[-1]), flat[..., None], axis=1
    )
    return jnp.where(valid[..., None], vals, 0.0)


def grid_sample_2d(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear 2D grid sample.

    Args:
      x: (N, H, W, C) channel-last input.
      grid: (N, ..., 2) normalized (x, y) coords in [-1, 1].

    Returns:
      (N, ..., C) sampled values.
    """
    N, H, W, C = x.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(N, -1, 2)
    fx = _unnormalize(g[..., 0], W, align_corners)
    fy = _unnormalize(g[..., 1], H, align_corners)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    v00 = _gather_corner_2d(x, y0, x0, H, W, padding_mode)
    v01 = _gather_corner_2d(x, y0, x0 + 1, H, W, padding_mode)
    v10 = _gather_corner_2d(x, y0 + 1, x0, H, W, padding_mode)
    v11 = _gather_corner_2d(x, y0 + 1, x0 + 1, H, W, padding_mode)
    wx = wx[..., None]
    wy = wy[..., None]
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return out.reshape(out_shape)


def _gather_corner_3d(x, iz, iy, ix, D, H, W, padding_mode):
    """x: (N, D, H, W, C); iz/iy/ix: (N, L). Returns (N, L, C)."""
    if padding_mode == "border":
        iz_c = jnp.clip(iz, 0, D - 1)
        iy_c = jnp.clip(iy, 0, H - 1)
        ix_c = jnp.clip(ix, 0, W - 1)
        flat = (iz_c * H + iy_c) * W + ix_c
        return jnp.take_along_axis(
            x.reshape(x.shape[0], D * H * W, x.shape[-1]), flat[..., None], axis=1
        )
    valid = (iz >= 0) & (iz < D) & (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    iz_c = jnp.clip(iz, 0, D - 1)
    iy_c = jnp.clip(iy, 0, H - 1)
    ix_c = jnp.clip(ix, 0, W - 1)
    flat = (iz_c * H + iy_c) * W + ix_c
    vals = jnp.take_along_axis(
        x.reshape(x.shape[0], D * H * W, x.shape[-1]), flat[..., None], axis=1
    )
    return jnp.where(valid[..., None], vals, 0.0)


def grid_sample_3d(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Trilinear 3D grid sample.

    Args:
      x: (N, D, H, W, C) channel-last input.
      grid: (N, ..., 3) normalized (x, y, z) coords in [-1, 1]
        (x -> W, y -> H, z -> D, matching torch).

    Returns:
      (N, ..., C) sampled values.
    """
    N, D, H, W, C = x.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(N, -1, 3)
    fx = _unnormalize(g[..., 0], W, align_corners)
    fy = _unnormalize(g[..., 1], H, align_corners)
    fz = _unnormalize(g[..., 2], D, align_corners)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    wz = (fz - z0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)
    out = 0.0
    for dz, wz_ in ((0, 1 - wz), (1, wz)):
        for dy, wy_ in ((0, 1 - wy), (1, wy)):
            for dx, wx_ in ((0, 1 - wx), (1, wx)):
                v = _gather_corner_3d(x, z0 + dz, y0 + dy, x0 + dx, D, H, W, padding_mode)
                out = out + v * wz_ * wy_ * wx_
    return out.reshape(out_shape)
