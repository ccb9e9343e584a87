"""Image resize ops with exact PyTorch `F.interpolate` semantics.

The reference leans on torch bilinear/bicubic interpolation in many
numerically-sensitive places (pos-embed resize `attn_helper.py:330-364`,
CLIP-input downscale `san_in_veon_temporal.py:119-121`, fusion-layer
resizes, trilinear occ upsample). `jax.image.resize` uses a different
cubic kernel (a=-0.5 vs torch's -0.75) and different half-pixel handling,
so we build explicit separable interpolation weight matrices on host
(sizes are static at trace time) and apply them as matmuls — which is also
the MXU-friendly formulation on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix (torch semantics)."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = i * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (i + 0.5) * in_size / out_size - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    lo0 = np.clip(lo, 0, in_size - 1)
    lo1 = np.clip(lo + 1, 0, in_size - 1)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    w[np.arange(out_size), lo0] += 1.0 - frac
    w[np.arange(out_size), lo1] += frac
    return w.astype(np.float32)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (torch uses a=-0.75)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    out = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=None)
def _cubic_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bicubic interpolation matrix (torch semantics).

    Border handling matches torch: taps are clamped to the valid range
    (replicate padding of boundary pixels).
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = i * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (i + 0.5) * in_size / out_size - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for t in range(-1, 3):
        tap = np.clip(lo + t, 0, in_size - 1)
        w[np.arange(out_size), tap] += _cubic_kernel(frac - t)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """torch 'nearest' (legacy, floor of scaled index)."""
    i = np.arange(out_size, dtype=np.float64)
    src = np.floor(i * in_size / out_size).astype(np.int64)
    return np.clip(src, 0, in_size - 1)


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """x: (..., H, W, C); wh: (Ho, H); ww: (Wo, W)."""
    wh_j = jnp.asarray(wh, dtype=x.dtype)
    ww_j = jnp.asarray(ww, dtype=x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", wh_j, x)
    x = jnp.einsum("pw,...hwc->...hpc", ww_j, x)
    return x


def resize_bilinear(
    x: jnp.ndarray, out_size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize, channel-last: x (..., H, W, C) -> (..., Ho, Wo, C)."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_size
    if (H, W) == (Ho, Wo):
        return x
    return _apply_separable(x, _linear_weights(H, Ho, align_corners), _linear_weights(W, Wo, align_corners))


def resize_bicubic(
    x: jnp.ndarray, out_size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bicubic resize (torch a=-0.75), channel-last."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_size
    if (H, W) == (Ho, Wo):
        return x
    return _apply_separable(x, _cubic_weights(H, Ho, align_corners), _cubic_weights(W, Wo, align_corners))


@functools.lru_cache(maxsize=None)
def _cubic_weights_scaled(in_size: int, out_size: int, scale: float) -> np.ndarray:
    """Bicubic weights where the coordinate map uses an explicit scale factor
    (torch `interpolate(scale_factor=s, recompute_scale_factor=False)`:
    src = (dst + 0.5)/s - 0.5). Needed for DINOv2's pos-embed interpolation
    (`depth_anything/dinov2.py:181-213`, offset 0.1 workaround).
    """
    i = np.arange(out_size, dtype=np.float64)
    src = (i + 0.5) / scale - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for t in range(-1, 3):
        tap = np.clip(lo + t, 0, in_size - 1)
        w[np.arange(out_size), tap] += _cubic_kernel(frac - t)
    return w.astype(np.float32)


def resize_bicubic_scaled(
    x: jnp.ndarray, out_size: Tuple[int, int], scales: Tuple[float, float]
) -> jnp.ndarray:
    """Bicubic resize with explicit per-axis scale factors (channel-last)."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_size
    return _apply_separable(
        x, _cubic_weights_scaled(H, Ho, scales[0]), _cubic_weights_scaled(W, Wo, scales[1])
    )


def resize_nearest(x: jnp.ndarray, out_size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize (torch legacy 'nearest'), channel-last."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_size
    if (H, W) == (Ho, Wo):
        return x
    hi = jnp.asarray(_nearest_indices(H, Ho))
    wi = jnp.asarray(_nearest_indices(W, Wo))
    return x[..., hi, :, :][..., :, wi, :]


def resize_trilinear(
    x: jnp.ndarray, out_size: Tuple[int, int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Trilinear resize, channel-last: x (..., D, H, W, C) -> (..., Do, Ho, Wo, C).

    Used for the occ upsample to (16, 200, 200)
    (`san_in_veon_temporal.py:196-207`).
    """
    D, H, W = x.shape[-4], x.shape[-3], x.shape[-2]
    Do, Ho, Wo = out_size
    wd = jnp.asarray(_linear_weights(D, Do, align_corners), dtype=x.dtype)
    x = jnp.einsum("od,...dhwc->...ohwc", wd, x)
    return resize_bilinear(x, (Ho, Wo), align_corners)


def adaptive_max_pool2d(x: jnp.ndarray, out_size: Tuple[int, int]) -> jnp.ndarray:
    """torch adaptive_max_pool2d, channel-last (used by downsample2d "max",
    `attn_helper.py:317-327`).

    Regions: start = floor(i*H/Ho), end = ceil((i+1)*H/Ho). Implemented with
    a fixed max region extent + masking so shapes stay static.
    """
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_size
    if (H, W) == (Ho, Wo):
        return x

    def pool_axis(v, in_size, o_size, axis):
        starts = np.floor(np.arange(o_size) * in_size / o_size).astype(np.int64)
        ends = np.ceil((np.arange(o_size) + 1) * in_size / o_size).astype(np.int64)
        k = int((ends - starts).max())
        # gather indices (o_size, k), clamped; mask invalid taps with -inf
        idx = starts[:, None] + np.arange(k)[None, :]
        mask = idx < ends[:, None]
        idx = np.clip(idx, 0, in_size - 1)
        g = jnp.take(v, jnp.asarray(idx.reshape(-1)), axis=axis)
        new_shape = v.shape[:axis] + (o_size, k) + v.shape[axis + 1 :]
        g = g.reshape(new_shape)
        m = jnp.asarray(mask, dtype=bool)
        m = m.reshape((1,) * axis + (o_size, k) + (1,) * (v.ndim - 1 - axis))
        g = jnp.where(m, g, jnp.finfo(v.dtype).min)
        return jnp.max(g, axis=axis + 1)

    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = pool_axis(x, H, Ho, h_axis)
    x = pool_axis(x, W, Wo, w_axis)
    return x
