"""Camera frustum geometry and voxel rank computation (pure jnp, static shapes).

Re-designs the dynamic-shape pipeline of the reference
(`mmdet3d/models/necks/view_transformer_raw.py:91-302`: boolean filter +
argsort + variable-length CSR intervals) as a fixed-size computation:
every one of the B*N*D*h*w frustum points gets a voxel rank, with
out-of-range points mapped to a dummy overflow cell. This keeps all shapes
static so the whole lift compiles once under jit and the pooling becomes a
masked scatter-add / segment-sum (see veon_tpu.ops.bev_pool).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import GridConfig


def create_frustum(
    grid: GridConfig, input_size: Tuple[int, int], downsample: int,
    sid: bool = False,
) -> np.ndarray:
    """Frustum template in augmented-image pixel space.

    Matches `view_transformer_raw.py:91-119`: returns a (D, Hf, Wf, 3)
    array of (x_pix, y_pix, depth_m) per frustum point, where x spans
    [0, W_in-1] over Wf samples and depth spans the bin lower edges
    `arange(d0, d1, dd)` — or the Spacing-Increasing Discretization
    planes when sid=True (:107-112).
    Computed on host once (numpy) — it is a compile-time constant.
    """
    h_in, w_in = input_size
    hf, wf = h_in // downsample, w_in // downsample
    d = np.arange(grid.depth[0], grid.depth[1], grid.depth[2], dtype=np.float32)
    D = d.shape[0]
    if sid:
        from ..lift.lss import sid_depth_values

        d = sid_depth_values(grid)
    xs = np.linspace(0, w_in - 1, wf, dtype=np.float32)
    ys = np.linspace(0, h_in - 1, hf, dtype=np.float32)
    frustum = np.empty((D, hf, wf, 3), dtype=np.float32)
    frustum[..., 0] = xs[None, None, :]
    frustum[..., 1] = ys[None, :, None]
    frustum[..., 2] = d[:, None, None]
    return frustum


def frustum_to_ego(
    frustum: jnp.ndarray,
    sensor2ego: jnp.ndarray,
    cam2img: jnp.ndarray,
    post_rot: jnp.ndarray,
    post_tran: jnp.ndarray,
    bda: jnp.ndarray,
) -> jnp.ndarray:
    """Transform frustum points to (key-)ego coordinates.

    Semantics of `view_transformer_raw.py:121-158` (get_lidar_coor):
      1. undo image augmentation: p' = post_rot^-1 (p - post_tran)
      2. unproject: (u*d, v*d, d) then x_cam = K^-1 @ that
      3. cam->ego: R_s2e @ x_cam + t_s2e
      4. BEV-aug: bda @ x

    Args:
      frustum:   (D, Hf, Wf, 3) template (pixel x, pixel y, metric depth).
      sensor2ego: (B, N, 4, 4) camera->ego SE(3).
      cam2img:   (B, N, 3, 3) intrinsics.
      post_rot:  (B, N, 3, 3) image-aug homography rotation part.
      post_tran: (B, N, 3) image-aug translation.
      bda:       (B, 3, 3) BEV data augmentation matrix.

    Returns:
      (B, N, D, Hf, Wf, 3) ego-frame xyz.
    """
    # geometry must be fp32-exact on TPU (voxel binning is sensitive to
    # matmul precision) — force HIGHEST on these tiny 3x3 contractions.
    hi = jax.lax.Precision.HIGHEST
    B, N = sensor2ego.shape[:2]
    pts = frustum[None, None] - post_tran[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rot)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts, precision=hi)
    # (u, v, d) -> (u*d, v*d, d)
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)
    combine = jnp.einsum(
        "bnij,bnjk->bnik", sensor2ego[:, :, :3, :3], jnp.linalg.inv(cam2img), precision=hi
    )
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts, precision=hi)
    pts = pts + sensor2ego[:, :, None, None, None, :3, 3]
    pts = jnp.einsum("bij,bndhwj->bndhwi", bda, pts, precision=hi)
    return pts


def pixel_ray_geometry(
    input_size: Tuple[int, int],
    downsample: int,
    sensor2ego: jnp.ndarray,
    cam2img: jnp.ndarray,
    post_rot: jnp.ndarray,
    post_tran: jnp.ndarray,
    bda: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel ray decomposition: ego xyz of a frustum point at metric
    depth d is `d * dirs[..., u, v, :] + origin[..., None, None, :]`.

    Exploits that `get_lidar_coor` (`view_transformer_raw.py:121-158`) is
    affine in depth once the aug homography's third row/col are identity
    (they are: `img_transform` embeds a 2D homography, loading.py:1149-1156):
      undo-aug maps (u, v) -> (a, b) independent of d, unprojection gives
      d*(a, b, 1), and cam->ego / BDA are affine. Computing (dirs, origin)
      once per pixel instead of the full (D, Hf, Wf) frustum cuts the
      geometry work D-fold — the enabler for the banded two-hot lift.

    Returns:
      dirs: (B, N, Hf, Wf, 3); origin: (B, N, 3).
    """
    hi = jax.lax.Precision.HIGHEST
    h_in, w_in = input_size
    hf, wf = h_in // downsample, w_in // downsample
    xs = np.linspace(0, w_in - 1, wf, dtype=np.float32)
    ys = np.linspace(0, h_in - 1, hf, dtype=np.float32)
    uv = np.empty((hf, wf, 2), np.float32)
    uv[..., 0] = xs[None, :]
    uv[..., 1] = ys[:, None]
    uv = jnp.asarray(uv)
    p2 = uv[None, None] - post_tran[:, :, None, None, :2]
    inv2 = jnp.linalg.inv(post_rot[:, :, :2, :2])
    ab = jnp.einsum("bnij,bnhwj->bnhwi", inv2, p2, precision=hi)
    vec = jnp.concatenate([ab, jnp.ones_like(ab[..., :1])], axis=-1)
    combine = jnp.einsum(
        "bij,bnjk,bnkl->bnil", bda, sensor2ego[:, :, :3, :3],
        jnp.linalg.inv(cam2img), precision=hi,
    )
    dirs = jnp.einsum("bnij,bnhwj->bnhwi", combine, vec, precision=hi)
    origin = jnp.einsum(
        "bij,bnj->bni", bda, sensor2ego[:, :, :3, 3], precision=hi
    )
    return dirs, origin


def voxel_ranks(
    coor_ego: jnp.ndarray, grid: GridConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map ego-frame frustum points to flat voxel ranks with validity mask.

    Static-shape replacement for `voxel_pooling_prepare_v2`
    (`view_transformer_raw.py:244-302`): instead of filtering + sorting,
    every point gets `rank = ((b*nz + z)*ny + y)*nx + x`; out-of-grid points
    get rank == B*nz*ny*nx (a dummy overflow cell dropped by the pooling op).

    Args:
      coor_ego: (B, N, D, Hf, Wf, 3) ego xyz.
      grid: grid config.

    Returns:
      ranks: (B, N, D, Hf, Wf) int32 flat voxel index (overflow = num_voxels).
      valid: same-shape bool mask.
    """
    nx, ny, nz = grid.size
    lb = jnp.asarray(grid.lower_bound, dtype=coor_ego.dtype)
    iv = jnp.asarray(grid.interval, dtype=coor_ego.dtype)
    # match torch `.long()` truncation-toward-zero on the scaled coordinate
    scaled = (coor_ego - lb) / iv
    vox = scaled.astype(jnp.int32)
    # truncation toward zero maps (-1, 0) to 0; exclude by checking scaled >= 0
    valid = (
        (scaled[..., 0] >= 0)
        & (vox[..., 0] < nx)
        & (scaled[..., 1] >= 0)
        & (vox[..., 1] < ny)
        & (scaled[..., 2] >= 0)
        & (vox[..., 2] < nz)
    )
    B = coor_ego.shape[0]
    batch_idx = jnp.arange(B, dtype=jnp.int32).reshape(B, 1, 1, 1, 1)
    rank = ((batch_idx * nz + vox[..., 2]) * ny + vox[..., 1]) * nx + vox[..., 0]
    num_voxels = B * nz * ny * nx
    rank = jnp.where(valid, rank, num_voxels)
    return rank, valid


def se3_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of rigid SE(3) matrices (..., 4, 4):
    inv([R t; 0 1]) = [R^T -R^T t; 0 1].

    Exact (no LU solve) and — critically on TPU — avoids a generic
    `jnp.linalg.inv`/matmul chain whose DEFAULT precision is bf16:
    nuScenes ego2global translations are O(1000 m), where bf16's 8-bit
    mantissa costs ~2 m, silently corrupting voxel binning. All geometry
    composition here runs fp32 with Precision.HIGHEST.
    """
    hi = jax.lax.Precision.HIGHEST
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", rt, t, precision=hi)
    out = jnp.zeros_like(m)
    out = out.at[..., :3, :3].set(rt)
    out = out.at[..., :3, 3].set(new_t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def compose_se3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a @ b for (..., 4, 4) with fp32 HIGHEST precision (TPU defaults @ to
    bf16, which is catastrophic for global-frame translations)."""
    return jnp.einsum("...ij,...jk->...ik", a, b,
                      precision=jax.lax.Precision.HIGHEST)


def sensor2keyego_chain(
    sensor2egos: jnp.ndarray, ego2globals: jnp.ndarray, num_frames: int,
    num_cams: int, per_frame_anchor: bool = True,
) -> jnp.ndarray:
    """Compose per-frame sensor->keyego transforms.

    Semantics of `align_net_occ3d.py:328-352` (prepare_meta): the key frame's
    first camera's ego2global anchors the key ego frame;
    sensor2keyego = keyego2global^-1 @ ego2global @ sensor2ego.

    VEON's occ decoder runs prepare_meta with num_frame=1 PER forward_early
    call (`configs/veon/...dav2-nodepthcache.py:65`,
    `san_in_veon_temporal.py:281-293` hands each previous frame only its own
    metas) — so every frame is anchored at ITS OWN first camera's ego, and
    the cross-frame ego-motion warp happens entirely in align_after_lss.
    per_frame_anchor=True reproduces that; False gives the BEVDet-style
    single key anchor (frame 0), kept for reference/testing.

    Args:
      sensor2egos: (B, F*N, 4, 4)
      ego2globals: (B, F*N, 4, 4)

    Returns:
      (B, F, N, 4, 4) sensor->keyego.
    """
    B = sensor2egos.shape[0]
    s2e = sensor2egos.reshape(B, num_frames, num_cams, 4, 4)
    e2g = ego2globals.reshape(B, num_frames, num_cams, 4, 4)
    if per_frame_anchor:
        keyego2global = e2g[:, :, 0]  # (B, F, 4, 4): each frame's cam-0 ego
        global2keyego = se3_inverse(keyego2global)[:, :, None]
    else:
        keyego2global = e2g[:, 0, 0]  # (B, 4, 4)
        global2keyego = se3_inverse(keyego2global)[:, None, None]
    # fp32 + HIGHEST replaces the reference's `.double()` round-trip
    # (prepare_meta :336-340): the f32 cancellation error at |t|~1000 m is
    # ~6e-5 m — far below voxel size — while TPU-default bf16 matmuls here
    # would cost ~2 m.
    s2ke = compose_se3(compose_se3(global2keyego, e2g), s2e)
    return s2ke.astype(jnp.float32)
