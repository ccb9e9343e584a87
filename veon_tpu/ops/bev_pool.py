"""Voxel scatter-add pooling for LSS lift-splat — the TPU equivalent of
the reference's only native kernel (bev_pool_v2,
`mmdet3d/ops/bev_pool_v2/src/bev_pool_cuda.cu:21-48` + autograd wrapper
`ops/bev_pool_v2/bev_pool.py:11-92`).

Design notes (TPU-first, not a port):
  * The CUDA kernel needs host-side dynamic filtering/argsort/CSR intervals.
    XLA wants static shapes, so we keep all B*N*D*h*w frustum points and map
    out-of-grid ones to a single overflow cell (see geometry.frustum.voxel_ranks).
  * The pooled value is out[v, c] = sum_{p: rank_p = v} depth_p * feat[pix(p), c],
    i.e. a scatter-add of rank-indexed outer products. We never materialize
    the (P, C) update tensor for the full problem: a lax.scan over the D depth
    planes performs D scatter-adds of (B*N*h*w, C) updates. XLA's scatter-add
    VJP is a gather, so autodiff gives the exact backward of the CUDA kernel
    (grad_depth / grad_feat, bev_pool_cuda.cu:67-121) for free.
  * dnum=unique trick: the overflow cell is row `num_cells` of an
    (num_cells+1, C) buffer and is sliced off at the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bev_pool_points(
    depth: jnp.ndarray,
    feat: jnp.ndarray,
    ranks_depth: jnp.ndarray,
    ranks_feat: jnp.ndarray,
    ranks_bev: jnp.ndarray,
    num_cells: int,
) -> jnp.ndarray:
    """Explicit-rank scatter pooling (small-scale / test form).

    Semantics of `bev_pool_v2_kernel`: out[rb[p], :] += depth[rd[p]] * feat[rf[p], :].

    Args:
      depth: (Pd,) flat depth weights.
      feat: (Pf, C) flat per-pixel features.
      ranks_depth / ranks_feat / ranks_bev: (P,) int32 indices.
      num_cells: number of output cells.

    Returns:
      (num_cells, C) pooled features.
    """
    updates = depth[ranks_depth][:, None] * feat[ranks_feat]
    out = jnp.zeros((num_cells + 1, feat.shape[-1]), dtype=feat.dtype)
    rb = jnp.where(ranks_bev < num_cells, ranks_bev, num_cells)
    out = out.at[rb].add(updates)
    return out[:num_cells]


@functools.partial(jax.jit, static_argnames=("num_cells", "unroll"))
def _bev_pool_scan(depth, feat, ranks, num_cells, unroll=1):
    """Scan over depth planes; each step scatter-adds one plane's contributions.

    depth: (D, P) plane-major depth weights, P = B*N*h*w pixels.
    feat:  (P, C) pixel features.
    ranks: (D, P) int32 flat cell index, overflow = num_cells.
    """
    C = feat.shape[-1]
    out = jnp.zeros((num_cells + 1, C), dtype=feat.dtype)

    def body(acc, inputs):
        d_w, d_r = inputs
        acc = acc.at[d_r].add(d_w[:, None] * feat, mode="drop")
        return acc, None

    out, _ = jax.lax.scan(body, out, (depth, ranks), unroll=unroll)
    return out[:num_cells]


def bev_pool(
    depth: jnp.ndarray,
    feat: jnp.ndarray,
    ranks: jnp.ndarray,
    grid_size: tuple,
) -> jnp.ndarray:
    """LSS voxel pooling over the full frustum (production form).

    Args:
      depth: (B, N, D, h, w) per-pixel depth-bin probabilities.
      feat: (B, N, h, w, C) per-pixel context features (channel-last).
      ranks: (B, N, D, h, w) int32 flat voxel ranks from geometry.voxel_ranks
        (layout ((b*nz+z)*ny+y)*nx+x, overflow cell == B*nz*ny*nx).
      grid_size: (nx, ny, nz).

    Returns:
      (B, nz, ny, nx, C) voxel features (channel-last; the reference returns
      (B, C, Z, Y, X) — callers transpose if needed, but the TPU path keeps
      channel-last throughout).
    """
    B, N, D, h, w = depth.shape
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    num_cells = B * nz * ny * nx
    P = B * N * h * w
    # plane-major layout: (D, P)
    depth_dp = depth.transpose(2, 0, 1, 3, 4).reshape(D, P)
    ranks_dp = ranks.transpose(2, 0, 1, 3, 4).reshape(D, P)
    feat_p = feat.reshape(P, C)
    out = _bev_pool_scan(depth_dp, feat_p, ranks_dp, num_cells)
    return out.reshape(B, nz, ny, nx, C)
