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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


# ---------------------------------------------------------------------------
# Pallas TPU kernel: sorted cell-block accumulation via one-hot MXU matmuls.
#
# XLA's scatter-add runs this workload at ~45ms (1.49M update rows); the
# kernel restructures it as: argsort by rank + row gather (both fast in XLA)
# followed by a grid over contiguous output cell blocks, where each program
# streams its sorted value slice from HBM and accumulates
#   acc[B_CELL, C] += onehot(local_rank)[CHUNK, B_CELL]^T @ vals[CHUNK, C]
# on the MXU. Output rows are written exactly once (no read-modify-write).
# ---------------------------------------------------------------------------

BEV_POOL_BLOCK_CELLS = 512
BEV_POOL_CHUNK = 256
# Block/chunk sizing (round-5 on-chip matrix, P=900k bf16 pooled stream,
# identical checksums across configs): one-hot MXU work scales linearly
# with BLOCK_CELLS (each 128-point group multiplies a (cells x 128)
# one-hot), and each block ROUNDS its stream slice to CHUNK boundaries, so
# waste rows grow with CHUNK — the kernel is boundary-waste/MXU bound, NOT
# DMA-latency bound (512/256: 7.57 ms vs the old 1024/512: 8.21; 2048-cell
# blocks: 10.4).
# Rank-stream layout. packed=True stores the sorted rank as a lane-packed
# (P/128, 128) int32 array (4 B per point of DMA); False keeps the legacy
# (P, 128) lane-broadcast layout (512 B per point — a second HBM stream as
# large as the whole value stream, ~444 MB/frame write + read at flagship
# scale) selectable for on-chip A/B. A (P, 1) column would be the obvious
# layout but Mosaic requires DMA slices lane-aligned to 128.
BEV_POOL_RANK_PACKED = True


def _accum_stream(t, s0, s1, vals_hbm, rk_hbm, acc_ref, vals_buf, rk_buf,
                  sem_vals, sem_rk):
    """Accumulate one sorted point stream's [s0, s1) rows into acc_ref via
    one-hot MXU matmuls, with DOUBLE-BUFFERED chunk DMAs (the kernel is
    latency-bound otherwise: ~7us per serialized chunk vs ~3us pipelined).
    Chunk DMAs start on CHUNK-aligned global offsets so the HBM slices stay
    tile-aligned; rows outside [s0, s1) are masked off (adjacent blocks may
    re-read a boundary chunk). Empty blocks (s1 == s0) issue no DMA at all.

    Packed rank layout (BEV_POOL_RANK_PACKED): rk_hbm is (P/128, 128) int32
    in natural row-major order, so one chunk's ranks are a (CHUNK/128, 128)
    full-lane-width slice (Mosaic-legal DMA, 4 B per point instead of the
    512 B/point lane-broadcast). The rank values then live in LANES while
    the one-hot comparison needs them in SUBLANES; each 128-rank lane row
    is transposed to a (128, 1) column with a K=1 MXU matmul against a
    (1, 1) ones — exact, since ranks < 2**24 are integers in fp32 — and the
    chunk's accumulation becomes CHUNK/128 one-hot matmuls of K=128.
    """
    base = (s0 // BEV_POOL_CHUNK) * BEV_POOL_CHUNK
    # s1 <= s0 (empty block) must yield 0 chunks even when s0 is not
    # CHUNK-aligned (the raw ceil would be 1 fully-masked chunk)
    n_chunks = jnp.where(
        s1 > s0, (s1 - base + BEV_POOL_CHUNK - 1) // BEV_POOL_CHUNK, 0)
    sub = BEV_POOL_CHUNK // 128

    def start(i, slot):
        off = base + i * BEV_POOL_CHUNK
        pltpu.make_async_copy(
            vals_hbm.at[pl.ds(off, BEV_POOL_CHUNK)], vals_buf.at[slot],
            sem_vals.at[slot],
        ).start()
        if BEV_POOL_RANK_PACKED:
            rk_src = rk_hbm.at[pl.ds(off // 128, sub)]
        else:
            rk_src = rk_hbm.at[pl.ds(off, BEV_POOL_CHUNK)]
        pltpu.make_async_copy(rk_src, rk_buf.at[slot], sem_rk.at[slot]).start()

    @pl.when(n_chunks > 0)
    def _():
        start(0, 0)

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        off = base + i * BEV_POOL_CHUNK
        pltpu.make_async_copy(
            vals_hbm.at[pl.ds(off, BEV_POOL_CHUNK)], vals_buf.at[slot],
            sem_vals.at[slot],
        ).wait()
        if BEV_POOL_RANK_PACKED:
            rk_src = rk_hbm.at[pl.ds(off // 128, sub)]
        else:
            rk_src = rk_hbm.at[pl.ds(off, BEV_POOL_CHUNK)]
        pltpu.make_async_copy(rk_src, rk_buf.at[slot], sem_rk.at[slot]).wait()

        @pl.when(i + 1 < n_chunks)
        def _():
            start(i + 1, 1 - slot)

        # one-hot is exactly representable in any float dtype; match the
        # matmul dtype to the value stream so fp32 callers keep exact
        # accumulation while bf16 callers get the 4x MXU rate
        mm_dtype = vals_buf.dtype
        if BEV_POOL_RANK_PACKED:
            # ranks live in LANES (packed layout); the one-hot contraction
            # needs (cell, point) — build it TRANSPOSED directly by
            # broadcasting the 128-lane rank row against a sublane cell
            # iota (pure int32 compares, no fp transpose matmul: the old
            # lane->sublane K=1 MXU transpose cost 2 extra MXU passes per
            # 128 points and bound exactness to ranks < 2**24)
            celli = jax.lax.broadcasted_iota(
                jnp.int32, (BEV_POOL_BLOCK_CELLS, 128), 0)
            lanei = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            tb = t * BEV_POOL_BLOCK_CELLS
            for s in range(sub):
                rk_row = rk_buf[slot, s:s + 1, :] - tb  # (1, 128)
                gid = lanei + (off + s * 128)
                valid = (gid >= s0) & (gid < s1)
                onehot_t = jnp.where(
                    (celli == rk_row) & valid, 1.0, 0.0).astype(mm_dtype)
                acc_ref[:] += jax.lax.dot_general(
                    onehot_t, vals_buf[slot, s * 128:(s + 1) * 128, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            row = jax.lax.broadcasted_iota(
                jnp.int32, (BEV_POOL_CHUNK, BEV_POOL_BLOCK_CELLS), 0)
            col = jax.lax.broadcasted_iota(
                jnp.int32, (BEV_POOL_CHUNK, BEV_POOL_BLOCK_CELLS), 1)
            local = rk_buf[slot, :, :1] - t * BEV_POOL_BLOCK_CELLS
            gid = row + off
            valid = (gid >= s0) & (gid < s1)
            onehot = jnp.where((col == local) & valid, 1.0, 0.0).astype(mm_dtype)
            acc_ref[:] += jax.lax.dot_general(
                onehot, vals_buf[slot],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return _

    jax.lax.fori_loop(0, n_chunks, body, None)


def _bev_pool_block_kernel(starts_ref, vals_hbm, rk_hbm, out_ref, acc_ref,
                           vals_buf, rk_buf, sem_vals, sem_rk):
    """One output cell block, two HBM streams: vals rows stay in the caller's
    dtype (bf16 in production — half the bytes of an fp32 stream) and the
    sorted rank rides a separate int32 lane group."""
    t = pl.program_id(0)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    _accum_stream(t, starts_ref[t], starts_ref[t + 1], vals_hbm, rk_hbm,
                  acc_ref, vals_buf, rk_buf, sem_vals, sem_rk)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _bev_pool_block_kernel_pooled(pool_r, starts_ref, vals_hbm, rk_hbm,
                                  out_ref, acc_ref, vals_buf, rk_buf,
                                  sem_vals, sem_rk):
    """Fused-pool variant: the caller's ranks are in COARSE-MAJOR layout
    (pooled_rank_remap — every group of `pool_r` consecutive fine cells is
    one [dz,dy,dx] pooling group), so after accumulating the block's fine
    cells the [2,2,2]-style max-pool is a free in-VMEM reduce and only the
    POOLED rows ever reach HBM (8x less output traffic at the production
    ds=(2,2,2); the separate XLA max-pool pass — measured 5.4 ms on the
    335 MB fine grid — disappears). Exact: max commutes with the final
    dtype cast (round-to-nearest is monotone), so pooled rows match
    max-pooling the unfused kernel's output bitwise."""
    t = pl.program_id(0)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    _accum_stream(t, starts_ref[t], starts_ref[t + 1], vals_hbm, rk_hbm,
                  acc_ref, vals_buf, rk_buf, sem_vals, sem_rk)
    cells, cp = acc_ref.shape
    a = acc_ref[:].reshape(cells // pool_r, pool_r, cp)
    out_ref[:] = jnp.max(a, axis=1).astype(out_ref.dtype)


def _bev_pool_block_kernel2(starts_ref, starts2_ref, vals_hbm, rk_hbm,
                            vals2_hbm, rk2_hbm, out_ref, acc_ref,
                            vals_buf, rk_buf, sem_vals, sem_rk):
    """Two-stream variant: accumulates two independently sorted point streams
    (the banded main stream + the far-depth spray) into ONE output block,
    saving a second 640k x C output write plus the add-two-grids pass."""
    t = pl.program_id(0)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    _accum_stream(t, starts_ref[t], starts_ref[t + 1], vals_hbm, rk_hbm,
                  acc_ref, vals_buf, rk_buf, sem_vals, sem_rk)
    _accum_stream(t, starts2_ref[t], starts2_ref[t + 1], vals2_hbm, rk2_hbm,
                  acc_ref, vals_buf, rk_buf, sem_vals, sem_rk)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pool_stream_prep(rk_sorted, vals_sorted, v_pad):
    """Pad a sorted stream's tail so chunk DMAs never run off the end (tail
    ranks point at the sliced-off overflow region) and lay out the rank
    stream (lane-packed (P/128, 128) by default, legacy (P, 128) broadcast
    otherwise); compute per-cell-block start offsets.

    The packed layout matters: the lane-broadcast layout materializes a
    second HBM stream as large as the value stream itself (867k x 128 x
    int32 = 444 MB/frame write + read at flagship scale), doubling the
    kernel's DMA traffic; packed is 3.5 MB."""
    P, Cp = vals_sorted.shape
    pad = BEV_POOL_CHUNK
    vals_aug = jnp.concatenate(
        [vals_sorted, jnp.zeros((pad, Cp), vals_sorted.dtype)], axis=0
    )
    rk_flat = jnp.concatenate(
        [rk_sorted.astype(jnp.int32), jnp.full((pad,), v_pad, jnp.int32)]
    )
    if BEV_POOL_RANK_PACKED:
        # the in-kernel lane->sublane transpose is an fp32 MXU matmul, exact
        # only for integer ranks below 2**24
        assert v_pad < 2 ** 24, "packed rank layout needs ranks < 2**24"
        rem = (-rk_flat.shape[0]) % 128
        if rem:
            rk_flat = jnp.concatenate(
                [rk_flat, jnp.full((rem,), v_pad, jnp.int32)])
        rk_grp = rk_flat.reshape(-1, 128)
    else:
        rk_grp = jnp.broadcast_to(rk_flat[:, None], (P + pad, 128))
    starts = jnp.searchsorted(
        rk_sorted,
        jnp.arange(0, v_pad + 1, BEV_POOL_BLOCK_CELLS, dtype=rk_sorted.dtype),
    ).astype(jnp.int32)
    return starts, vals_aug, rk_grp


def _pad_channels(vals):
    """Mosaic wants 128-aligned lane counts; pad the channel dim up
    (free for the flagship's C=256)."""
    C = vals.shape[-1]
    Cp = -(-C // 128) * 128
    if Cp != C:
        vals = jnp.pad(vals, ((0, 0), (0, Cp - C)))
    return vals


def _bev_pool_sorted_pallas(rk_sorted, vals_sorted, num_cells, out_dtype,
                            stream2=None, pool_r: int = 1):
    """Sorted (P,) ranks + (P, C) weighted values -> (num_cells, C).

    stream2: optional second sorted (rk, vals) pair accumulated into the
    same output (used to fuse the banded main pool with the far spray).
    pool_r > 1: ranks are coarse-major (pooled_rank_remap) and the output is
    the max over each group of pool_r consecutive fine cells —
    (num_cells // pool_r, C) — computed in VMEM before any HBM write.
    """
    C = vals_sorted.shape[-1]
    vals_sorted = _pad_channels(vals_sorted)
    Cp = vals_sorted.shape[-1]
    n_blocks = (num_cells + BEV_POOL_BLOCK_CELLS - 1) // BEV_POOL_BLOCK_CELLS
    v_pad = n_blocks * BEV_POOL_BLOCK_CELLS
    starts, vals_aug, rk_grp = _pool_stream_prep(rk_sorted, vals_sorted, v_pad)

    scratch = [
        pltpu.VMEM((BEV_POOL_BLOCK_CELLS, Cp), jnp.float32),
        pltpu.VMEM((2, BEV_POOL_CHUNK, Cp), vals_sorted.dtype),
        pltpu.VMEM(
            (2, BEV_POOL_CHUNK // 128, 128) if BEV_POOL_RANK_PACKED
            else (2, BEV_POOL_CHUNK, 128), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    interpret = jax.devices()[0].platform == "cpu"
    if pool_r > 1:
        assert stream2 is None, "pooled kernel is single-stream"
        assert BEV_POOL_BLOCK_CELLS % pool_r == 0 and num_cells % pool_r == 0
        out_rows = BEV_POOL_BLOCK_CELLS // pool_r
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec((out_rows, Cp), lambda t, *_: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            functools.partial(_bev_pool_block_kernel_pooled, pool_r),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((v_pad // pool_r, Cp), out_dtype),
            interpret=interpret,
        )(starts, vals_aug, rk_grp)
        return out[:num_cells // pool_r, :C]
    out_spec = pl.BlockSpec(
        (BEV_POOL_BLOCK_CELLS, Cp), lambda t, *_: (t, 0),
        memory_space=pltpu.VMEM,
    )
    if stream2 is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            _bev_pool_block_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((v_pad, Cp), out_dtype),
            interpret=interpret,
        )(starts, vals_aug, rk_grp)
    else:
        rk2, vals2 = stream2
        vals2 = _pad_channels(vals2).astype(vals_sorted.dtype)
        starts2, vals2_aug, rk2_grp = _pool_stream_prep(rk2, vals2, v_pad)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            _bev_pool_block_kernel2,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((v_pad, Cp), out_dtype),
            interpret=interpret,
        )(starts, starts2, vals_aug, rk_grp, vals2_aug, rk2_grp)
    return out[:num_cells, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bev_pool_pallas(depth, feat, ranks, grid_size, valid_cap=None):
    """Pallas-accelerated bev_pool; same contract as `bev_pool`.

    valid_cap bounds the fraction of frustum points assumed inside the grid
    (sorted-valid prefix gather); None uses BEV_POOL_VALID_CAP (lossless
    1.0). Realistic rigs measure ~0.52-0.63 in-grid, so only cap with a
    rig-verified margin (count_valid_ranks) — an undersized cap silently
    drops the sorted tail.

    Backward is scatter-free: both grads are gathers of the cotangent
    (ddepth[p] = <feat[pix_p], g[rank_p]>, dfeat[pix] = sum_d w*g[rank]).
    """
    return _bev_pool_pallas_fwd(depth, feat, ranks, grid_size, valid_cap)[0]


BEV_POOL_VALID_CAP = 1.0  # default lossless; cap only with a verified margin


def _bev_pool_pallas_fwd(depth, feat, ranks, grid_size, valid_cap=None):
    B, N, D, h, w = depth.shape
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    num_cells = B * nz * ny * nx
    # pixel-major point layout: point p = (pix, d)
    rk = ranks.transpose(0, 1, 3, 4, 2).reshape(-1)  # (P,)
    wts = depth.transpose(0, 1, 3, 4, 2).reshape(-1)
    P = rk.shape[0]
    Pix = P // D
    order = jnp.argsort(rk)
    # valid points sort before the overflow cell; in practice well under
    # half the frustum lies inside the +-40m grid, so only gather/stream the
    # first P_cap sorted entries (out-of-cap rows are overflow by invariant —
    # if the cap were ever exceeded, tail contributions would be dropped)
    cap = BEV_POOL_VALID_CAP if valid_cap is None else valid_cap
    P_cap = -(-int(P * cap) // BEV_POOL_CHUNK) * BEV_POOL_CHUNK
    P_cap = min(P_cap, -(-P // BEV_POOL_CHUNK) * BEV_POOL_CHUNK)
    order = order[:P_cap]
    pix_s = (order // D).astype(jnp.int32)
    vals = feat.reshape(Pix, C)[pix_s] * wts[order][:, None]
    out = _bev_pool_sorted_pallas(rk[order], vals, num_cells, feat.dtype)
    return out.reshape(B, nz, ny, nx, C), (depth, feat, ranks)


def _bev_pool_pallas_bwd(grid_size, valid_cap, res, g):
    depth, feat, ranks = res
    B, N, D, h, w = depth.shape
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    num_cells = B * nz * ny * nx
    gflat = g.reshape(num_cells, C)
    # pad with a zero row for the overflow cell
    gpad = jnp.concatenate([gflat, jnp.zeros((1, C), g.dtype)], axis=0)
    rk = jnp.minimum(ranks, num_cells)  # (B,N,D,h,w)
    g_at_pts = gpad[rk]  # (B,N,D,h,w,C) gather
    ddepth = jnp.einsum("bnhwc,bndhwc->bndhw", feat, g_at_pts)
    dfeat = jnp.einsum("bndhw,bndhwc->bnhwc", depth, g_at_pts)
    return ddepth, dfeat, None


bev_pool_pallas.defvjp(_bev_pool_pallas_fwd, _bev_pool_pallas_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bev_pool_pallas_presorted(depth, feat, order, rk_sorted, ranks, grid_size):
    """Accelerate-mode pool: the rig-dependent sort is PRECOMPUTED.

    `order`/`rk_sorted`/`ranks` come from `LSSLift.precompute_sorted`
    (host-side, once per camera rig): `order` indexes the pixel-major
    flattened point set (p = pix * D + d) restricted to the sorted in-grid
    prefix (plus chunk padding of overflow rows), `rk_sorted =
    ranks_flat[order]`, `ranks` the full (B, N, D, h, w) grid for the
    backward gather. Per frame only the two-hot weights vary, so the
    per-frame work is one gather + multiply + the cell-block kernel stream —
    no argsort, and no cap guesswork: the prefix length equals the exact
    in-grid count (host-verified), so nothing can be dropped. TPU
    counterpart of the reference accelerate mode
    (`view_transformer_raw.py:196-215, 304-332`).
    """
    return _bev_pool_presorted_fwd(depth, feat, order, rk_sorted, ranks,
                                   grid_size)[0]


def _bev_pool_presorted_fwd(depth, feat, order, rk_sorted, ranks, grid_size):
    B = depth.shape[0]
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    num_cells = B * nz * ny * nx
    vals = _presorted_vals(depth, feat, order)
    out = _bev_pool_sorted_pallas(rk_sorted, vals, num_cells, feat.dtype)
    return out.reshape(B, nz, ny, nx, C), (depth, feat, ranks)


def _bev_pool_presorted_bwd(grid_size, res, g):
    # exact adjoint of the (lossless) forward == the full-path adjoint
    d_depth, d_feat, _ = _bev_pool_pallas_bwd(grid_size, None, res, g)
    return d_depth, d_feat, None, None, None


bev_pool_pallas_presorted.defvjp(_bev_pool_presorted_fwd,
                                 _bev_pool_presorted_bwd)


def pooled_rank_remap(ranks, grid_size, ds, num_cells):
    """Standard flat voxel rank -> COARSE-MAJOR rank for the fused-pool
    kernel: rank' = coarse_cell * R + fine_offset, where coarse_cell indexes
    the (nz/dz, ny/dy, nx/dx) pooled grid and fine_offset the [dz,dy,dx]
    pooling group (R = dz*dy*dx). Sorting the stream by rank' makes every
    pooling group CONTIGUOUS inside one kernel cell block, so the
    [2,2,2]-style output max-pool (`LSSLift._ds_pool`) runs in VMEM on the
    accumulator and the fine grid never touches HBM. Overflow ranks
    (>= num_cells) are preserved. Static per rig — applied once in
    `LSSLift.precompute_sorted`.
    """
    nx, ny, nz = grid_size
    dz, dy, dx = ds
    r = ranks
    x = r % nx
    y = (r // nx) % ny
    zb = r // (nx * ny)
    z = zb % nz
    b = zb // nz
    rr = dz * dy * dx
    coarse = ((b * (nz // dz) + z // dz) * (ny // dy) + y // dy) * (nx // dx) + x // dx
    off = ((z % dz) * dy + (y % dy)) * dx + (x % dx)
    return jnp.where(r >= num_cells, r, coarse * rr + off)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bev_pool_pallas_presorted_pooled(depth, feat, order, rk_sorted, ranks,
                                     grid_size, ds):
    """Accelerate-mode pool with the output max-pool FUSED into the kernel.

    Same contract as `bev_pool_pallas_presorted` + `LSSLift._ds_pool`'s
    [dz,dy,dx] max — in one kernel pass: `rk_sorted`/`ranks` must be in the
    coarse-major layout from `pooled_rank_remap` (precompute_sorted emits
    them when fusing). Returns the POOLED grid (B, nz/dz, ny/dy, nx/dx, C)
    directly; the (B, nz, ny, nx, C) fine grid is never materialized in HBM
    (8x less output traffic at ds=(2,2,2), and the standalone XLA max-pool
    pass — 5.4 ms measured at production scale — disappears).

    Backward (training/temporal paths don't use this op, but exactness is
    free): recompute the fine grid, route the cotangent through jnp.max's
    VJP (identical subgradient convention to the unfused `_ds_pool`), then
    the same scatter-free gather adjoints as the unfused op.
    """
    return _bev_pool_presorted_pooled_fwd(depth, feat, order, rk_sorted,
                                          ranks, grid_size, ds)[0]


def _presorted_vals(depth, feat, order):
    D = depth.shape[2]
    C = feat.shape[-1]
    wts = depth.transpose(0, 1, 3, 4, 2).reshape(-1)
    pix = (order // D).astype(jnp.int32)
    return feat.reshape(-1, C)[pix] * wts[order][:, None]


def _bev_pool_presorted_pooled_fwd(depth, feat, order, rk_sorted, ranks,
                                   grid_size, ds):
    B = depth.shape[0]
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    dz, dy, dx = ds
    num_cells = B * nz * ny * nx
    vals = _presorted_vals(depth, feat, order)
    out = _bev_pool_sorted_pallas(rk_sorted, vals, num_cells, feat.dtype,
                                  pool_r=dz * dy * dx)
    return (out.reshape(B, nz // dz, ny // dy, nx // dx, C),
            (depth, feat, order, rk_sorted, ranks))


def _bev_pool_presorted_pooled_bwd(grid_size, ds, res, g):
    depth, feat, order, rk_sorted, ranks = res
    B, N, D, h, w = depth.shape
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    rr = int(np.prod(ds))
    num_cells = B * nz * ny * nx
    # fine grid in the coarse-major layout (cheap relative to the towers'
    # backward, and only paid when something differentiates the serving op)
    vals = _presorted_vals(depth, feat, order)
    fine = _bev_pool_sorted_pallas(rk_sorted, vals, num_cells, feat.dtype)
    pool = lambda v: jnp.max(v.reshape(num_cells // rr, rr, C), axis=1)  # noqa: E731
    _, pool_vjp = jax.vjp(pool, fine)
    (g_fine,) = pool_vjp(g.reshape(num_cells // rr, C))
    gpad = jnp.concatenate([g_fine, jnp.zeros((1, C), g_fine.dtype)], axis=0)
    g_at = gpad[jnp.minimum(ranks, num_cells)]  # (B,N,D,h,w,C)
    ddepth = jnp.einsum("bnhwc,bndhwc->bndhw", feat, g_at)
    dfeat = jnp.einsum("bndhw,bndhwc->bnhwc", depth, g_at)
    return ddepth, dfeat, None, None, None


bev_pool_pallas_presorted_pooled.defvjp(_bev_pool_presorted_pooled_fwd,
                                        _bev_pool_presorted_pooled_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bev_pool_pallas_banded(weights, feat, ranks, grid_size, valid_cap=None):
    """Banded (pixel-major) Pallas bev_pool: each pixel contributes K bins.

    Same cell-block MXU kernel as `bev_pool_pallas`, but the point set is the
    K-banded one from `lift.lss.banded_two_hot` (K ~ 17 instead of D = 88
    points per pixel). With valid_cap=None the FULL sorted stream is pooled —
    nothing can be silently dropped; a cap (sorted-valid prefix gather, see
    `bev_pool_pallas`) only makes sense for sparse point sets like the
    far-depth spray, where callers must pair it with `count_valid_ranks`.

    Args:
      weights: (B, N, h, w, K) banded depth weights.
      feat: (B, N, h, w, C) per-pixel context features.
      ranks: (B, N, h, w, K) int32 flat voxel ranks (overflow = num_cells).
      grid_size: (nx, ny, nz).

    Returns (B, nz, ny, nx, C), channel-last.
    """
    return _bev_pool_banded_fwd(weights, feat, ranks, grid_size, valid_cap)[0]


def count_valid_ranks(ranks, num_cells) -> jnp.ndarray:
    """In-graph count of in-grid points — the guard for any valid_cap: a cap
    is only lossless while count_valid_ranks(ranks) <= cap * ranks.size."""
    return jnp.sum((ranks < num_cells).astype(jnp.int32))


def _bev_pool_banded_fwd(weights, feat, ranks, grid_size, valid_cap=None):
    B, N, h, w, K = weights.shape
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    num_cells = B * nz * ny * nx
    rk, vals = _sorted_stream(weights, feat.reshape(-1, C), ranks, K, valid_cap)
    out = _bev_pool_sorted_pallas(rk, vals, num_cells, feat.dtype)
    return out.reshape(B, nz, ny, nx, C), (weights, feat, ranks)


def _bev_pool_banded_bwd(grid_size, valid_cap, res, g):
    weights, feat, ranks = res
    B, N, h, w, K = weights.shape
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    num_cells = B * nz * ny * nx
    gflat = g.reshape(num_cells, C)
    gpad = jnp.concatenate([gflat, jnp.zeros((1, C), g.dtype)], axis=0)
    g_at = gpad[jnp.minimum(ranks, num_cells)]  # (B,N,h,w,K,C) gather
    # The backward ignores valid_cap (it is the exact adjoint of the UNCAPPED
    # forward); callers using a cap must keep it lossless via
    # count_valid_ranks, which also keeps this backward exact.
    dweights = jnp.einsum("bnhwc,bnhwkc->bnhwk", feat, g_at)
    dfeat = jnp.einsum("bnhwk,bnhwkc->bnhwc", weights, g_at)
    return dweights, dfeat, None


bev_pool_pallas_banded.defvjp(_bev_pool_banded_fwd, _bev_pool_banded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bev_pool_pallas_banded2(weights, feat, ranks, weights2, ranks2,
                            grid_size, valid_cap2=None):
    """Fused two-stream banded pool: the K-banded main stream (uncapped) and
    a second pixel-major stream (e.g. the far-depth spray over all D bins,
    optionally capped) accumulate into ONE voxel grid inside the kernel —
    saving a second full-grid output write and the add-two-grids pass.

    weights/ranks: (B, N, h, w, K); weights2/ranks2: (B, N, h, w, K2);
    feat: (B, N, h, w, C) shared by both streams.
    """
    return _bev_pool_banded2_fwd(weights, feat, ranks, weights2, ranks2,
                                 grid_size, valid_cap2)[0]


def _sorted_stream(weights, feat_flat, ranks, K, valid_cap):
    rk = ranks.reshape(-1)
    wts = weights.reshape(-1)
    P = rk.shape[0]
    order = jnp.argsort(rk)
    if valid_cap is not None:
        P_cap = -(-int(P * valid_cap) // BEV_POOL_CHUNK) * BEV_POOL_CHUNK
        P_cap = min(P_cap, -(-P // BEV_POOL_CHUNK) * BEV_POOL_CHUNK)
        order = order[:P_cap]
    pix = (order // K).astype(jnp.int32)
    vals = feat_flat[pix] * wts[order][:, None]
    return rk[order], vals


def _bev_pool_banded2_fwd(weights, feat, ranks, weights2, ranks2,
                          grid_size, valid_cap2=None):
    B, N, h, w, K = weights.shape
    K2 = weights2.shape[-1]
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    num_cells = B * nz * ny * nx
    feat_flat = feat.reshape(-1, C)
    rk1, vals1 = _sorted_stream(weights, feat_flat, ranks, K, None)
    rk2, vals2 = _sorted_stream(weights2, feat_flat, ranks2, K2, valid_cap2)
    out = _bev_pool_sorted_pallas(rk1, vals1, num_cells, feat.dtype,
                                  stream2=(rk2, vals2))
    return out.reshape(B, nz, ny, nx, C), (weights, feat, ranks, weights2, ranks2)


def _bev_pool_banded2_bwd(grid_size, valid_cap2, res, g):
    weights, feat, ranks, weights2, ranks2 = res
    B, N, h, w, K = weights.shape
    C = feat.shape[-1]
    nx, ny, nz = grid_size
    num_cells = B * nz * ny * nx
    gpad = jnp.concatenate(
        [g.reshape(num_cells, C), jnp.zeros((1, C), g.dtype)], axis=0)
    g1 = gpad[jnp.minimum(ranks, num_cells)]
    g2 = gpad[jnp.minimum(ranks2, num_cells)]
    dw1 = jnp.einsum("bnhwc,bnhwkc->bnhwk", feat, g1)
    dw2 = jnp.einsum("bnhwc,bnhwkc->bnhwk", feat, g2)
    dfeat = (jnp.einsum("bnhwk,bnhwkc->bnhwc", weights, g1)
             + jnp.einsum("bnhwk,bnhwkc->bnhwc", weights2, g2))
    return dw1, dfeat, None, dw2, None


bev_pool_pallas_banded2.defvjp(_bev_pool_banded2_fwd, _bev_pool_banded2_bwd)


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
