"""Lift-Splat-Shoot view transform, TPU-first.

Re-designs `LSSViewTransformerRaw` (`mmdet3d/models/necks/view_transformer_raw.py`)
as a stateless jit-friendly object: the frustum template is a compile-time
constant, voxel ranks are computed in-graph with static shapes
(geometry.frustum), and the pooling is veon_tpu.ops.bev_pool.
All tensors are channel-last.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import GridConfig
from ..geometry.frustum import (create_frustum, frustum_to_ego,
                                pixel_ray_geometry, voxel_ranks)
from ..ops.bev_pool import (bev_pool, bev_pool_pallas, bev_pool_pallas_banded,
                            bev_pool_pallas_banded2, bev_pool_pallas_presorted,
                            bev_pool_pallas_presorted_pooled)


def min_pool_depth(depth: jnp.ndarray, downsample: int) -> jnp.ndarray:
    """Min-pool metric depth, treating 0 as missing (maps to 1e5 first).

    Semantics of `view_transformer_raw.py:393-404` (downsample_depth).
    depth: (..., H, W) -> (..., H/ds, W/ds).
    """
    *lead, H, W = depth.shape
    d = depth.reshape(*lead, H // downsample, downsample, W // downsample, downsample)
    d = jnp.where(d == 0.0, 1e5, d)
    return jnp.min(d, axis=(-3, -1))


def absolute_depth_from_bins(bins: jnp.ndarray, grid: GridConfig):
    """Bin distribution -> (expected, hard-argmax) metric depth
    (`view_transformer_raw.py:376-391` get_absolute_depth). bins: (..., K)
    with centers arange(K)*dd + (d0 - dd/2)."""
    centers = jnp.arange(bins.shape[-1], dtype=bins.dtype) * grid.depth[2] + (
        grid.depth[0] - grid.depth[2] / 2
    )
    avg = jnp.sum(bins * centers, axis=-1)
    hard = jnp.eye(bins.shape[-1], dtype=bins.dtype)[jnp.argmax(bins, axis=-1)]
    return avg, jnp.sum(hard * centers, axis=-1)


def sid_depth_values(grid: GridConfig) -> np.ndarray:
    """Spacing-Increasing Discretization plane depths (sid=True,
    `view_transformer_raw.py:107-112`)."""
    D = grid.num_depth_bins
    d0, d1, _ = grid.depth
    i = np.arange(D, dtype=np.float64)
    return np.exp(np.log(d0) + i / (D - 1) * np.log((d1 - 1.0) / d0)).astype(np.float32)


def _bin_centers(grid: GridConfig, num: int, dtype=jnp.float32) -> jnp.ndarray:
    """num bin centers: arange(num)*dd + (d0 + dd/2) — `view_transformer_raw.py:417-418`."""
    d0, _, dd = grid.depth
    return jnp.arange(num, dtype=dtype) * dd + (d0 + dd / 2)


def two_hot_depth(depth: jnp.ndarray, grid: GridConfig, gamma: float = 4.0) -> jnp.ndarray:
    """Metric depth -> soft distribution over D depth bins ("two-hot").

    Semantics of `get_two_hot_depth` (`view_transformer_raw.py:406-429`):
    softmax over -gamma*|d - center_i| across D+1 bins (one overflow bin at
    the far end), gap clamped at -16 with a straight-through trick (clamping
    is a no-op in the forward; in JAX we express the same forward with a
    stop_gradient offset so VJP matches the torch trick).

    Args:
      depth: (..., H, W) metric depth.
    Returns:
      (..., D, H, W) bin probabilities (overflow bin dropped).
    """
    D = grid.num_depth_bins
    centers = _bin_centers(grid, D + 1, depth.dtype)
    gap = -jnp.abs(depth[..., None] - centers) * gamma
    # torch: where(gap >= MIN_GAP, gap, gap + (MIN_GAP - gap.detach()))
    MIN_GAP = -16.0
    gap = jnp.where(gap >= MIN_GAP, gap, gap + jax.lax.stop_gradient(MIN_GAP - gap))
    dist = jax.nn.softmax(gap, axis=-1)[..., :D]
    return jnp.moveaxis(dist, -1, -3)


def banded_two_hot(
    depth: jnp.ndarray, grid: GridConfig, K: int, gamma: float = 4.0,
    min_gap: float = -16.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-hot depth weights restricted to K consecutive bins — EXACT.

    `get_two_hot_depth` clamps the softmax logits at -16, so every bin whose
    center is farther than |min_gap|/gamma (= 4 m at the defaults, i.e. 8
    bins) from the metric depth contributes exactly exp(-16)/Z. A band of
    K >= 2*ceil(|min_gap|/(gamma*dd)) + 1 consecutive bins centered on the
    nearest bin therefore contains every unclamped bin, and the softmax
    normalizer over all D+1 bins is the banded sum plus
    (D+1-K)*exp(min_gap) analytically. This cuts the entire lift pipeline
    (geometry, weights, sort, gather, kernel stream) D/K-fold with zero
    approximation.

    Args:
      depth: (..., h, w) metric depth.
    Returns:
      weights: (..., h, w, K) bin probabilities;
      bins: (..., h, w, K) int32 bin indices in [0, D] (D = overflow bin,
        whose mass the reference drops — callers must mask it).
    """
    w, bins, _ = banded_two_hot_with_floor(depth, grid, K, gamma, min_gap)
    return w, bins


def banded_two_hot_with_floor(
    depth: jnp.ndarray, grid: GridConfig, K: int, gamma: float = 4.0,
    min_gap: float = -16.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """banded_two_hot plus the per-pixel floor weight exp(min_gap)/Z that
    every OUT-of-band bin carries in the full softmax (its clamped value).
    The exact decomposition used by the banded lift:
      full[j] = banded[j] for j in band, floor for j outside.

    VALUES are exact; the gradient w.r.t. metric depth is approximate: the
    full softmax's straight-through clamp gives every out-of-band bin a
    +-gamma contribution to d/d(depth) through Z, while here the
    (D+1-K)*exp(min_gap) normalizer term and the spray floor are analytic
    constants. Measured bound (test_banded_lift_gradients_match_full):
    max deviation 3.6e-2 * max|grad| (worst on out-of-range pixels, where
    every bin is clamped), mean 2e-3. Inconsequential in every actual
    training path: stage-2 stop_gradients the depth tower
    (`veon_temporal.py:139-147` / model.full_forward), so d/d(depth) never
    flows through the lift. d/d(features) is exact.
    """
    D = grid.num_depth_bins
    d0, _, dd = grid.depth
    K = min(K, D + 1)
    i_near = jnp.round((depth - (d0 + dd / 2)) / dd)
    i0 = jnp.clip(i_near - (K - 1) // 2, 0, D + 1 - K).astype(jnp.int32)
    bins = i0[..., None] + jnp.arange(K, dtype=jnp.int32)
    centers = bins.astype(depth.dtype) * dd + (d0 + dd / 2)
    gap = -jnp.abs(depth[..., None] - centers) * gamma
    gap = jnp.where(gap >= min_gap, gap, gap + jax.lax.stop_gradient(min_gap - gap))
    e = jnp.exp(gap)
    z = jnp.sum(e, axis=-1, keepdims=True) + (D + 1 - K) * np.exp(min_gap)
    return e / z, bins, np.exp(min_gap) / z[..., 0]


def one_hot_depth(depth: jnp.ndarray, grid: GridConfig) -> jnp.ndarray:
    """Hard one-hot depth distribution (`get_one_hot_depth`, :431-456)."""
    D = grid.num_depth_bins
    centers = _bin_centers(grid, D + 1, depth.dtype)
    d = jnp.clip(depth, max=500.0)
    gap = -jnp.abs(d[..., None] - centers)
    idx = jnp.argmax(gap, axis=-1)
    onehot = jnp.eye(D + 1, dtype=depth.dtype)[idx][..., :D]
    return jnp.moveaxis(onehot, -1, -3)


def depth_bins_one_hot_gt(gt_depth: jnp.ndarray, grid: GridConfig, downsample: int) -> jnp.ndarray:
    """Sparse LiDAR GT depth -> one-hot bin targets with a validity channel.

    Semantics of `get_downsampled_gt_depth` (`view_transformer_raw.py:339-374`):
    min-pool (0 = missing), quantize to bins with edge convention
    (d - (d0 - dd)) / dd, out-of-range -> bin 0 (invalid).

    Returns:
      (..., h, w, D) one-hot; all-zero rows mean "no GT here".
    """
    D = grid.num_depth_bins
    d0, _, dd = grid.depth
    d = min_pool_depth(gt_depth, downsample)
    q = (d - (d0 - dd)) / dd
    q = jnp.where((q < D + 1) & (q >= 0.0), q, 0.0)
    oh = jnp.eye(D + 1, dtype=gt_depth.dtype)[q.astype(jnp.int32)]
    return oh[..., 1:]


@dataclasses.dataclass(frozen=True)
class LSSLift:
    """The LSS lift: (per-pixel features, two-hot depth, camera metas) -> voxel grid.

    Equivalent surface to `LSSViewTransformerRaw.forward` (:537-555) with
    collapse_z=False and the [2,2,2] ds max-pool.
    """

    grid: GridConfig
    input_size: Tuple[int, int]
    downsample: int = 16
    out_channels: int = 256
    ds_feat: Tuple[int, int, int] = (2, 2, 2)  # (z, h, w) output max-pool
    impl: str = "pallas"  # "pallas" (sorted MXU kernel) | "scan" (XLA scatter)
    # Sorted-valid-prefix cap for the generic pallas path. Default LOSSLESS:
    # on realistic rigs the in-grid fraction is ~0.52-0.63 (measured; the
    # round-1 "0.17" came from the then-broken example rig), so any cap
    # below that silently drops mass. Tighten only with a rig-specific
    # count_valid_ranks check (the presorted serving path sizes its prefix
    # exactly and needs no cap at all).
    valid_cap: float = 1.0
    # K-banded exact two-hot lift (lift_from_metric): bins per pixel.
    # 17 = 2*|MIN_GAP|/(gamma*dd) + 1 covers every unclamped bin at the
    # defaults, making the banded softmax exactly the full one.
    band_k: int = 17
    # Far-depth spray: past ~46 m predicted depth the clamped softmax puts
    # non-negligible uniform mass exp(-16)/Z on EVERY bin along the ray (at
    # d > 49.25 m it is exactly uniform 1/(D+1)); a second sparse pool
    # reproduces it exactly where it exceeds spray_eps of total mass.
    far_spray: bool = True
    spray_eps: float = 1e-6  # per-bin floor-weight threshold for spraying
    # optional valid-prefix cap for the sparse spray pool: spray rows are
    # far-depth (>~46 m predicted) pixels' in-grid bins, i.e. f_far * v of
    # all P rows (v ~ 0.58 in-grid on realistic rigs). Default None =
    # LOSSLESS (the spray streams its full sorted set); a cap is a perf
    # knob that MUST be paired with a count_valid_ranks check for the
    # worst-case depth map — an exceeded cap drops mass silently.
    spray_cap: Optional[float] = None
    # camera-sharded SPMD (serve/camshard.py): name of the mesh axis the
    # camera ring is sharded over. The all-reduce completing the splat must
    # happen on the FULL-resolution grid, BEFORE the ds max-pool — max does
    # not commute with the cross-camera sum (overlap cells hold mass from
    # several cameras) — so it lives here rather than after the lift.
    psum_axis: Optional[str] = None

    @classmethod
    def from_config(cls, cfg, **overrides):
        """Single construction recipe from a VeonConfig, shared by
        VeonModel.setup, the camshard serving path, and the bench/entry
        harnesses — so a precomputed rank sort is always built with the same
        lift the model runs (a drifted inline copy would silently desync
        when a field becomes config-driven)."""
        kw = dict(grid=cfg.grid, input_size=cfg.data.input_size,
                  downsample=cfg.lss_downsample,
                  out_channels=cfg.propagation.dim, ds_feat=cfg.lss_feat_ds)
        kw.update(overrides)
        return cls(**kw)

    def precompute_ranks(self, sensor2ego, cam2img, post_rot, post_tran, bda):
        """The "accelerate" mode (`view_transformer_raw.py:196-215, 304-332`):
        when intrinsics/extrinsics are constant, compute voxel ranks once and
        reuse them via `__call__(..., ranks=...)`. Also available host-side
        through veon_tpu.data.native.voxel_ranks_native."""
        frustum = jnp.asarray(self.frustum, dtype=jnp.float32)
        coor = frustum_to_ego(frustum, sensor2ego, cam2img, post_rot, post_tran, bda)
        ranks, _ = voxel_ranks(coor, self.grid)
        return ranks

    def precompute_sorted(self, sensor2ego, cam2img, post_rot, post_tran, bda,
                          fuse_ds_pool: Optional[bool] = None):
        """Full accelerate precompute for a FIXED camera rig (serving): the
        rank sort is done ONCE here, host-side, so the per-frame lift is just
        gather + multiply + kernel stream (`lift_presorted`).

        Runs OUTSIDE jit (reads back the exact in-grid point count to size
        the sorted prefix — which is what makes the prefix provably lossless,
        unlike `valid_cap`'s static guess). Returns a dict pytree to pass
        through jit boundaries as an ordinary argument.

        fuse_ds_pool (default: auto — on whenever valid): emit ranks in the
        coarse-major layout (`ops.bev_pool.pooled_rank_remap`) so the
        per-frame kernel max-pools its accumulator in VMEM and writes only
        the POOLED grid (the fine (B,nz,ny,nx,C) grid never touches HBM).
        Invalid under camera sharding: the cross-camera psum must see the
        FULL-resolution grid (max does not commute with the sum), so
        psum_axis forces the unfused layout. The emitted dict marks the
        layout via its KEY ("rk_pooled" vs "rk_sorted") — pytree structure
        is static through jit, array values are not.
        """
        from ..ops.bev_pool import BEV_POOL_CHUNK, pooled_rank_remap

        B = sensor2ego.shape[0]
        num_cells = B * int(np.prod(self.grid.size))
        if fuse_ds_pool is None:
            fuse_ds_pool = (self.psum_axis is None
                            and int(np.prod(self.ds_feat)) > 1)
        if fuse_ds_pool and self.psum_axis is not None:
            raise ValueError(
                "fuse_ds_pool under camera sharding: the cam-axis psum needs "
                "the full-resolution grid before the max-pool")

        # one jit for the whole precompute graph: eager op-by-op execution
        # costs a remote compile PER OP on this backend (~minutes total)
        @jax.jit
        def _graph(s2e, k, pr, pt, b):
            ranks = self.precompute_ranks(s2e, k, pr, pt, b)
            if fuse_ds_pool:
                dz, dh, dw = self.ds_feat
                ranks = pooled_rank_remap(ranks, self.grid.size,
                                          (dz, dh, dw), num_cells)
            rk = ranks.transpose(0, 1, 3, 4, 2).reshape(-1)  # pixel-major
            order = jnp.argsort(rk)
            return ranks, rk[order], order.astype(jnp.int32), jnp.sum(
                (rk < num_cells).astype(jnp.int32))

        ranks, rk_sorted, order, n_valid = _graph(
            sensor2ego, cam2img, post_rot, post_tran, bda)
        n_valid = int(n_valid)  # host readback, once per rig
        p_cap = min(-(-n_valid // BEV_POOL_CHUNK) * BEV_POOL_CHUNK,
                    order.shape[0])
        take = jax.jit(lambda o, r: (o[:p_cap], r[:p_cap]))
        order, rk_sorted = take(order, rk_sorted)
        rk_key = "rk_pooled" if fuse_ds_pool else "rk_sorted"
        return {"order": order, rk_key: rk_sorted, "ranks": ranks}

    def lift_presorted(self, feat, depth, precomp):
        """Per-frame accelerate lift: `depth` is the (B, N, D, h, w) two-hot
        distribution; `precomp` from `precompute_sorted` for this rig.
        A "rk_pooled" precompute routes to the fused-pool kernel (the ds
        max-pool runs in VMEM on the accumulator; bit-identical output)."""
        if "rk_pooled" in precomp:
            assert self.psum_axis is None, (
                "pooled presorted lift cannot feed a cam-axis psum")
            return bev_pool_pallas_presorted_pooled(
                depth, feat, precomp["order"], precomp["rk_pooled"],
                precomp["ranks"], self.grid.size, tuple(self.ds_feat),
            )
        vox = bev_pool_pallas_presorted(
            depth, feat, precomp["order"], precomp["rk_sorted"],
            precomp["ranks"], self.grid.size,
        )
        return self._ds_pool(vox)

    @property
    def frustum(self) -> np.ndarray:
        return create_frustum(self.grid, self.input_size, self.downsample)

    @property
    def num_depth_bins(self) -> int:
        return self.grid.num_depth_bins

    def __call__(
        self,
        feat: jnp.ndarray,
        depth: jnp.ndarray,
        sensor2ego: jnp.ndarray,
        cam2img: jnp.ndarray,
        post_rot: jnp.ndarray,
        post_tran: jnp.ndarray,
        bda: jnp.ndarray,
        ranks: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Args:
          feat: (B, N, h, w, C) context features (channel-last).
          depth: (B, N, D, h, w) depth-bin probabilities.
          sensor2ego: (B, N, 4, 4); cam2img: (B, N, 3, 3);
          post_rot: (B, N, 3, 3); post_tran: (B, N, 3); bda: (B, 3, 3).

        Returns:
          (B, Z', Y', X', C) voxel features after the (z,h,w) max-pool
          (Z' = nz/dz etc.), channel-last.
        """
        if ranks is None:
            ranks = self.precompute_ranks(sensor2ego, cam2img, post_rot, post_tran, bda)
        if self.impl == "pallas":
            vox = bev_pool_pallas(depth, feat, ranks, self.grid.size,
                                  self.valid_cap)  # (B, Z, Y, X, C)
        else:
            vox = bev_pool(depth, feat, ranks, self.grid.size)
        return self._ds_pool(vox)

    def _ds_pool(self, vox: jnp.ndarray) -> jnp.ndarray:
        if self.psum_axis is not None:
            # camera-sharded: each shard pooled only its local cameras'
            # points; sum the full-res grids over the cam mesh axis (ICI
            # all-reduce) BEFORE the max-pool (see psum_axis field note)
            vox = jax.lax.psum(vox, self.psum_axis)
        dz, dh, dw = self.ds_feat
        if (dz, dh, dw) != (1, 1, 1):
            B, Z, Y, X, C = vox.shape
            vox = vox.reshape(B, Z // dz, dz, Y // dh, dh, X // dw, dw, C)
            vox = jnp.max(vox, axis=(2, 4, 6))
        return vox

    def lift_from_metric(
        self,
        feat: jnp.ndarray,
        metric_depth: jnp.ndarray,
        sensor2ego: jnp.ndarray,
        cam2img: jnp.ndarray,
        post_rot: jnp.ndarray,
        post_tran: jnp.ndarray,
        bda: jnp.ndarray,
    ) -> jnp.ndarray:
        """Banded lift straight from metric depth — exact two_hot semantics
        at ~K/D of the cost.

        Decomposition (all terms exact, see banded_two_hot_with_floor):
          * main pool: the K bins around the metric depth carry
            exp(gap)/Z; out-of-band bins carry the clamped floor exp(-16)/Z.
          * spray pool: where the floor exceeds spray_eps (predicted depth
            past ~46 m, where the reference's softmax degenerates toward a
            uniform ray spray), a second sparse pool deposits the floor on
            ALL D bins and the main weights are reduced by it in-band.
          Floors below spray_eps (< 1e-6 of mass per bin) are dropped.

        The main pool has NO valid-cap — nothing can be silently dropped
        (unlike `__call__`'s capped prefix); the spray pool's cap is sized
        for its sparse point set (in-grid points of far-depth pixels only).

        Args:
          feat: (B, N, h, w, C); metric_depth: (B, N, h, w) at the LSS
            feature grid resolution (already min-pooled).
          metas as in __call__.
        Returns (B, Z', Y', X', C) after the ds max-pool.
        """
        D = self.grid.num_depth_bins
        d0, _, dd = self.grid.depth
        # the banded decomposition is exact ONLY when every out-of-band bin
        # is clamped: band must cover 2*ceil(|MIN_GAP|/(gamma*dd)) + 1 bins
        # (gamma=4, MIN_GAP=-16 -> 17 at dd=0.5). A finer depth grid needs a
        # wider band; fail at trace time rather than silently inflating
        # every weight (the closed-form normalizer would be wrong).
        k_needed = 2 * int(np.ceil(16.0 / (4.0 * dd))) + 1
        if self.band_k < min(k_needed, D + 1):
            raise ValueError(
                f"band_k={self.band_k} too narrow for depth bin width "
                f"{dd}: the two-hot clamp radius spans {k_needed} bins")
        weights, bins, floor = banded_two_hot_with_floor(
            metric_depth, self.grid, self.band_k
        )
        dirs, origin = pixel_ray_geometry(
            self.input_size, self.downsample, sensor2ego, cam2img,
            post_rot, post_tran, bda,
        )

        def ranks_at(depth_vals):
            """Voxel ranks of per-pixel ray points at the given bin depths
            (frustum planes sit at the bin LOWER edges d0 + k*dd,
            create_frustum / view_transformer_raw.py:102-106)."""
            coor = (depth_vals[..., None] * dirs[:, :, :, :, None, :]
                    + origin[:, :, None, None, None, :])
            return voxel_ranks(coor, self.grid)[0]

        num_cells = feat.shape[0] * int(np.prod(self.grid.size))
        ranks = ranks_at(bins.astype(jnp.float32) * dd + d0)
        # the overflow bin (index D) is dropped by the reference's
        # dist[..., :D]; route its mass to the overflow cell
        ranks = jnp.where(bins >= D, num_cells, ranks)
        spraying = self.far_spray and self.band_k < D + 1
        if not spraying:
            vox = bev_pool_pallas_banded(
                weights.astype(feat.dtype), feat, ranks, self.grid.size
            )
            return self._ds_pool(vox)
        spray_px = floor >= self.spray_eps  # (B, N, h, w)
        weights = weights - jnp.where(spray_px, floor, 0.0)[..., None]
        all_bins = jnp.arange(D, dtype=jnp.float32)
        shape = metric_depth.shape + (D,)
        ranks_f = ranks_at(jnp.broadcast_to(all_bins * dd + d0, shape))
        ranks_f = jnp.where(spray_px[..., None], ranks_f, num_cells)
        spray_w = jnp.broadcast_to(
            jnp.where(spray_px, floor, 0.0)[..., None], shape
        )
        vox = bev_pool_pallas_banded2(
            weights.astype(feat.dtype), feat, ranks,
            spray_w.astype(feat.dtype), ranks_f, self.grid.size,
            self.spray_cap,
        )
        return self._ds_pool(vox)


def precompute_rig_sorted(cfg, metas, frame: int = 0):
    """Fixed-rig presorted lift streams from standard (B,F,N,...) metas —
    the shared serving/export recipe (view_transformer_raw.py:196-215
    accelerate-mode counterpart). Runs OUTSIDE jit; the returned dict rides
    through jit boundaries as an ordinary argument (`metas["lift_sorted"]`).
    Used by cmd_serve, the streaming exporters, and the sequential
    benchmark — without it the in-graph rank argsort path costs ~4.4 s vs
    ~190 ms per streaming frame on v5e (NOTES.md round-3)."""
    from ..geometry.frustum import sensor2keyego_chain

    F, N = metas["intrins"].shape[1:3]
    s2k = sensor2keyego_chain(
        jnp.reshape(metas["sensor2egos"], (-1, F * N, 4, 4)),
        jnp.reshape(metas["ego2globals"], (-1, F * N, 4, 4)), F, N)
    lift = LSSLift.from_config(cfg)
    return lift.precompute_sorted(
        s2k[:, frame], metas["intrins"][:, frame],
        metas["post_rots"][:, frame], metas["post_trans"][:, frame],
        metas["bda"])
