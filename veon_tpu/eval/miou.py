"""Occ3D-nuScenes mIoU (`mmdet3d/datasets/occ_metrics.py:52-147` Metric_mIoU).

18x18 confusion histogram over (camera-)masked voxels; per-class IoU =
diag / (row + col - diag); mean over the 17 non-free classes. The histogram
accumulation is a jit-able bincount so per-sample updates can run on device;
the final reduction happens on host.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

OCC3D_CLASS_NAMES = [
    "others", "barrier", "bicycle", "bus", "car", "construction_vehicle",
    "motorcycle", "pedestrian", "traffic_cone", "trailer", "truck",
    "driveable_surface", "other_flat", "sidewalk", "terrain", "manmade",
    "vegetation", "free",
]


def confusion_hist(
    pred: jnp.ndarray, gt: jnp.ndarray, mask: Optional[jnp.ndarray],
    num_classes: int = 18,
) -> jnp.ndarray:
    """(num_classes, num_classes) confusion counts over masked voxels.

    gt values outside [0, num_classes) (e.g. 255) are excluded, matching
    `hist_info` (occ_metrics.py:77-103).
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes)
    if mask is not None:
        valid = valid & (mask.reshape(-1) != 0)
    idx = jnp.where(valid, gt * num_classes + jnp.clip(pred, 0, num_classes - 1), num_classes * num_classes)
    hist = jnp.zeros(num_classes * num_classes + 1, jnp.int32).at[idx].add(1)
    return hist[:-1].reshape(num_classes, num_classes)


def per_class_iou(hist: np.ndarray) -> np.ndarray:
    diag = np.diag(hist).astype(np.float64)
    denom = hist.sum(1) + hist.sum(0) - np.diag(hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        return diag / denom


class MIoUMetric:
    """Streaming mIoU accumulator (Metric_mIoU.add_batch/count_miou)."""

    def __init__(self, num_classes: int = 18, use_image_mask: bool = True,
                 use_lidar_mask: bool = False):
        self.num_classes = num_classes
        self.use_image_mask = use_image_mask
        self.use_lidar_mask = use_lidar_mask
        self.hist = np.zeros((num_classes, num_classes), np.int64)
        self.cnt = 0

    def add_batch(self, pred, gt, mask_lidar=None, mask_camera=None):
        """Host-side numpy bincount. The jit-able `confusion_hist` exists for
        accumulating ON the device that produced the grids (distributed eval
        merges); routing this per-sample update through jax's default device
        instead costs a full H2D+D2H round-trip per frame — measured 1.21 s
        vs ~30 ms on the tunneled-TPU backend (NOTES round 4, eval_bench)."""
        nc = self.num_classes
        pred = np.asarray(pred).reshape(-1).astype(np.int64)
        gt = np.asarray(gt).reshape(-1).astype(np.int64)
        valid = (gt >= 0) & (gt < nc)
        if self.use_image_mask and mask_camera is not None:
            valid &= np.asarray(mask_camera).reshape(-1) != 0
        elif self.use_lidar_mask and mask_lidar is not None:
            valid &= np.asarray(mask_lidar).reshape(-1) != 0
        idx = gt[valid] * nc + np.clip(pred[valid], 0, nc - 1)
        self.hist += np.bincount(idx, minlength=nc * nc).reshape(nc, nc)
        self.cnt += 1

    def count_miou(self) -> Tuple[List[str], np.ndarray, float]:
        iou = per_class_iou(self.hist)
        miou = float(np.nanmean(iou[: self.num_classes - 1]) * 100)
        print(f"===> per class IoU of {self.cnt} samples:")
        for i in range(self.num_classes - 1):
            print(f"===> {OCC3D_CLASS_NAMES[i]} - IoU = {round(iou[i] * 100, 2)}")
        print(f"===> mIoU of {self.cnt} samples: {round(miou, 2)}")
        return OCC3D_CLASS_NAMES, iou, miou
