"""Visualization helpers (`mmdet3d/utils/vis.py` + the BEV rendering of
`nuscenes_dataset_occ.py:88-108`): depth colormaps, camera grids, and
BEV/voxel occupancy images. PIL/numpy only — no GUI dependencies."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# Occ3D-nuScenes display palette, one RGB per class (free = transparent/black)
OCC_PALETTE = np.array(
    [
        [0, 0, 0],        # others
        [255, 120, 50],   # barrier
        [255, 192, 203],  # bicycle
        [255, 255, 0],    # bus
        [0, 150, 245],    # car
        [0, 255, 255],    # construction_vehicle
        [255, 127, 0],    # motorcycle
        [255, 0, 0],      # pedestrian
        [255, 240, 150],  # traffic_cone
        [135, 60, 0],     # trailer
        [160, 32, 240],   # truck
        [255, 0, 255],    # driveable_surface
        [139, 137, 137],  # other_flat
        [75, 0, 75],      # sidewalk
        [150, 240, 80],   # terrain
        [230, 230, 250],  # manmade
        [0, 175, 0],      # vegetation
        [255, 255, 255],  # free
    ],
    dtype=np.uint8,
)


def colorize_depth(depth: np.ndarray, d_min: Optional[float] = None,
                   d_max: Optional[float] = None) -> np.ndarray:
    """(H, W) metric depth -> (H, W, 3) uint8 turbo-ish colormap."""
    d = np.asarray(depth, dtype=np.float64)
    d_min = float(np.nanmin(d)) if d_min is None else d_min
    d_max = float(np.nanmax(d)) if d_max is None else d_max
    t = np.clip((d - d_min) / max(d_max - d_min, 1e-9), 0, 1)
    # simple 4-stop gradient: dark blue -> cyan -> yellow -> red
    stops = np.array([[0, 0, 128], [0, 255, 255], [255, 255, 0], [255, 0, 0]],
                     dtype=np.float64)
    idx = np.clip(t * 3, 0, 3 - 1e-9)
    lo = idx.astype(int)
    frac = (idx - lo)[..., None]
    rgb = stops[lo] * (1 - frac) + stops[lo + 1] * frac
    return rgb.astype(np.uint8)


def vis_occ_bev(occ: np.ndarray, free_idx: int = 17) -> np.ndarray:
    """(X, Y, Z) class grid -> (Y, X, 3) BEV image: per column, the highest
    non-free voxel's class (the reference's BEV rendering convention)."""
    occ = np.asarray(occ)
    X, Y, Z = occ.shape
    nonfree = occ != free_idx
    # index of the topmost occupied voxel per (x, y); free where none
    top = Z - 1 - np.argmax(nonfree[..., ::-1], axis=-1)
    any_occ = nonfree.any(axis=-1)
    cls = np.where(any_occ, np.take_along_axis(occ, top[..., None], axis=-1)[..., 0],
                   free_idx)
    img = OCC_PALETTE[np.clip(cls, 0, len(OCC_PALETTE) - 1)]
    return np.transpose(img, (1, 0, 2))  # (Y, X, 3)


def vis_occ_height_slices(occ: np.ndarray, free_idx: int = 17) -> np.ndarray:
    """(X, Y, Z) class grid -> horizontal strip of per-height BEV slices."""
    occ = np.asarray(occ)
    X, Y, Z = occ.shape
    slices = [OCC_PALETTE[np.clip(occ[:, :, z], 0, len(OCC_PALETTE) - 1)].transpose(1, 0, 2)
              for z in range(Z)]
    return np.concatenate(slices, axis=1)


def camera_grid(images: Sequence[np.ndarray], cols: int = 3) -> np.ndarray:
    """Stack (H, W, 3) uint8 camera images into a rows x cols grid."""
    imgs = [np.asarray(im) for im in images]
    H, W = imgs[0].shape[:2]
    rows = (len(imgs) + cols - 1) // cols
    canvas = np.zeros((rows * H, cols * W, 3), dtype=np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        canvas[r * H:(r + 1) * H, c * W:(c + 1) * W] = im[..., :3]
    return canvas


def denormalize_clipsan(img: np.ndarray) -> np.ndarray:
    """Invert data.transforms.normalize_clipsan back to RGB uint8."""
    mean = np.array([122.7709, 116.7460, 104.0937], np.float32)
    std = np.array([68.5005, 66.6322, 70.3232], np.float32)
    x = np.asarray(img, np.float32) * std + mean
    return np.clip(x[..., ::-1], 0, 255).astype(np.uint8)  # undo channel swap


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(img)).save(path)
