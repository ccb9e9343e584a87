"""Image transforms, normalizers, and augmentation homographies.

Semantics of `mmdet3d/datasets/pipelines/loading.py:1017-1209`
(PrepareImageInputs + the four normalizers) re-expressed as pure functions
over numpy arrays / PIL images. The homography bookkeeping (post_rot /
post_tran) follows `img_transform` (:1119-1137) exactly — the LSS geometry
depends on it bit-for-bit — while image resampling uses PIL bicubic
everywhere (the reference mixes PIL and cv2 kernels; pixel-exact parity
across resamplers is impossible and irrelevant at the fidelity the mIoU
protocol needs, so one consistent kernel is used).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from ..configs.base import DataConfig

# ---------------------------------------------------------------------------
# Normalizers. All take HWC uint8/float RGB (PIL order) and return float32.
# mmcv's imnormalize(to_rgb=True) assumes a BGR input and channel-swaps
# before normalizing; the reference feeds it PIL (RGB) images, so every
# mmcv-based normalizer effectively emits **reversed** channels. That quirk
# is part of the trained checkpoints' input contract and is reproduced here.
# ---------------------------------------------------------------------------

_CLIPSAN_MEAN = np.array([122.7709, 116.7460, 104.0937], np.float32)
_CLIPSAN_STD = np.array([68.5005, 66.6322, 70.3232], np.float32)
_MMLAB_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_MMLAB_STD = np.array([58.395, 57.12, 57.375], np.float32)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# One table drives BOTH the host (numpy) and in-graph (jnp) normalizers so
# the two cannot drift: (divide_by_255, mean, std); every method also flips
# channels ([..., ::-1], the mmcv to_rgb-on-RGB quirk above). References:
# clipsan loading.py:1027-1034, mmlab :1017-1024, midas :1037-1045
# (/255 then (x-0.5)/0.5), depthanythingv2 :1048-1070 (cv2.COLOR_BGR2RGB on
# an already-RGB PIL array — a reversal — then /255 + ImageNet stats;
# the multiple-of-14 lower-bound resize happens separately, dav2_size).
_NORM_TABLE = {
    "clipsan": (False, _CLIPSAN_MEAN, _CLIPSAN_STD),
    "mmlab": (False, _MMLAB_MEAN, _MMLAB_STD),
    "midas": (True, np.float32(0.5), np.float32(0.5)),
    "depthanythingv2": (True, _IMAGENET_MEAN, _IMAGENET_STD),
}


def _normalize(xp, img, method: str):
    div255, mean, std = _NORM_TABLE[method]
    x = xp.asarray(img, xp.float32)[..., ::-1]
    if div255:
        x = x / 255.0
    return (x - mean) / std


def normalize_clipsan(img: np.ndarray) -> np.ndarray:
    return _normalize(np, img, "clipsan")


def normalize_mmlab(img: np.ndarray) -> np.ndarray:
    return _normalize(np, img, "mmlab")


def normalize_midas(img: np.ndarray) -> np.ndarray:
    return _normalize(np, img, "midas")


def normalize_dav2(img: np.ndarray) -> np.ndarray:
    return _normalize(np, img, "depthanythingv2")


NORMALIZERS = {
    "clipsan": normalize_clipsan,
    "mmlab": normalize_mmlab,
    "midas": normalize_midas,
    "depthanythingv2": normalize_dav2,
}


def normalize_in_graph(img, method: str):
    """jnp twin of NORMALIZERS[method] for IN-GRAPH preprocessing (uint8
    serving requests: 4x less transport than pre-normalized f32; XLA fuses
    the arithmetic into the first conv). Same _NORM_TABLE, same fp32
    arithmetic — bit-compatible with the host normalizers by construction."""
    import jax.numpy as jnp

    if method not in _NORM_TABLE:
        raise ValueError(f"unknown normalization method {method!r}")
    return _normalize(jnp, img, method)


def dav2_size(h: int, w: int, target: int = 252) -> Tuple[int, int]:
    """DA-V2 lower-bound keep-aspect resize to a multiple of 14.

    `pipelines/transform_depthanything.py` Resize(resize_method='lower_bound',
    ensure_multiple_of=14, width=height=target): scale so that the SMALLER
    relative side reaches `target`, then round each side to a multiple of 14
    (ceiling if rounding would fall below `target`).
    """

    def constrain(x: float) -> int:
        y = int(np.round(x / 14) * 14)
        if y < target:
            y = int(np.ceil(x / 14) * 14)
        return y

    scale = max(target / h, target / w)
    return constrain(scale * h), constrain(scale * w)


# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------


def quaternion_matrix(q: Sequence[float]) -> np.ndarray:
    """(w, x, y, z) unit quaternion -> 3x3 rotation (pyquaternion layout,
    as consumed by `get_sensor_transforms`, loading.py:1188-1209)."""
    w, x, y, z = [float(v) for v in q]
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0.0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ],
        dtype=np.float64,
    )


def se3(rotation_q: Sequence[float], translation: Sequence[float]) -> np.ndarray:
    """4x4 SE(3) from (w,x,y,z) quaternion + translation."""
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = quaternion_matrix(rotation_q)
    m[:3, 3] = np.asarray(translation, np.float64)
    return m


# ---------------------------------------------------------------------------
# Image-view augmentation (resize / crop / flip / rotate) with homography
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ImageAug:
    """One camera's augmentation parameters (sample_augmentation output,
    loading.py:1160-1186). `resize_dims` is (W', H') like PIL; `crop` is
    (left, top, right, bottom) in the resized image."""

    resize: float
    resize_dims: Tuple[int, int]
    crop: Tuple[int, int, int, int]
    flip: bool
    rotate: float


def _rot2(deg: float) -> np.ndarray:
    h = deg / 180.0 * np.pi
    return np.array([[np.cos(h), np.sin(h)], [-np.sin(h), np.cos(h)]], np.float64)


def aug_homography(aug: ImageAug) -> Tuple[np.ndarray, np.ndarray]:
    """post_rot (3x3) / post_tran (3) for an ImageAug.

    Literal re-derivation of `img_transform` (loading.py:1119-1137): scale,
    crop-shift, optional horizontal flip about the crop width, then rotation
    about the crop center. The third row/col stay identity so the matrices
    compose with (u, v, depth) triples.
    """
    rot = np.eye(2, dtype=np.float64) * aug.resize
    tran = -np.asarray(aug.crop[:2], np.float64)
    if aug.flip:
        A = np.array([[-1.0, 0.0], [0.0, 1.0]])
        b = np.array([aug.crop[2] - aug.crop[0], 0.0])
        rot = A @ rot
        tran = A @ tran + b
    A = _rot2(aug.rotate)
    b = np.array([aug.crop[2] - aug.crop[0], aug.crop[3] - aug.crop[1]]) / 2.0
    b = A @ (-b) + b
    rot = A @ rot
    tran = A @ tran + b
    rot3 = np.eye(3, dtype=np.float32)
    rot3[:2, :2] = rot
    tran3 = np.zeros(3, dtype=np.float32)
    tran3[:2] = tran
    return rot3, tran3


def sample_augmentation(
    data_cfg: DataConfig,
    src_hw: Tuple[int, int],
    is_train: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> ImageAug:
    """Sample one camera's aug (loading.py:1160-1186 sample_augmentation).

    Train: random resize jitter / crop_h / flip / rotate from the config
    ranges; test: deterministic fit of the source to `input_size` with a
    bottom-anchored crop. The VEON configs ship with all ranges zero, so the
    default train aug equals the test aug.
    """
    H, W = src_hw
    fH, fW = data_cfg.input_size
    rng = rng or np.random.default_rng()
    if is_train:
        resize = float(fW) / float(W) + rng.uniform(*data_cfg.resize)
        resize_dims = (int(W * resize), int(H * resize))
        newW, newH = resize_dims
        crop_h = int((1 - rng.uniform(*data_cfg.crop_h)) * newH) - fH
        crop_w = int(rng.uniform(0, max(0, newW - fW)))
        crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
        flip = bool(data_cfg.flip and rng.integers(0, 2))
        rotate = float(rng.uniform(*data_cfg.rot))
    else:
        resize = float(fW) / float(W) + data_cfg.resize_test
        resize_dims = (int(W * resize), int(H * resize))
        newW, newH = resize_dims
        crop_h = int((1 - np.mean(data_cfg.crop_h)) * newH) - fH
        crop_w = int(max(0, newW - fW) / 2)
        crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
        flip = False
        rotate = 0.0
    return ImageAug(resize=resize, resize_dims=resize_dims, crop=crop,
                    flip=flip, rotate=rotate)


def apply_image_aug(img, aug: ImageAug):
    """PIL resize/crop/flip/rotate (img_transform_core, loading.py:1141-1148)."""
    from PIL import Image

    img = img.resize(aug.resize_dims, resample=Image.BICUBIC)
    img = img.crop(aug.crop)
    if aug.flip:
        img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
    if aug.rotate:
        img = img.rotate(aug.rotate)
    return img


# ---------------------------------------------------------------------------
# BEV data augmentation (BDA)
# ---------------------------------------------------------------------------


def bda_matrix(
    rotate_deg: float = 0.0,
    scale: float = 1.0,
    flip_dx: bool = False,
    flip_dy: bool = False,
) -> np.ndarray:
    """3x3 BEV-aug matrix (LoadAnnotationsBEVDepth.bev_transform,
    loading.py:1355-1375): flip @ (scale @ z-rotation), applied to ego
    points as `bda @ x` (get_lidar_coor; our frustum_to_ego does the same).
    The shipping VEON configs disable BDA sampling (rot/scale identity,
    flip probability 0 — configs/veon/...dav2-nodepthcache.py:123-127),
    so the default identity matches training behavior."""
    h = rotate_deg / 180.0 * np.pi
    rot = np.array(
        [[np.cos(h), -np.sin(h), 0.0], [np.sin(h), np.cos(h), 0.0], [0.0, 0.0, 1.0]],
        np.float64,
    )
    m = rot * scale
    if flip_dx:
        m = np.diag([-1.0, 1.0, 1.0]) @ m
    if flip_dy:
        m = np.diag([1.0, -1.0, 1.0]) @ m
    return m.astype(np.float32)


def sample_bda_augmentation(cfg, is_train: bool, rng) -> Tuple[float, float, bool, bool]:
    """Sample (rotate_deg, scale, flip_dx, flip_dy)
    (LoadAnnotationsBEVDepth.sample_bda_augmentation, loading.py:1340-1352):
    uniform rotation/scale inside the configured limits, Bernoulli flips.
    Eval always gets the identity."""
    if not is_train:
        return 0.0, 1.0, False, False
    rotate = float(rng.uniform(*cfg.bda_rot_lim))
    scale = float(rng.uniform(*cfg.bda_scale_lim))
    flip_dx = bool(rng.uniform() < cfg.bda_flip_dx_ratio)
    flip_dy = bool(rng.uniform() < cfg.bda_flip_dy_ratio)
    return rotate, scale, flip_dx, flip_dy


def flip_occ_gt(sample: dict, flip_dx: bool, flip_dy: bool) -> None:
    """Flip the (X, Y, Z) occ GT + masks in place to match a flipped bda
    (loading.py:1411-1420): flip_dx negates ego x -> reverse axis 0,
    flip_dy -> axis 1. Keeps model input (lift through bda) and GT
    voxel-aligned — the grid is symmetric about 0, so cell i maps to
    cell (n-1-i) exactly."""
    for k in ("voxel_semantics", "mask_lidar", "mask_camera"):
        if k not in sample:
            continue
        v = sample[k]
        if flip_dx:
            v = v[::-1, ...]
        if flip_dy:
            v = v[:, ::-1, ...]
        sample[k] = np.ascontiguousarray(v)
