"""ctypes binding for the native C++ data plane (veon_tpu/native/depth_proj.cpp).

The reference keeps its only native code on the accelerator (bev_pool CUDA);
on TPU the accelerator op is Pallas, and the native speed win moves to the
HOST data plane instead: LiDAR->camera depth projection (the per-sample
dataloader hot loop, `loading.py:729-835`) and the LSS accelerate-mode voxel
rank precompute (`view_transformer_raw.py:304-332`). Built on demand with
g++ into veon_tpu/native/build/ (gitignored); callers fall back to numpy when
no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "depth_proj.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "build")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.abspath(_SRC)
        if not os.path.exists(src):
            return None
        so = os.path.join(os.path.abspath(_BUILD_DIR), "libveon_native.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                os.makedirs(os.path.dirname(so), exist_ok=True)
                tmp = so + f".tmp{os.getpid()}"
                base = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src]
                try:  # with libjpeg when available (native decode fast path)
                    subprocess.run(base + ["-DVEON_WITH_JPEG", "-ljpeg"],
                                   check=True, capture_output=True, timeout=120)
                except subprocess.SubprocessError:
                    subprocess.run(base, check=True, capture_output=True,
                                   timeout=120)
                os.replace(tmp, so)  # atomic vs concurrent builders
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.SubprocessError):
            return None
        lib.veon_points_to_depth.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.veon_points_to_depth.restype = None
        lib.veon_voxel_ranks.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.veon_voxel_ranks.restype = None
        if hasattr(lib, "veon_decode_jpeg"):
            lib.veon_decode_jpeg.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            lib.veon_decode_jpeg.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    """True when the native library is built and loadable."""
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def points_to_depth_native(
    points: np.ndarray,
    lidar2img: np.ndarray,
    post_rots: np.ndarray,
    post_trans: np.ndarray,
    hw: Tuple[int, int],
    depth_range: Tuple[float, float],
    downsample: int = 1,
) -> Optional[np.ndarray]:
    """All-camera LiDAR depth projection; None when the library is absent.

    Args:
      points: (P, >=3) lidar xyz; lidar2img: (N, 4, 4);
      post_rots: (N, 3, 3); post_trans: (N, 3); hw: full-res (H, W).

    Returns (N, H/ds, W/ds) float32 min-depth maps.
    """
    lib = _load()
    if lib is None:
        return None
    H, W = hw
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    l2i = np.ascontiguousarray(lidar2img, np.float32)
    pr = np.ascontiguousarray(post_rots, np.float32)
    pt = np.ascontiguousarray(post_trans, np.float32)
    N = l2i.shape[0]
    out = np.zeros((N, H // downsample, W // downsample), np.float32)
    lib.veon_points_to_depth(
        _fptr(pts), ctypes.c_int64(pts.shape[0]), _fptr(l2i), _fptr(pr),
        _fptr(pt), N, H, W, downsample,
        ctypes.c_float(depth_range[0]), ctypes.c_float(depth_range[1]),
        _fptr(out),
    )
    return out


def voxel_ranks_native(
    coor: np.ndarray,
    lower_bound: Sequence[float],
    interval: Sequence[float],
    size: Sequence[int],
) -> Optional[np.ndarray]:
    """Host-side voxel rank precompute matching geometry.frustum.voxel_ranks.

    coor: (B, ..., 3) ego xyz; the leading axis is the batch. Valid points get
    rank = b*nvox + flat_voxel; out-of-grid points get B*nvox (the overflow
    cell the pooling op drops).
    """
    lib = _load()
    if lib is None:
        return None
    nx, ny, nz = [int(s) for s in size]
    nvox = nx * ny * nz
    coor = np.ascontiguousarray(coor, np.float32)
    B = coor.shape[0]
    lb = np.ascontiguousarray(lower_bound, np.float32)
    iv = np.ascontiguousarray(interval, np.float32)
    out = np.empty(coor.shape[:-1], np.int32)
    for b in range(B):
        flat = np.ascontiguousarray(coor[b].reshape(-1, 3))
        ranks = np.empty(flat.shape[0], np.int32)
        lib.veon_voxel_ranks(
            _fptr(flat), ctypes.c_int64(flat.shape[0]), _fptr(lb), _fptr(iv),
            nx, ny, nz, 0, ranks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        overflow = ranks == nvox
        ranks += b * nvox
        ranks[overflow] = B * nvox
        out[b] = ranks.reshape(coor.shape[1:-1])
    return out


def decode_jpeg_native(data: bytes) -> Optional[np.ndarray]:
    """Decode a JPEG byte string to an (H, W, 3) RGB uint8 array via the
    native libjpeg path (GIL released for the whole decode; byte-identical
    to PIL's output since PIL wraps the same library with the same default
    IDCT). Returns None when the native library lacks JPEG support or the
    stream is not decodable — callers fall back to PIL."""
    lib = _load()
    if lib is None or not hasattr(lib, "veon_decode_jpeg"):
        return None
    buf = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    if lib.veon_decode_jpeg(buf, len(data), ctypes.byref(h), ctypes.byref(w),
                            None):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.veon_decode_jpeg(
        buf, len(data), ctypes.byref(h), ctypes.byref(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc:
        return None
    return out


_JPEG_PARITY_OK: Optional[bool] = None


def _jpeg_parity_check(data: bytes, native_arr: np.ndarray) -> bool:
    """One-time self-check: the system libjpeg g++ links against may be a
    different implementation than the one Pillow bundles (IJG vs
    libjpeg-turbo differ by +-1 in IDCT rounding on some distros). Verify
    the first decode byte-for-byte against PIL and disable the native path
    for the process if they disagree — inputs must not depend on which
    library happened to build."""
    global _JPEG_PARITY_OK
    if _JPEG_PARITY_OK is None:
        import io

        from PIL import Image

        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        _JPEG_PARITY_OK = (pil.shape == native_arr.shape
                           and bool(np.array_equal(pil, native_arr)))
    return _JPEG_PARITY_OK


def open_image_native(path: str):
    """PIL-compatible image open with the native JPEG fast path: returns a
    PIL Image either way (the aug pipeline operates on PIL ops)."""
    from PIL import Image

    if _JPEG_PARITY_OK is not False and path.lower().endswith((".jpg", ".jpeg")):
        try:
            with open(path, "rb") as f:
                data = f.read()
            arr = decode_jpeg_native(data)
        except OSError:
            arr = None
        if arr is not None and _jpeg_parity_check(data, arr):
            return Image.fromarray(arr)
    return Image.open(path)
