"""Binary tensor framing for the serving socket (shared by the python
server/client and the C++ client `veon_tpu/native/serve_client.cpp`).

Little-endian frame:
  u32 magic 0x56454F4E ('VEON')  | u16 version=1 | u16 status
  u32 tensor count
  per tensor: u16 name_len, name utf8, u8 dtype, u8 ndim, u64 dims[ndim],
              raw C-order data
status 0 = ok; nonzero = error, frame carries one tensor named 'error'
(u8 utf-8 message bytes).

This replaces nothing in the reference (its serving story is TRT engines fed
by host code); it is the TPU-first load-and-serve transport around the
StableHLO export artifact (utils/export.py).
"""

from __future__ import annotations

import socket
import struct
from typing import Dict, Tuple

import numpy as np

MAGIC = 0x56454F4E
VERSION = 1

_DTYPES = [
    np.dtype(np.float32), np.dtype(np.float64), np.dtype(np.int32),
    np.dtype(np.int64), np.dtype(np.uint8), None,  # 5 = bfloat16
    np.dtype(np.bool_), np.dtype(np.float16),
]


def _dtype_code(dt) -> int:
    name = getattr(dt, "name", str(dt))
    if name == "bfloat16":
        return 5
    for i, d in enumerate(_DTYPES):
        if d is not None and np.dtype(dt) == d:
            return i
    raise ValueError(f"unsupported dtype {dt}")


def _code_dtype(code: int):
    if code == 5:
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    if 0 <= code < len(_DTYPES) and _DTYPES[code] is not None:
        return _DTYPES[code]
    raise ValueError(f"unsupported dtype code {code}")


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sock.recv_into(view[got:], n - got)
        if r == 0:
            raise ConnectionError("peer closed mid-frame")
        got += r
    return bytes(buf)


def send_frame(sock: socket.socket, tensors: Dict[str, np.ndarray],
               status: int = 0) -> None:
    parts = [struct.pack("<IHHI", MAGIC, VERSION, status, len(tensors))]
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        nb = name.encode("utf-8")
        parts.append(struct.pack("<H", len(nb)))
        parts.append(nb)
        parts.append(struct.pack("<BB", _dtype_code(arr.dtype), arr.ndim))
        parts.append(struct.pack(f"<{arr.ndim}Q", *arr.shape))
        parts.append(arr.tobytes())
    sock.sendall(b"".join(parts))


def recv_frame(sock: socket.socket) -> Tuple[int, Dict[str, np.ndarray]]:
    magic, version, status, count = struct.unpack("<IHHI", _recv_exact(sock, 12))
    if magic != MAGIC:
        raise ConnectionError(f"bad magic {magic:#x}")
    if version != VERSION:
        raise ConnectionError(f"protocol version {version} != {VERSION}")
    out: Dict[str, np.ndarray] = {}
    for _ in range(count):
        (nlen,) = struct.unpack("<H", _recv_exact(sock, 2))
        name = _recv_exact(sock, nlen).decode("utf-8")
        code, ndim = struct.unpack("<BB", _recv_exact(sock, 2))
        dims = struct.unpack(f"<{ndim}Q", _recv_exact(sock, 8 * ndim))
        dt = _code_dtype(code)
        n_bytes = int(np.prod(dims, dtype=np.int64)) * dt.itemsize if ndim else dt.itemsize
        data = _recv_exact(sock, n_bytes)
        out[name] = np.frombuffer(data, dtype=dt).reshape(dims).copy()
    return status, out


def error_frame(sock: socket.socket, msg: str) -> None:
    send_frame(sock, {"error": np.frombuffer(msg.encode(), dtype=np.uint8)},
               status=1)
