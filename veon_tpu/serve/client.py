"""Python client for the serving socket (see protocol.py for the frame)."""

from __future__ import annotations

import socket
from typing import Dict

import numpy as np

from .protocol import recv_frame, send_frame


class TensorClient:
    def __init__(self, socket_path: str, timeout: float = 600.0):
        self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self.sock.settimeout(timeout)
        self.sock.connect(socket_path)

    def infer(self, **tensors: np.ndarray) -> Dict[str, np.ndarray]:
        send_frame(self.sock, {k: np.asarray(v) for k, v in tensors.items()})
        status, out = recv_frame(self.sock)
        if status != 0:
            raise RuntimeError(out.get("error", np.frombuffer(b"?", np.uint8))
                               .tobytes().decode("utf-8", "replace"))
        return out

    def close(self) -> None:
        self.sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
