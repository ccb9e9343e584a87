"""Load-and-serve harness around the StableHLO export artifact.

The reference's deployment story ends at a TRT engine file
(`tools/convert_bevdet_to_TRT.py`); the consuming runtime is left to the
user. Here the runtime exists: a unix-socket tensor server that loads the
serialized inference artifact (utils/export.py — NO model code needed),
binds the fixed arguments (params, rig metas, classifier) once on device,
warms the executable, and answers per-frame requests. Clients: python
(serve/client.py) and dependency-free C++ (native/serve_client.cpp).
"""

from __future__ import annotations

import os
import socket
import threading
import time
from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np

from .protocol import error_frame, recv_frame, send_frame


class TensorServer:
    """Serve `fn(**request_tensors)` over a unix domain socket.

    fn gets numpy/jax arrays keyed by the request's tensor names and must
    return a dict of arrays. One request per connection round; connections
    are persistent (loop until peer closes). Single compute thread — the
    accelerator is serial anyway; acceptors queue on an internal lock.
    """

    def __init__(self, fn: Callable[..., Dict[str, Any]], socket_path: str,
                 required: Sequence[str] = (), exclusive: bool = False):
        """exclusive=True admits ONE connection at a time (later connects
        get an error frame and are closed) — required when fn is STATEFUL
        per-stream, e.g. the temporal serving session whose rolling voxel
        cache a second interleaved client would silently corrupt."""
        self.fn = fn
        self.socket_path = socket_path
        self.required = tuple(required)
        self.exclusive = exclusive
        self._lock = threading.Lock()
        self._active = 0
        self._stop = threading.Event()
        self._threads = []
        self._sock: Optional[socket.socket] = None

    def start(self) -> None:
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(self.socket_path)
        self._sock.listen(8)
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve_conn, args=(conn,),
                                 daemon=True)
            t.start()
            # prune finished connection threads: a long-lived server takes
            # one short connection per client call — keeping every dead
            # Thread object would grow without bound
            self._threads = [x for x in self._threads if x.is_alive()]
            self._threads.append(t)

    def _serve_conn(self, conn: socket.socket) -> None:
        with conn:
            with self._lock:
                if self.exclusive and self._active > 0:
                    try:
                        error_frame(conn, "server busy: exclusive session "
                                          "mode admits one connection")
                    except OSError:
                        pass
                    return
                self._active += 1
            try:
                self._conn_loop(conn)
            finally:
                with self._lock:
                    self._active -= 1

    def _conn_loop(self, conn: socket.socket) -> None:
        while not self._stop.is_set():
            try:
                status, tensors = recv_frame(conn)
            except (ConnectionError, OSError):
                return
            try:
                missing = [k for k in self.required if k not in tensors]
                if status != 0:
                    raise ValueError(f"request status {status}")
                if missing:
                    raise KeyError(f"missing tensors: {missing}")
                with self._lock:  # one in-flight compute at a time
                    t0 = time.perf_counter()
                    out = self.fn(**tensors)
                    out = {k: np.asarray(v) for k, v in out.items()}
                    out["server_ms"] = np.float32(
                        (time.perf_counter() - t0) * 1e3)
                send_frame(conn, out)
            except Exception as e:  # report, keep serving
                try:
                    error_frame(conn, f"{type(e).__name__}: {e}")
                except OSError:
                    return

    def stop(self) -> None:
        self._stop.set()
        if self._sock is not None:
            self._sock.close()
        if os.path.exists(self.socket_path):
            try:
                os.unlink(self.socket_path)
            except OSError:
                pass


def serve_exported(artifact_path: str, socket_path: str,
                   bound: Dict[str, Any], request_keys: Sequence[str],
                   arg_order: Sequence[str],
                   out_names: Optional[Sequence[str]] = None) -> TensorServer:
    """Serve a serialized jax.export artifact.

    bound: name -> array (device-resident fixed args: params pytree leaves
    are NOT supported here — export flattens them, so `bound` carries the
    already-flattened values under their positional names).
    arg_order: names in the exported callable's positional order; each is
    looked up in `bound` or, per request, in the request tensors.
    """
    import jax

    from ..utils.export import load_inference

    call = load_inference(artifact_path)
    bound_dev = {k: jax.device_put(v) for k, v in bound.items()}

    def fn(**req):
        args = [bound_dev[k] if k in bound_dev else req[k] for k in arg_order]
        out = call(*args)
        if isinstance(out, dict):
            return {k: np.asarray(v) for k, v in out.items()}
        if not isinstance(out, (tuple, list)):
            out = (out,)
        names = out_names or [f"out{i}" for i in range(len(out))]
        return {n: np.asarray(v) for n, v in zip(names, out)}

    # no warm-up call here: request tensor shapes are unknown until the
    # first client frame arrives (the exported artifact is shape-frozen, so
    # that first call pays load+bind, not a fresh XLA compile)
    srv = TensorServer(fn, socket_path, required=request_keys)
    srv.start()
    return srv
