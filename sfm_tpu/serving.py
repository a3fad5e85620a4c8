"""Streaming scan service: the TPU analogue of the reference's iOS
live-camera shell (SURVEY.md §2.8 — "a streaming client API that feeds
frames to a (possibly remote) TPU engine").

A thin length-prefixed TCP protocol (no external deps):

  client -> server:  INIT json {height, width, fx, fy, cx, cy, dist?,
                                config overrides?}
                     FRAME raw float32/uint8 grayscale payload
                     GET_CLOUD / CLOSE
  server -> client:  per-frame metrics json (status, counts, pose, ...)
                     point cloud (xyz f32 + rgb u8) on GET_CLOUD

Messages are [4-byte BE length][1-byte type][payload].  The server owns one
SfMEngine per connection; frames stream through the jitted step on the
device the server runs next to."""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading
from typing import Optional

import numpy as np

MSG_INIT = 1
MSG_FRAME = 2
MSG_METRICS = 3
MSG_GET_CLOUD = 4
MSG_CLOUD = 5
MSG_CLOSE = 6
MSG_ERROR = 7


def _send(sock, msg_type: int, payload: bytes) -> None:
    sock.sendall(struct.pack(">IB", len(payload), msg_type) + payload)


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def _recv(sock):
    head = _recv_exact(sock, 5)
    length, msg_type = struct.unpack(">IB", head)
    return msg_type, _recv_exact(sock, length)


class _ScanHandler(socketserver.BaseRequestHandler):
    def handle(self):
        from .config import SfMConfig
        from .engine import SfMEngine

        eng: Optional[SfMEngine] = None
        shape = None
        try:
            while True:
                msg_type, payload = _recv(self.request)
                if msg_type == MSG_INIT:
                    spec = json.loads(payload.decode())
                    h, w = int(spec["height"]), int(spec["width"])
                    shape = (h, w)
                    overrides = spec.get("config", {})
                    cfg = SfMConfig(image_height=h, image_width=w,
                                    **overrides)
                    K = np.array([[spec["fx"], 0, spec["cx"]],
                                  [0, spec["fy"], spec["cy"]],
                                  [0, 0, 1]], np.float32)
                    eng = SfMEngine(K, (h, w), spec.get("dist"), cfg)
                    _send(self.request, MSG_METRICS,
                          json.dumps({"ready": True}).encode())
                elif msg_type == MSG_FRAME:
                    if eng is None:
                        raise ValueError("FRAME before INIT")
                    frame = np.frombuffer(payload, np.float32).reshape(shape)
                    m = eng.add_frame(frame)
                    out = {k: (v.tolist() if hasattr(v, "tolist") else v)
                           for k, v in m.items()}
                    _send(self.request, MSG_METRICS,
                          json.dumps(out).encode())
                elif msg_type == MSG_GET_CLOUD:
                    pts, cols = eng.get_reconstruction()
                    blob = struct.pack(">I", len(pts)) + \
                        pts.astype("<f4").tobytes() + cols.tobytes()
                    _send(self.request, MSG_CLOUD, blob)
                elif msg_type == MSG_CLOSE:
                    return
        except (ConnectionError, OSError):
            return
        except Exception as e:  # report engine errors to the client
            try:
                _send(self.request, MSG_ERROR, str(e).encode())
            except OSError:
                pass


class ScanServer:
    """Threaded TCP scan service.  ``with ScanServer(port) as s: ...``"""

    def __init__(self, port: int = 0, host: str = "127.0.0.1"):
        self._srv = socketserver.ThreadingTCPServer(
            (host, port), _ScanHandler, bind_and_activate=True)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._srv.shutdown()
        self._srv.server_close()


class ScanClient:
    """Client for ScanServer: the embeddable mobile-app-facing API."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))

    def init(self, height, width, fx, fy, cx, cy, dist=None, config=None):
        spec = dict(height=height, width=width, fx=fx, fy=fy, cx=cx, cy=cy)
        if dist is not None:
            spec["dist"] = list(dist)
        if config:
            spec["config"] = config
        _send(self._sock, MSG_INIT, json.dumps(spec).encode())
        return self._expect(MSG_METRICS)

    def add_frame(self, frame: np.ndarray) -> dict:
        _send(self._sock, MSG_FRAME,
              np.ascontiguousarray(frame, np.float32).tobytes())
        return self._expect(MSG_METRICS)

    def get_cloud(self):
        _send(self._sock, MSG_GET_CLOUD, b"")
        msg_type, payload = _recv(self._sock)
        if msg_type != MSG_CLOUD:
            raise RuntimeError(payload.decode())
        (n,) = struct.unpack(">I", payload[:4])
        xyz = np.frombuffer(payload[4:4 + 12 * n], "<f4").reshape(n, 3)
        rgb = np.frombuffer(payload[4 + 12 * n:4 + 15 * n],
                            np.uint8).reshape(n, 3)
        return xyz.copy(), rgb.copy()

    def close(self):
        try:
            _send(self._sock, MSG_CLOSE, b"")
        finally:
            self._sock.close()

    def _expect(self, want) -> dict:
        msg_type, payload = _recv(self._sock)
        if msg_type == MSG_ERROR:
            raise RuntimeError(payload.decode())
        if msg_type != want:
            raise RuntimeError(f"unexpected message type {msg_type}")
        return json.loads(payload.decode())
