"""ZMQ remote page-server L3 tier (client + server).

Ref: srt/mem_cache/storage/ — the transfer-engine-backed remote class
(nixl/mooncake transfer backends): KV pages live in another process/host
reachable over a message transport. Here the transport is the same ZMQ
fabric the managers already ride: REQ/REP with multipart frames so page
payloads move zero-copy. Run `ZmqStorageServer` next to spare host RAM
(e.g. on the prefill host) and point --hicache-storage-backend
zmq://tcp://host:port at it.
"""

from __future__ import annotations

import hashlib
import threading
from collections import OrderedDict
from typing import Optional, Tuple

import numpy as np
import zmq


def _key_name(key: Tuple[int, ...]) -> bytes:
    return hashlib.sha1(np.asarray(key, np.int64).tobytes()).digest()


class ZmqStorageTier:
    def __init__(self, addr: str, timeout_ms: int = 30_000):
        self.addr = addr
        self._ctx = zmq.Context.instance()
        self._lock = threading.Lock()
        self._timeout = timeout_ms
        self._sock = None
        self._connect()
        self.num_put = 0
        self.num_hit = 0

    def _connect(self) -> None:
        if self._sock is not None:
            self._sock.close(linger=0)
        self._sock = self._ctx.socket(zmq.REQ)
        self._sock.setsockopt(zmq.RCVTIMEO, self._timeout)
        self._sock.setsockopt(zmq.SNDTIMEO, self._timeout)
        self._sock.setsockopt(zmq.LINGER, 0)
        self._sock.connect(self.addr)

    def put(self, key: Tuple[int, ...], page: np.ndarray) -> None:
        page = np.ascontiguousarray(page)
        meta = (str(page.dtype) + "|" +
                ",".join(map(str, page.shape))).encode()
        with self._lock:
            try:
                self._sock.send_multipart(
                    [b"PUT", _key_name(key), meta, page], copy=False
                )
                self._sock.recv()
            except zmq.ZMQError:
                self._connect()
                raise
        self.num_put += 1

    def get(self, key: Tuple[int, ...]) -> Optional[np.ndarray]:
        with self._lock:
            try:
                self._sock.send_multipart([b"GET", _key_name(key)])
                frames = self._sock.recv_multipart(copy=False)
            except zmq.ZMQError:
                self._connect()
                raise
        if bytes(frames[0].buffer) == b"MISS":
            return None
        dtype_s, shape_s = bytes(frames[1].buffer).decode().split("|")
        arr = np.frombuffer(frames[2].buffer, dtype=np.dtype(dtype_s))
        self.num_hit += 1
        return arr.reshape(tuple(int(s) for s in shape_s.split(",")))


class ZmqStorageServer:
    """LRU-bounded in-RAM page store behind a REP socket."""

    def __init__(self, addr: str = "tcp://127.0.0.1:0",
                 max_bytes: int = 8 << 30):
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REP)
        if addr.endswith(":0"):
            port = self._sock.bind_to_random_port(addr[: addr.rfind(":")])
            self.addr = f"{addr[: addr.rfind(':')]}:{port}"
        else:
            self._sock.bind(addr)
            self.addr = addr
        self.max_bytes = max_bytes
        self._store: "OrderedDict[bytes, Tuple[bytes, bytes]]" = OrderedDict()
        self._bytes = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        poller = zmq.Poller()
        poller.register(self._sock, zmq.POLLIN)
        while not self._stop.is_set():
            if not dict(poller.poll(timeout=100)):
                continue
            frames = self._sock.recv_multipart()
            op = frames[0]
            if op == b"PUT":
                key, meta, payload = frames[1], frames[2], frames[3]
                old = self._store.pop(key, None)
                if old is not None:
                    self._bytes -= len(old[1])
                self._store[key] = (meta, payload)
                self._bytes += len(payload)
                while self._bytes > self.max_bytes and self._store:
                    _, (_, vp) = self._store.popitem(last=False)
                    self._bytes -= len(vp)
                self._sock.send(b"OK")
            elif op == b"GET":
                hit = self._store.get(frames[1])
                if hit is None:
                    self._sock.send_multipart([b"MISS"])
                else:
                    self._store.move_to_end(frames[1])
                    self._sock.send_multipart([b"HIT", hit[0], hit[1]],
                                              copy=False)
            else:
                self._sock.send(b"ERR")

    def shutdown(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        self._sock.close(linger=0)
