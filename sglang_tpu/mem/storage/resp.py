"""RESP (Redis protocol) L3 storage tier + a toy server for CI.

Ref: srt/mem_cache/storage/ — the remote in-memory KV class (mooncake
store / eic / valkey backends). The client speaks RESP2 (SET/GET/DEL/
PING) over a blocking socket, so ANY Redis-compatible server works in
production; this zero-egress image can't install one, so `MiniRespServer`
(a correct-subset RESP server with LRU maxmemory) ships for tests —
start it in-process and point the tier at it.
"""

from __future__ import annotations

import hashlib
import socket
import socketserver
import threading
from collections import OrderedDict
from typing import List, Optional, Tuple

import numpy as np


def _key_name(key: Tuple[int, ...]) -> bytes:
    return hashlib.sha1(np.asarray(key, np.int64).tobytes()).hexdigest().encode()


def _encode_cmd(*parts: bytes) -> bytes:
    out = [b"*%d\r\n" % len(parts)]
    for p in parts:
        out.append(b"$%d\r\n%s\r\n" % (len(p), p))
    return b"".join(out)


class _RespReader:
    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.buf = b""

    def _read_line(self) -> bytes:
        while b"\r\n" not in self.buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("RESP peer closed")
            self.buf += chunk
        line, self.buf = self.buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("RESP peer closed")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def read_reply(self):
        line = self._read_line()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return rest
        if t == b"-":
            raise RuntimeError(f"RESP error: {rest.decode()}")
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            if n < 0:
                return None
            data = self._read_exact(n)
            self._read_exact(2)  # trailing \r\n
            return data
        if t == b"*":
            return [self.read_reply() for _ in range(int(rest))]
        raise RuntimeError(f"bad RESP type byte {t!r}")


class RespStorageTier:
    """put/get over a RESP server. Pages serialize as dtype|shape|raw."""

    def __init__(self, host: str, port: int, max_bytes: int = 8 << 30):
        self.addr = (host, port)
        self.max_bytes = max_bytes  # enforced server-side (maxmemory)
        self._lock = threading.Lock()
        self._sock: Optional[socket.socket] = None
        self._reader: Optional[_RespReader] = None
        self.num_put = 0
        self.num_hit = 0
        self._connect()

    def _connect(self) -> None:
        self._sock = socket.create_connection(self.addr, timeout=30)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._reader = _RespReader(self._sock)
        self._sock.sendall(_encode_cmd(b"PING"))
        assert self._reader.read_reply() == b"PONG"

    def _cmd(self, *parts: bytes):
        with self._lock:
            try:
                self._sock.sendall(_encode_cmd(*parts))
                return self._reader.read_reply()
            except (ConnectionError, OSError):
                self._connect()  # one reconnect attempt
                self._sock.sendall(_encode_cmd(*parts))
                return self._reader.read_reply()

    def put(self, key: Tuple[int, ...], page: np.ndarray) -> None:
        page = np.ascontiguousarray(page)
        header = (str(page.dtype) + "|" +
                  ",".join(map(str, page.shape))).encode()
        val = len(header).to_bytes(4, "little") + header + page.tobytes()
        self._cmd(b"SET", _key_name(key), val)
        self.num_put += 1

    def get(self, key: Tuple[int, ...]) -> Optional[np.ndarray]:
        val = self._cmd(b"GET", _key_name(key))
        if val is None:
            return None
        hlen = int.from_bytes(val[:4], "little")
        dtype_s, shape_s = val[4 : 4 + hlen].decode().split("|")
        arr = np.frombuffer(val[4 + hlen :], dtype=np.dtype(dtype_s))
        self.num_hit += 1
        return arr.reshape(tuple(int(s) for s in shape_s.split(",")))


class MiniRespServer:
    """Correct-subset RESP2 server (PING/SET/GET/DEL/EXISTS/DBSIZE) with
    allkeys-lru maxmemory semantics. CI stand-in for a real Redis."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 max_bytes: int = 1 << 30):
        store: "OrderedDict[bytes, bytes]" = OrderedDict()
        lock = threading.Lock()
        used = [0]

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                reader = _RespReader(self.request)
                while True:
                    try:
                        parts = reader.read_reply()
                    except (ConnectionError, OSError):
                        return
                    if not isinstance(parts, list) or not parts:
                        self.request.sendall(b"-ERR protocol\r\n")
                        continue
                    cmd = parts[0].upper()
                    if cmd == b"PING":
                        self.request.sendall(b"+PONG\r\n")
                    elif cmd == b"SET" and len(parts) >= 3:
                        k, v = parts[1], parts[2]
                        with lock:
                            old = store.pop(k, None)
                            if old is not None:
                                used[0] -= len(old)
                            store[k] = v
                            used[0] += len(v)
                            while used[0] > max_bytes and store:
                                vk, vv = store.popitem(last=False)
                                used[0] -= len(vv)
                        self.request.sendall(b"+OK\r\n")
                    elif cmd == b"GET" and len(parts) >= 2:
                        with lock:
                            v = store.get(parts[1])
                            if v is not None:
                                store.move_to_end(parts[1])
                        if v is None:
                            self.request.sendall(b"$-1\r\n")
                        else:
                            self.request.sendall(
                                b"$%d\r\n%s\r\n" % (len(v), v)
                            )
                    elif cmd == b"DEL":
                        n = 0
                        with lock:
                            for k in parts[1:]:
                                v = store.pop(k, None)
                                if v is not None:
                                    used[0] -= len(v)
                                    n += 1
                        self.request.sendall(b":%d\r\n" % n)
                    elif cmd == b"EXISTS":
                        with lock:
                            n = sum(1 for k in parts[1:] if k in store)
                        self.request.sendall(b":%d\r\n" % n)
                    elif cmd == b"DBSIZE":
                        with lock:
                            n = len(store)
                        self.request.sendall(b":%d\r\n" % n)
                    else:
                        self.request.sendall(b"-ERR unknown command\r\n")

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()
