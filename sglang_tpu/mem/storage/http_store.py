"""HTTP blob-store L3 tier: S3-compatible object PUT/GET per page.

Ref: srt/mem_cache/storage/ remote-object-store backends (the S3/
aibrix/eic class) — pages become objects under a key prefix, addressed
by content-hash name. Any server speaking plain `PUT /prefix/<name>` /
`GET /prefix/<name>` works (S3 with pre-signed-style paths, MinIO,
nginx+dav, or the toy server in this module for CI). Page payloads
carry an 8-byte dtype/shape header so GET needs no side index.

Connection handling is urllib-based (stdlib-only, zero egress in CI —
tests run the in-repo server on localhost).
"""

from __future__ import annotations

import hashlib
import http.server
import json
import logging
import threading
import urllib.error
import urllib.request
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _key_name(key: Tuple[int, ...]) -> str:
    return hashlib.sha1(np.asarray(key, np.int64).tobytes()).hexdigest()


def _encode(page: np.ndarray) -> bytes:
    page = np.ascontiguousarray(page)
    header = json.dumps(
        {"dtype": str(page.dtype), "shape": list(page.shape)}
    ).encode()
    return len(header).to_bytes(4, "big") + header + page.tobytes()


def _decode(blob: bytes) -> np.ndarray:
    hlen = int.from_bytes(blob[:4], "big")
    meta = json.loads(blob[4:4 + hlen])
    arr = np.frombuffer(blob[4 + hlen:], dtype=np.dtype(meta["dtype"]))
    return arr.reshape(tuple(meta["shape"]))


class HttpStorageTier:
    """`http://host:port/prefix` L3 tier (HostKVTier spill surface)."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.num_put = 0
        self.num_hit = 0

    def _url(self, key: Tuple[int, ...]) -> str:
        return f"{self.base_url}/{_key_name(key)}"

    def put(self, key: Tuple[int, ...], page: np.ndarray) -> None:
        req = urllib.request.Request(
            self._url(key), data=_encode(page), method="PUT",
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            if resp.status not in (200, 201, 204):
                raise OSError(f"PUT {resp.status}")
        self.num_put += 1

    def get(self, key: Tuple[int, ...]) -> Optional[np.ndarray]:
        try:
            with urllib.request.urlopen(
                self._url(key), timeout=self.timeout
            ) as resp:
                blob = resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise
        self.num_hit += 1
        return _decode(blob)


class HttpStorageServer:
    """In-repo object server for CI and single-host deployments
    (the reference ships equivalent mini-servers for its storage CI)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 max_bytes: int = 1 << 30):
        store = {}
        order = []
        total = [0]
        lock = threading.Lock()
        max_b = max_bytes

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_PUT(self):
                n = int(self.headers.get("Content-Length", 0))
                blob = self.rfile.read(n)
                with lock:
                    if self.path not in store:
                        order.append(self.path)
                    else:
                        total[0] -= len(store[self.path])
                    store[self.path] = blob
                    total[0] += len(blob)
                    while total[0] > max_b and order:
                        old = order.pop(0)
                        total[0] -= len(store.pop(old, b""))
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self):
                with lock:
                    blob = store.get(self.path)
                if blob is None:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self.url = f"http://{host}:{self.port}/pages"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        self._store = store

    def shutdown(self):
        self._httpd.shutdown()
        self._httpd.server_close()
