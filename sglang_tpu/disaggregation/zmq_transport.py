"""ZMQ transport for PD disaggregation: real sockets between engines.

Ref: srt/disaggregation/mooncake/conn.py + base/conn.py:97-243 recast —
the KV payload rides a ZMQ PUSH/PULL pair (tcp:// across hosts rides
DCN; ipc:// for colocated engines), and a tiny HTTP bootstrap server on
the decode side answers "where do I push for room X" (ref
BootstrapServer). Payloads are page-granular numpy in the pool-native
dtype — for fp8-quantized pools that is the int32-packed form, so the
wire carries half the bf16 bytes.
"""

from __future__ import annotations

import json
import logging
import pickle
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

from sglang_tpu.disaggregation.base import (
    BootstrapServer,
    ChunkAssembler,
    KVHandoff,
    KVMessage,
    KVReceiver,
    KVSender,
)

logger = logging.getLogger(__name__)


class ZmqKVSender(KVSender):
    """Prefill side: PUSH connected to the decode engine's PULL.

    Flow control: a bounded SNDHWM (messages, each one page-chunk) makes
    send() block when the decode side falls behind instead of queueing
    unbounded KV bytes in the prefill engine's host memory."""

    def __init__(self, addr: str, sndhwm: int = 64):
        import zmq

        self._sock = zmq.Context.instance().socket(zmq.PUSH)
        self._sock.setsockopt(zmq.SNDHWM, sndhwm)
        self._sock.connect(addr)

    def send(self, msg: KVMessage) -> None:
        self._sock.send(pickle.dumps(msg, protocol=5))


class ZmqKVReceiver(KVReceiver):
    """Decode side: PULL bound at `addr`; a drain thread assembles
    incoming chunk streams and files complete handoffs by room."""

    def __init__(self, addr: str):
        import zmq

        self.addr = addr
        self._sock = zmq.Context.instance().socket(zmq.PULL)
        self._sock.bind(addr)
        self._store: Dict[str, KVHandoff] = {}
        self._assembler = ChunkAssembler()
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self) -> None:
        while True:
            try:
                msg: KVMessage = pickle.loads(self._sock.recv())
            except Exception:  # noqa: BLE001 (context terminated)
                return
            with self._lock:
                done = self._assembler.add(msg)
                if done is not None:
                    self._store[done.room] = done

    def poll(self, room: str) -> Optional[KVHandoff]:
        with self._lock:
            return self._store.pop(room, None)

    def poll_any(self) -> Optional[KVHandoff]:
        with self._lock:
            if not self._store:
                return None
            room = next(iter(self._store))
            return self._store.pop(room)


class HttpBootstrapServer(BootstrapServer):
    """Room registry on the decode side (ref disaggregation bootstrap):
    GET /route -> {"addr": <zmq addr>}; prefill engines resolve it once."""

    def __init__(self, kv_addr: str, port: int = 0):
        registry = {"addr": kv_addr}

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                u = urlparse(self.path)
                if u.path == "/route":
                    body = json.dumps(registry).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def log_message(self, *a):  # quiet
                pass

        self._httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self.port = self._httpd.server_port
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def register(self, room: str) -> None:
        pass  # single-route registry; per-room routing is an r3 extension

    def shutdown(self) -> None:
        self._httpd.shutdown()


def resolve_bootstrap(url: str) -> str:
    """Ask a decode engine's bootstrap server for its KV address."""
    from urllib.request import urlopen

    with urlopen(url.rstrip("/") + "/route", timeout=10) as r:
        return json.loads(r.read())["addr"]
