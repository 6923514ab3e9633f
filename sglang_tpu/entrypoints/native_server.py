"""Embedded native HTTP server: ctypes bridge over csrc/http_server.cpp.

Ref: rust/sglang-server — the reference embeds a native (axum) HTTP
server in front of the engine. TPU equivalent: the C++ epoll server
owns accept/parse/keep-alive/writes (and answers /health natively);
registered Python handlers run only for the endpoint body. Non-stream
endpoints only — streaming stays on the aiohttp server
(entrypoints/http_server.py), matching how the reference splits its
embedded server from the full gateway.

Usage:
    srv = NativeServer(port=0)
    srv.route("POST", "/generate", handler)   # handler(body: dict) -> dict
    srv.start()
    ... srv.port ...
    srv.stop()

`serve_engine(engine, port)` wires the standard engine endpoints.
"""

from __future__ import annotations

import ctypes
import json
import logging
import os
import subprocess
from typing import Callable, Dict, Tuple

logger = logging.getLogger(__name__)

_HANDLER_T = ctypes.CFUNCTYPE(
    ctypes.c_void_p,            # char* (malloc'd via hs_alloc)
    ctypes.c_char_p,            # method
    ctypes.c_char_p,            # path
    ctypes.POINTER(ctypes.c_char),  # body
    ctypes.c_long,              # body_len
    ctypes.POINTER(ctypes.c_long),  # out_len
    ctypes.POINTER(ctypes.c_int),   # status
)

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "csrc", "http_server.cpp",
    )
    so = src[:-4] + ".so"
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", so, src],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(so)
    lib.hs_create.restype = ctypes.c_void_p
    lib.hs_create.argtypes = [ctypes.c_int, ctypes.c_int, _HANDLER_T]
    lib.hs_port.restype = ctypes.c_int
    lib.hs_port.argtypes = [ctypes.c_void_p]
    lib.hs_alloc.restype = ctypes.c_void_p
    lib.hs_alloc.argtypes = [ctypes.c_long]
    lib.hs_stop.argtypes = [ctypes.c_void_p]
    lib.hs_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class NativeServer:
    def __init__(self, port: int = 0, n_workers: int = 8):
        self._lib = _load()
        self._routes: Dict[Tuple[str, str], Callable[[dict], dict]] = {}
        self._requested_port = port
        self._n_workers = n_workers
        self._handle = None
        self.port = None
        # keep the callback object alive for the server's lifetime
        self._cb = _HANDLER_T(self._dispatch)

    def route(self, method: str, path: str,
              handler: Callable[[dict], dict]) -> None:
        self._routes[(method.upper(), path)] = handler

    def _reply(self, payload: dict, status: int,
               out_len, status_p) -> int:
        data = json.dumps(payload).encode()
        buf = self._lib.hs_alloc(len(data))
        ctypes.memmove(buf, data, len(data))
        out_len[0] = len(data)
        status_p[0] = status
        return buf

    def _dispatch(self, method, path, body, body_len, out_len, status_p):
        try:
            key = (method.decode().upper(), path.decode().split("?")[0])
            handler = self._routes.get(key)
            if handler is None:
                return self._reply({"error": "not found"}, 404,
                                   out_len, status_p)
            raw = ctypes.string_at(body, body_len) if body_len else b""
            try:
                payload = json.loads(raw) if raw else {}
            except ValueError:
                return self._reply({"error": "invalid JSON"}, 400,
                                   out_len, status_p)
            result = handler(payload)
            return self._reply(result, 200, out_len, status_p)
        except Exception as e:  # noqa: BLE001 - never unwind into C
            logger.exception("native server handler error")
            try:
                return self._reply({"error": str(e)}, 500,
                                   out_len, status_p)
            except Exception:  # noqa: BLE001
                return None

    def start(self) -> int:
        self._handle = self._lib.hs_create(
            self._requested_port, self._n_workers, self._cb
        )
        if not self._handle:
            raise OSError("native server failed to bind")
        self.port = self._lib.hs_port(self._handle)
        logger.info("native HTTP server on 127.0.0.1:%d", self.port)
        return self.port

    def stop(self) -> None:
        if self._handle:
            self._lib.hs_stop(self._handle)
            self._lib.hs_destroy(self._handle)
            self._handle = None


def serve_engine(engine, port: int = 0, n_workers: int = 8) -> NativeServer:
    """Standard engine endpoints on the native server (non-stream)."""
    srv = NativeServer(port=port, n_workers=n_workers)

    def generate(body: dict) -> dict:
        out = engine.generate(
            prompt=body.get("text"),
            input_ids=body.get("input_ids"),
            sampling_params=body.get("sampling_params") or {},
            return_logprob=bool(body.get("return_logprob")),
            rid=body.get("rid"),
        )
        return out if isinstance(out, dict) else {"outputs": out}

    def model_info(body: dict) -> dict:
        cfg = engine.server_args
        return {
            "model_path": cfg.model_path,
            "max_total_tokens": cfg.max_total_tokens,
            "is_generation": True,
        }

    def flush_cache(body: dict) -> dict:
        return {"success": engine.flush_cache()}

    srv.route("POST", "/generate", generate)
    srv.route("GET", "/get_model_info", model_info)
    srv.route("POST", "/flush_cache", flush_cache)
    srv.start()
    return srv
