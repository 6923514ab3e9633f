"""ctypes wrapper over the native gateway core (csrc/gateway_core.cpp).

Ref: sgl-model-gateway/src/policies/{cache_aware.rs,tree.rs} — the
per-request CPU-hot data plane (radix routing tree, worker registry,
selection policies, circuit breaker) runs native; the async HTTP proxy
stays in sglang_tpu/router.py. Builds on first use, cached next to the
source.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

logger = logging.getLogger(__name__)

POLICIES = {"cache_aware": 0, "round_robin": 1, "random": 2,
            "shortest_queue": 3, "power_of_two": 4,
            "consistent_hashing": 5, "prefix_hash": 6, "bucket": 7,
            "manual": 8}

_LIB = None


def _build_and_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "csrc", "gateway_core.cpp",
    )
    so = src[:-4] + ".so"
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", so, src],
            check=True,
        )
    lib = ctypes.CDLL(so)
    lib.gw_create.restype = ctypes.c_void_p
    lib.gw_create.argtypes = [ctypes.c_long]
    lib.gw_destroy.argtypes = [ctypes.c_void_p]
    lib.gw_add_worker.restype = ctypes.c_int
    lib.gw_add_worker.argtypes = [ctypes.c_void_p]
    lib.gw_remove_worker.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gw_set_health.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.gw_record_failure.restype = ctypes.c_int
    lib.gw_record_failure.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int
    ]
    lib.gw_inc_inflight.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gw_dec_inflight.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gw_inflight.restype = ctypes.c_int
    lib.gw_inflight.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gw_healthy.restype = ctypes.c_int
    lib.gw_healthy.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gw_insert.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int
    ]
    lib.gw_match.restype = ctypes.c_long
    lib.gw_match.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int
    ]
    lib.gw_node_count.restype = ctypes.c_long
    lib.gw_node_count.argtypes = [ctypes.c_void_p]
    lib.gw_last_matched.restype = ctypes.c_long
    lib.gw_last_matched.argtypes = [ctypes.c_void_p]
    lib.gw_pick.restype = ctypes.c_int
    lib.gw_pick.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.gw_pick_key.restype = ctypes.c_int
    lib.gw_pick_key.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
    ]
    lib.gw_add_worker_named.restype = ctypes.c_int
    lib.gw_add_worker_named.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long
    ]
    _LIB = lib
    return lib


class GatewayCore:
    """Worker registry + cache-aware routing tree (native)."""

    def __init__(self, max_nodes: int = 1 << 18):
        self._lib = _build_and_load()
        self._h = ctypes.c_void_p(self._lib.gw_create(max_nodes))

    def __del__(self):
        try:
            self._lib.gw_destroy(self._h)
        except Exception:  # noqa: BLE001
            pass

    def add_worker(self, name: str = "") -> int:
        if name:
            b = name.encode("utf-8", "ignore")
            return self._lib.gw_add_worker_named(self._h, b, len(b))
        return self._lib.gw_add_worker(self._h)

    def remove_worker(self, w: int) -> None:
        self._lib.gw_remove_worker(self._h, w)

    def set_health(self, w: int, healthy: bool) -> None:
        self._lib.gw_set_health(self._h, w, 1 if healthy else 0)

    def record_failure(self, w: int, threshold: int = 3) -> bool:
        return bool(self._lib.gw_record_failure(self._h, w, threshold))

    def inc_inflight(self, w: int) -> None:
        self._lib.gw_inc_inflight(self._h, w)

    def dec_inflight(self, w: int) -> None:
        self._lib.gw_dec_inflight(self._h, w)

    def inflight(self, w: int) -> int:
        return self._lib.gw_inflight(self._h, w)

    def healthy(self, w: int) -> bool:
        return bool(self._lib.gw_healthy(self._h, w))

    def insert(self, text: str, w: int) -> None:
        b = text.encode("utf-8", "ignore")
        self._lib.gw_insert(self._h, b, len(b), w)

    def match(self, text: str, w: int) -> int:
        b = text.encode("utf-8", "ignore")
        return self._lib.gw_match(self._h, b, len(b), w)

    def node_count(self) -> int:
        return self._lib.gw_node_count(self._h)

    def pick(self, text: str, policy: str = "cache_aware",
             imbalance_tol: int = 8, key: str = "") -> int:
        b = (text or "").encode("utf-8", "ignore")
        kb = (key or "").encode("utf-8", "ignore")
        return self._lib.gw_pick_key(
            self._h, b, len(b), POLICIES[policy], imbalance_tol, kb, len(kb)
        )

    def last_matched(self) -> int:
        return self._lib.gw_last_matched(self._h)
