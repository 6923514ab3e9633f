"""Native batched-IO arena storage tier (ctypes over csrc/hicache_io.cpp).

Ref: srt/mem_cache/storage/hf3fs/ — the reference's high-throughput
storage backend issues batched multi-page IO from native code. Here a
slot-granular arena file is driven by a C++ pread/pwrite thread pool;
Python owns only the key->slot LRU index. Supports multi-page batched
put/get (`put_batch`/`get_batch`) that cross the ABI once.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from collections import OrderedDict
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None


def _build_and_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))),
        "csrc", "hicache_io.cpp",
    )
    so = src[:-4] + ".so"
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", so, src,
             "-lpthread"],
            check=True,
        )
    lib = ctypes.CDLL(so)
    lib.hio_open.restype = ctypes.c_void_p
    lib.hio_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
    lib.hio_close.argtypes = [ctypes.c_void_p]
    lib.hio_write.restype = ctypes.c_int64
    lib.hio_write.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.c_int64, ctypes.c_char_p]
    lib.hio_read.restype = ctypes.c_int64
    lib.hio_read.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_int64),
                             ctypes.c_int64, ctypes.c_char_p]
    lib.hio_errors.restype = ctypes.c_int64
    lib.hio_errors.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class NativeIOStorageTier:
    """Same put/get surface as FileStorageTier, plus batched entry points
    that issue one native call for N pages."""

    def __init__(self, directory: str, max_bytes: int = 8 << 30):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "kv_native_arena.bin")
        self.max_bytes = max_bytes
        self.lib = _build_and_load()
        self._h = None
        self._page_bytes = 0
        self._dtype = None
        self._shape = None
        self.index: "OrderedDict[Tuple[int, ...], int]" = OrderedDict()
        self.free: List[int] = []
        self.num_put = 0
        self.num_hit = 0

    def _ensure(self, page: np.ndarray) -> None:
        if self._h is not None:
            return
        self._page_bytes = page.nbytes
        self._dtype = page.dtype
        self._shape = page.shape
        slots = int(max(self.max_bytes // self._page_bytes, 4))
        self._h = self.lib.hio_open(
            self.path.encode(), self._page_bytes, slots
        )
        if not self._h:
            raise OSError(f"hio_open failed for {self.path}")
        self.free = list(range(slots - 1, -1, -1))

    def _slot_for(self, key: Tuple[int, ...]) -> int:
        slot = self.index.pop(key, None)
        if slot is None:
            if not self.free:
                _, slot = self.index.popitem(last=False)  # LRU victim
            else:
                slot = self.free.pop()
        return slot

    # ------------------------------------------------------------- single
    def put(self, key: Tuple[int, ...], page: np.ndarray) -> None:
        self.put_batch([key], [page])

    def get(self, key: Tuple[int, ...]) -> Optional[np.ndarray]:
        out = self.get_batch([key])
        return out[0]

    # ------------------------------------------------------------ batched
    def put_batch(self, keys: List[Tuple[int, ...]],
                  pages: List[np.ndarray]) -> None:
        if not keys:
            return
        self._ensure(pages[0])
        slots = np.empty(len(keys), np.int64)
        for i, key in enumerate(keys):
            slots[i] = self._slot_for(key)
        buf = np.ascontiguousarray(
            np.stack([np.asarray(p) for p in pages])
        ).tobytes()
        ok = self.lib.hio_write(
            self._h, slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(keys), buf,
        )
        if ok != len(keys):
            logger.warning("native IO: %d/%d page writes failed",
                           len(keys) - ok, len(keys))
        for i, key in enumerate(keys):
            self.index[key] = int(slots[i])
        self.num_put += len(keys)

    def get_batch(self, keys: List[Tuple[int, ...]]
                  ) -> List[Optional[np.ndarray]]:
        if self._h is None:
            return [None] * len(keys)
        hit_pos, slots = [], []
        for i, key in enumerate(keys):
            slot = self.index.get(key)
            if slot is not None:
                self.index.move_to_end(key)
                hit_pos.append(i)
                slots.append(slot)
        out: List[Optional[np.ndarray]] = [None] * len(keys)
        if not hit_pos:
            return out
        n = len(hit_pos)
        buf = ctypes.create_string_buffer(n * self._page_bytes)
        sl = np.asarray(slots, np.int64)
        ok = self.lib.hio_read(
            self._h, sl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, buf,
        )
        if ok != n:
            logger.warning("native IO: %d/%d page reads failed", n - ok, n)
        flat = np.frombuffer(buf, dtype=self._dtype)
        per = flat.reshape((n,) + self._shape)
        for j, i in enumerate(hit_pos):
            out[i] = per[j].copy()
        self.num_hit += n
        return out

    def close(self) -> None:
        if self._h is not None:
            self.lib.hio_close(self._h)
            self._h = None
