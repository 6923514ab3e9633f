"""ctypes wrapper over the native C++ radix tree (csrc/radix_tree.cpp).

Ref: srt/mem_cache/radix_cache_cpp.py + cpp_radix_tree/tree_v2_binding.cpp
(pybind there; ctypes here — pybind11 isn't in this image). Drop-in for
core.radix_cache.RadixCache; select with --radix-cache-impl cpp.
Builds the shared library on first import (cached next to the source).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None


def _build_and_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "csrc",
        "radix_tree.cpp",
    )
    so = src.replace(".cpp", ".so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so]
        subprocess.run(cmd, check=True, capture_output=True)
        logger.info("built %s", so)
    lib = ctypes.CDLL(so)
    lib.rt_new.restype = ctypes.c_void_p
    lib.rt_new.argtypes = [ctypes.c_int]
    lib.rt_free.argtypes = [ctypes.c_void_p]
    lib.rt_match.restype = ctypes.c_int64
    lib.rt_match.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.rt_insert.restype = ctypes.c_int64
    lib.rt_insert.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.rt_inc_lock.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rt_dec_lock.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rt_evict.restype = ctypes.c_int64
    lib.rt_evict.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rt_evictable_pages.restype = ctypes.c_int64
    lib.rt_evictable_pages.argtypes = [ctypes.c_void_p]
    lib.rt_protected_pages.restype = ctypes.c_int64
    lib.rt_protected_pages.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class _NodeHandle:
    __slots__ = ("ptr",)

    def __init__(self, ptr):
        self.ptr = ptr


class _MatchResult:
    __slots__ = ("pages", "length", "node")

    def __init__(self, pages, length, node):
        self.pages = pages
        self.length = length
        self.node = node


class CppRadixCache:
    """Same interface as core.radix_cache.RadixCache, native implementation."""

    def __init__(self, page_size: int, page_allocator, disable: bool = False,
                 on_evict=None):
        self.lib = _build_and_load()
        self.page_size = page_size
        self.allocator = page_allocator
        self.disable = disable
        self.on_evict = on_evict
        self.tree = self.lib.rt_new(page_size)
        self.root = _NodeHandle(None)

    def __del__(self):
        try:
            if getattr(self, "tree", None):
                self.lib.rt_free(self.tree)
        except Exception:  # noqa: BLE001
            pass

    @property
    def evictable_pages(self) -> int:
        return self.lib.rt_evictable_pages(self.tree)

    @property
    def protected_pages(self) -> int:
        return self.lib.rt_protected_pages(self.tree)

    def match_prefix(self, tokens: List[int]) -> _MatchResult:
        if self.disable:
            return _MatchResult([], 0, self.root)
        toks = np.asarray(tokens, np.int32)
        out_pages = np.empty(max(len(toks) // self.page_size, 1), np.int32)
        node = ctypes.c_void_p()
        length = self.lib.rt_match(
            self.tree,
            toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(toks),
            out_pages.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.byref(node),
        )
        return _MatchResult(
            out_pages[: length // self.page_size].tolist(),
            int(length),
            _NodeHandle(node),
        )

    def insert(self, tokens: List[int], pages: List[int]) -> int:
        if self.disable:
            return 0
        toks = np.asarray(tokens, np.int32)
        pg = np.asarray(pages, np.int32)
        assert len(toks) % self.page_size == 0
        assert len(pg) == len(toks) // self.page_size
        return int(
            self.lib.rt_insert(
                self.tree,
                toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(toks),
                pg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(pg),
            )
        )

    def inc_lock(self, node: _NodeHandle) -> None:
        if node.ptr is not None:
            self.lib.rt_inc_lock(self.tree, node.ptr)

    def dec_lock(self, node: _NodeHandle) -> None:
        if node.ptr is not None:
            self.lib.rt_dec_lock(self.tree, node.ptr)

    def evict(self, num_pages: int) -> int:
        if self.disable:
            return 0
        cap = num_pages + 4096
        out_pages = np.empty(cap, np.int32)
        want_prefix = self.on_evict is not None
        prefix_cap = 1 << 20 if want_prefix else 0
        prefixes = np.empty(max(prefix_cap, 1), np.int32)
        plen = ctypes.c_int64(0)
        freed = self.lib.rt_evict(
            self.tree,
            num_pages,
            out_pages.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            prefixes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            if want_prefix
            else None,
            prefix_cap,
            ctypes.byref(plen),
        )
        pages = out_pages[:freed].tolist()
        if want_prefix:
            # decode (len, tokens...) records; pages come out in the same
            # node order so re-slice them per record
            i = 0
            off = 0
            while i < plen.value:
                n = int(prefixes[i])
                full = prefixes[i + 1 : i + 1 + n].tolist()
                k = n // self.page_size
                node_pages = pages[off : off + k]
                try:
                    self.on_evict(full, node_pages)
                except Exception:  # noqa: BLE001
                    logger.warning("on_evict hook failed", exc_info=True)
                off += k
                i += 1 + n
        self.allocator.free(pages)
        return freed

    def total_cached_pages(self) -> int:
        return self.evictable_pages + self.protected_pages

    def reset(self) -> None:
        # free everything by evicting all
        total = self.total_cached_pages()
        if total:
            self.evict(total)
        self.lib.rt_free(self.tree)
        self.tree = self.lib.rt_new(self.page_size)
