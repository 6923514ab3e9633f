"""Global cross-request n-gram corpus (C++ suffix automaton via ctypes).

Ref: srt/speculative/ngram_worker.py + kernels/jit/csrc/ngram_corpus/
(the SURVEY §2.10 native obligation). The native side (csrc/
ngram_corpus.cpp) keeps ONE suffix automaton over everything the server
has generated; `propose` first tries the request's own history (most
recent match — the strongest signal) and falls back to the global corpus
(continuation after a recorded occurrence). Finished requests are
inserted so later requests draft from them — the big win on workloads
with cross-request structure (agent loops, few-shot prompts, RAG).

Builds the shared library on first use (cached next to the source);
falls back to self-history-only drafting if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Sequence

import numpy as np

from sglang_tpu.speculative.ngram import NgramDrafter

logger = logging.getLogger(__name__)

_LIB = None


def _build_and_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "csrc",
        "ngram_corpus.cpp",
    )
    so = src.replace(".cpp", ".so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so]
        subprocess.run(cmd, check=True, capture_output=True)
        logger.info("built %s", so)
    lib = ctypes.CDLL(so)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ng_new.restype = ctypes.c_void_p
    lib.ng_new.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.ng_free.argtypes = [ctypes.c_void_p]
    lib.ng_insert.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int64]
    lib.ng_match.restype = ctypes.c_int64
    lib.ng_match.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int64, i32p,
                             ctypes.c_int64]
    lib.ng_reset.argtypes = [ctypes.c_void_p]
    for f in ("ng_num_tokens", "ng_num_seqs", "ng_num_rebuilds"):
        getattr(lib, f).restype = ctypes.c_int64
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class NgramCorpusDrafter(NgramDrafter):
    """Self-history drafter + global-corpus fallback.

    Drop-in for NgramDrafter (same propose signature) with two additions:
    `observe(token_ids)` feeds a finished sequence into the corpus, and
    `stats()` reports corpus occupancy for /metrics.
    """

    def __init__(self, capacity: int = 1 << 22, **kw):
        super().__init__(**kw)
        self._lib = None
        self._h = None
        try:
            self._lib = _build_and_load()
            self._h = self._lib.ng_new(
                capacity, self.max_ngram, self.min_ngram
            )
        except Exception as e:  # no toolchain: degrade gracefully
            logger.warning("ngram corpus unavailable (%s); "
                           "self-history drafting only", e)
        self._out = np.zeros(64, np.int32)

    def __del__(self):
        if self._h is not None and self._lib is not None:
            self._lib.ng_free(self._h)
            self._h = None

    def observe(self, token_ids: Sequence[int]) -> None:
        if self._h is None or not token_ids:
            return
        arr = np.asarray(token_ids, np.int32)
        self._lib.ng_insert(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
        )

    def propose(self, token_ids: Sequence[int]) -> List[int]:
        drafts = super().propose(token_ids)
        if drafts or self._h is None:
            return drafts
        n = min(len(token_ids), self.max_ngram)
        if n < self.min_ngram:
            return []
        q = np.asarray(token_ids[-n:], np.int32)
        k = self._lib.ng_match(
            self._h, q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(q),
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            min(self.num_draft_tokens, len(self._out)),
        )
        return self._out[:k].tolist()

    def reset(self) -> None:
        if self._h is not None:
            self._lib.ng_reset(self._h)

    def stats(self) -> dict:
        if self._h is None:
            return {"available": False}
        return {
            "available": True,
            "corpus_tokens": int(self._lib.ng_num_tokens(self._h)),
            "corpus_seqs": int(self._lib.ng_num_seqs(self._h)),
            "corpus_rebuilds": int(self._lib.ng_num_rebuilds(self._h)),
        }
