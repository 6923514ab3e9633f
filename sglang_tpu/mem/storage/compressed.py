"""Zlib-compressed file-per-page L3 tier.

Ref: srt/mem_cache/storage/ — the bandwidth-bound remote-FS backend
class (when L3 sits across a network filesystem, trading CPU for bytes
on the wire wins). KV pages compress well: bf16/fp8 exponent bytes are
highly repetitive across a page. The byte budget counts COMPRESSED
sizes, so the same budget holds more pages than the plain file tier.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from collections import OrderedDict
from typing import Optional, Tuple

import numpy as np


class ZlibStorageTier:
    def __init__(self, directory: str, max_bytes: int = 8 << 30,
                 level: int = 1):
        os.makedirs(directory, exist_ok=True)
        self.dir = directory
        self.max_bytes = max_bytes
        self.level = level
        self.bytes = 0
        self.index: "OrderedDict[str, int]" = OrderedDict()
        self.num_put = 0
        self.num_hit = 0
        self.raw_bytes = 0
        self.compressed_bytes = 0

    @staticmethod
    def _name(key: Tuple[int, ...]) -> str:
        return hashlib.sha1(
            np.asarray(key, np.int64).tobytes()
        ).hexdigest() + ".z"

    def put(self, key: Tuple[int, ...], page: np.ndarray) -> None:
        page = np.ascontiguousarray(page)
        name = self._name(key)
        header = (str(page.dtype) + "|" +
                  ",".join(map(str, page.shape))).encode()
        payload = (len(header).to_bytes(4, "little") + header +
                   zlib.compress(page.tobytes(), self.level))
        path = os.path.join(self.dir, name)
        with open(path, "wb") as f:
            f.write(payload)
        old = self.index.pop(name, None)
        if old is not None:
            self.bytes -= old
        self.index[name] = len(payload)
        self.bytes += len(payload)
        self.raw_bytes += page.nbytes
        self.compressed_bytes += len(payload)
        self.num_put += 1
        while self.bytes > self.max_bytes and self.index:
            victim, vsize = self.index.popitem(last=False)
            self.bytes -= vsize
            try:
                os.remove(os.path.join(self.dir, victim))
            except OSError:
                pass

    def get(self, key: Tuple[int, ...]) -> Optional[np.ndarray]:
        name = self._name(key)
        if name not in self.index:
            return None
        try:
            with open(os.path.join(self.dir, name), "rb") as f:
                payload = f.read()
        except OSError:
            self.index.pop(name, None)
            return None
        hlen = int.from_bytes(payload[:4], "little")
        dtype_s, shape_s = payload[4 : 4 + hlen].decode().split("|")
        raw = zlib.decompress(payload[4 + hlen :])
        self.index.move_to_end(name)
        self.num_hit += 1
        arr = np.frombuffer(raw, dtype=np.dtype(dtype_s))
        return arr.reshape(tuple(int(s) for s in shape_s.split(",")))
