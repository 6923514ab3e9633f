"""Pluggable L3 KV storage backends behind one put/get surface.

Behavioral reference: srt/mem_cache/storage/backend_factory.py — the
reference registers ~12 backends (file, hf3fs, mooncake, nixl, lmcache,
aibrix, eic, dynamic, ...) resolved by name from --hicache-storage-backend.
This image has zero egress and no vendor SDKs, so the factory carries the
backend CLASSES the reference's set reduces to:

  file       one file per page (srt .../file)            [mem/hicache.py]
  mmap       arena file mapped into RAM; /dev/shm = shm  [mem/hicache.py]
  native     C++ batched pread/pwrite arena off the GIL (the hf3fs usrbio
             analog, csrc/hicache_io.cpp)
  sqlite     single-file transactional blob store (the embedded-DB class)
  zlib       compressed file-per-page (bandwidth-bound remote-FS class)
  resp://    Redis-protocol client over TCP (the remote in-memory class:
             mooncake/eic); any RESP server works, a toy one ships for CI
  zmq://     ZMQ REQ/REP remote page server (the nixl/transfer-engine
             class), server included
  http://    S3-compatible object PUT/GET per page (the remote object-
             store class: s3/aibrix/eic), toy server included

Every backend exposes `put(key, page)` / `get(key) -> page | None` with
LRU-bounded capacity, matching the HostKVTier spill interface.
"""

from __future__ import annotations

from typing import Optional

BACKENDS = ("file", "mmap", "native", "sqlite", "zlib", "resp", "zmq",
            "http")


def create_storage_backend(backend: str, directory: Optional[str],
                           max_bytes: int = 8 << 30):
    """Resolve a --hicache-storage-backend value to a tier instance.
    URL-style backends encode the endpoint after '://'."""
    if backend.startswith("resp://"):
        from sglang_tpu.mem.storage.resp import RespStorageTier

        host, _, port = backend[7:].partition(":")
        return RespStorageTier(host, int(port or 6379), max_bytes)
    if backend.startswith("zmq://"):
        from sglang_tpu.mem.storage.zmq_store import ZmqStorageTier

        return ZmqStorageTier(backend[6:])
    if backend == "file":
        from sglang_tpu.mem.hicache import FileStorageTier

        return FileStorageTier(directory, max_bytes)
    if backend == "mmap":
        from sglang_tpu.mem.hicache import MmapStorageTier

        return MmapStorageTier(directory, max_bytes)
    if backend == "native":
        from sglang_tpu.mem.storage.native_io import NativeIOStorageTier

        return NativeIOStorageTier(directory, max_bytes)
    if backend == "sqlite":
        from sglang_tpu.mem.storage.sqlite_store import SqliteStorageTier

        return SqliteStorageTier(directory, max_bytes)
    if backend == "zlib":
        from sglang_tpu.mem.storage.compressed import ZlibStorageTier

        return ZlibStorageTier(directory, max_bytes)
    if backend.startswith("http://") or backend.startswith("https://"):
        from sglang_tpu.mem.storage.http_store import HttpStorageTier

        return HttpStorageTier(backend)
    raise ValueError(
        f"unknown hicache storage backend {backend!r}; known: {BACKENDS}"
    )
