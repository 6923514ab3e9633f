"""HiCache: hierarchical KV cache with a host-memory tier.

Ref: srt/mem_cache/hiradix_cache.py:76 (HiRadixCache) +
managers/cache_controller.py:230 (HiCacheController). TPU-native shape:

- Device tier = the RadixCache over the paged HBM pool (unchanged).
- Host tier = a byte-exact copy of evicted pages in pinned numpy arrays,
  keyed by the same page-aligned token chunks (write-back on eviction).
- On admission miss in the device tree, the host tree is consulted; hits
  are restored by H2D + a Pallas page-copy kernel into freshly allocated
  pages (full-page DMA — the tile-legal granularity).

The host tree reuses RadixCache with a "host page" allocator whose pages
are rows of a numpy arena [host_pages, L, 2(kv), ps, 2, F/2].
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger(__name__)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _page_copy_kernel(idx_ref, src_hbm, dst_in, dst_out, sems, *, n: int):
    """Copy n pages: dst_out[idx[2i+1]] = src[idx[2i]] (aliased in place)."""

    NSEM = 4

    def cp(i, slot):
        return pltpu.make_async_copy(
            src_hbm.at[idx_ref[2 * i]],
            dst_out.at[idx_ref[2 * i + 1]],
            sems.at[slot],
        )

    def body(i, _):
        slot = jax.lax.rem(i, NSEM)

        @pl.when(i >= NSEM)
        def _():
            cp(i - NSEM, slot).wait()

        cp(i, slot).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0)

    def drain(i, _):
        cp(i, jax.lax.rem(i, NSEM)).wait()
        return 0

    jax.lax.fori_loop(max(n - NSEM, 0), n, drain, 0)


@functools.partial(jax.jit, static_argnames=("n",))
def copy_pages(dst: jax.Array, src: jax.Array, idx_pairs: jax.Array, *, n: int):
    """dst[pairs[2i+1]] = src[pairs[2i]] for i < n; dst aliased in place."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
    )
    return pl.pallas_call(
        functools.partial(_page_copy_kernel, n=n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(dst.shape, dst.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(idx_pairs, src, dst)


class FileStorageTier:
    """L3 KV storage: one file per page under a directory, keyed by the
    sha1 of the page's aligned token prefix. Ref:
    srt/mem_cache/storage/ (file/hf3fs backends) — this is the
    filesystem backend; remote stores slot in behind the same two calls.
    LRU-bounded by byte budget."""

    def __init__(self, directory: str, max_bytes: int = 8 << 30):
        import os
        from collections import OrderedDict

        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.max_bytes = max_bytes
        self.bytes = 0
        self.index: "OrderedDict[str, int]" = OrderedDict()  # name -> size
        self.num_put = 0
        self.num_hit = 0

    @staticmethod
    def _name(key: Tuple[int, ...]) -> str:
        import hashlib

        return hashlib.sha1(
            np.asarray(key, np.int64).tobytes()
        ).hexdigest() + ".npy"

    def put(self, key: Tuple[int, ...], page: np.ndarray) -> None:
        import os

        name = self._name(key)
        path = os.path.join(self.dir, name)
        np.save(path, page)
        size = page.nbytes
        old = self.index.pop(name, None)
        if old is not None:
            self.bytes -= old
        self.index[name] = size
        self.bytes += size
        self.num_put += 1
        while self.bytes > self.max_bytes and self.index:
            victim, vsize = self.index.popitem(last=False)
            self.bytes -= vsize
            try:
                os.remove(os.path.join(self.dir, victim))
            except OSError:
                pass

    def get(self, key: Tuple[int, ...]) -> Optional[np.ndarray]:
        import os

        name = self._name(key)
        if name not in self.index:
            return None
        try:
            page = np.load(os.path.join(self.dir, name))
        except OSError:
            self.index.pop(name, None)
            return None
        self.index.move_to_end(name)
        self.num_hit += 1
        return page


class MmapStorageTier:
    """Arena-file L3 backend (the mmap/shm class of the reference's
    pluggable stores, srt/mem_cache/storage/{mmap,shm}): one preallocated
    file mapped into memory with slot-granular pages and an in-RAM LRU
    index. Point the path at /dev/shm for the shm flavor. Same put/get
    surface as FileStorageTier."""

    def __init__(self, directory: str, max_bytes: int = 8 << 30):
        import os

        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "kv_arena.bin")
        self.max_bytes = max_bytes
        self._mm = None
        self._page_bytes = 0
        self._dtype = None
        self._shape = None
        from collections import OrderedDict

        self.index: "OrderedDict[Tuple[int, ...], int]" = OrderedDict()
        self.free: List[int] = []
        self.num_put = 0
        self.num_hit = 0

    def _ensure(self, page: np.ndarray) -> None:
        if self._mm is not None:
            return
        import mmap as _mmap

        self._page_bytes = page.nbytes
        self._dtype = page.dtype
        self._shape = page.shape
        slots = max(self.max_bytes // self._page_bytes, 4)
        with open(self.path, "wb+") as f:
            f.truncate(slots * self._page_bytes)
            self._mm = _mmap.mmap(f.fileno(), slots * self._page_bytes)
        self.free = list(range(int(slots) - 1, -1, -1))

    def put(self, key: Tuple[int, ...], page: np.ndarray) -> None:
        self._ensure(page)
        slot = self.index.pop(key, None)
        if slot is None:
            if not self.free:
                _, slot = self.index.popitem(last=False)  # LRU
            else:
                slot = self.free.pop()
        off = slot * self._page_bytes
        self._mm[off : off + self._page_bytes] = page.tobytes()
        self.index[key] = slot
        self.num_put += 1

    def get(self, key: Tuple[int, ...]) -> Optional[np.ndarray]:
        slot = self.index.get(key)
        if slot is None:
            return None
        self.index.move_to_end(key)
        self.num_hit += 1
        off = slot * self._page_bytes
        buf = self._mm[off : off + self._page_bytes]
        return np.frombuffer(buf, dtype=self._dtype).reshape(self._shape)


class HostKVTier:
    """Host arena with an exact prefix-keyed page index.

    Each stored page is keyed by the FULL aligned token prefix it ends —
    correct under the device tree's leaf-first eviction order (children
    arrive before their parents) where a radix mirror would not be.
    LRU eviction via ordered dict; evicted pages spill to the L3 storage
    tier when one is attached.
    """

    def __init__(self, num_layers: int, page_shape: Tuple[int, ...],
                 page_size: int, num_host_pages: int, dtype,
                 storage: Optional[FileStorageTier] = None):
        from collections import OrderedDict

        # arena[h, l] = one device page for layer l (pool-native dtype;
        # ml_dtypes makes bf16 numpy arrays first-class)
        self.arena = np.zeros(
            (num_host_pages, num_layers) + page_shape, dtype=np.dtype(dtype)
        )
        self.num_layers = num_layers
        self.page_size = page_size
        self.free: List[int] = list(range(num_host_pages - 1, -1, -1))
        self.index: "OrderedDict[Tuple[int, ...], int]" = OrderedDict()
        self.storage = storage

    def make_room(self, num_pages: int) -> None:
        while len(self.free) < num_pages and self.index:
            key, hp = self.index.popitem(last=False)  # LRU
            if self.storage is not None:
                self.storage.put(key, self.arena[hp])
            self.free.append(hp)

    def put(self, prefix_key: Tuple[int, ...], host_page: int) -> None:
        old = self.index.pop(prefix_key, None)
        if old is not None:
            self.free.append(old)
        self.index[prefix_key] = host_page

    def get(self, prefix_key: Tuple[int, ...]) -> Optional[int]:
        hp = self.index.get(prefix_key)
        if hp is not None:
            self.index.move_to_end(prefix_key)  # LRU touch
        return hp


class HiCacheController:
    """Write-back host tier glue used by the ScheduleCore.

    store_pages: device -> host on device-tree eviction.
    load_prefix: host -> device on admission miss.
    """

    def __init__(self, kv_pool, host_ratio: float = 2.0,
                 max_host_pages: Optional[int] = None,
                 storage_dir: Optional[str] = None,
                 storage_max_bytes: int = 8 << 30,
                 write_policy: str = "write_back",
                 storage_backend: str = "file",
                 enable_prefetch: bool = True):
        import threading

        assert write_policy in ("write_back", "write_through",
                                "write_through_selective"), write_policy
        self.write_policy = write_policy
        self.enable_prefetch = enable_prefetch
        self._lock = threading.Lock()
        self._prefetch_pool = None
        self._prefetch_results: dict = {}  # cache_key -> Future
        self._selective_seen: dict = {}  # prefix key -> touch count
        self.num_prefetch = 0
        self.num_prefetch_hits = 0
        self.kv_pool = kv_pool
        cfg = kv_pool.config
        if cfg.hisparse:
            raise NotImplementedError(
                "HiSparse latent pools already live host-side; HiCache "
                "tiers do not apply"
            )
        self.codec = None
        dtype = cfg.storage_dtype
        if cfg.mla_dim:
            # MLA latent (+ optional DSA index) pools: heterogeneous
            # per-layer components mirror host-side as flat page BYTES
            # (mem/page_codec.py; ref srt/mem_cache/memory_pool_host.py
            # MLA host mirror).
            from sglang_tpu.mem.page_codec import PageCodec

            self.codec = PageCodec(kv_pool)
            page_shape = (self.codec.page_bytes,)
            dtype = np.uint8
        # Host page = both split-pool pages (storage-native layout; for
        # quantized pools that is the int32-packed row form).
        elif cfg.quant and not cfg.quant_native:
            page_shape = (2, cfg.page_size, cfg.folded_dim // 4)
        else:
            page_shape = (2, cfg.page_size, 2, cfg.half_dim)
        n_host = max_host_pages or max(int(cfg.num_pages * host_ratio), 16)
        storage = None
        if storage_dir or "://" in (storage_backend or ""):
            from sglang_tpu.mem.storage import create_storage_backend

            storage = create_storage_backend(
                storage_backend, storage_dir, storage_max_bytes
            )
        self.host = HostKVTier(
            cfg.num_layers, page_shape, cfg.page_size, n_host,
            dtype, storage=storage,
        )
        self._gather = None if self.codec is not None else jax.jit(
            lambda kv, pages: jnp.stack(
                [jnp.stack([kl[pages], vl[pages]], axis=1) for kl, vl in kv],
                axis=1,
            )
        )  # -> [K, L, 2, ps, 2, FH]
        self.num_stored = 0
        self.num_restored = 0

    # ---- device -> host (called right before device pages are freed) ----
    def store_pages(self, full_prefix: List[int], device_pages: List[int]) -> None:
        """full_prefix = tokens [0, L*ps) ending at the evicted node;
        device_pages = the node's pages (the prefix's LAST k pages).
        Idempotent per prefix key (write-through may have stored already)."""
        ps = self.host.page_size
        k = len(device_pages)
        if k == 0:
            return
        L = len(full_prefix) // ps
        start = L - k
        with self._lock:
            todo = [
                j for j in range(k)
                if tuple(full_prefix[: (start + j + 1) * ps])
                not in self.host.index
            ]
            if not todo:
                return
            self.host.make_room(len(todo))
            host_pages = [self.host.free.pop() for _ in todo]
        picked = [device_pages[j] for j in todo]
        if self.codec is not None:
            staged = self.codec.gather_bytes(self.kv_pool.kv, picked)
        else:
            staged = np.asarray(
                self._gather(self.kv_pool.kv, jnp.asarray(picked, jnp.int32))
            )  # [K', L, 2, ps, 2, FH]
        with self._lock:
            self.host.arena[host_pages] = staged
            for hp, j in zip(host_pages, todo):
                key = tuple(full_prefix[: (start + j + 1) * ps])
                self.host.put(key, hp)
            self.num_stored += len(todo)

    def on_insert(self, full_prefix: List[int], device_pages: List[int]) -> None:
        """Write-through hook at radix-insert time (ref
        srt/mem_cache/hiradix_cache.py:76 write policies): pages reach the
        host tier as soon as they are computed (write_through) or on their
        second insert (write_through_selective), instead of waiting for
        device-tree eviction (write_back)."""
        if self.write_policy == "write_back":
            return
        if self.write_policy == "write_through_selective":
            key = tuple(full_prefix)
            with self._lock:
                n = self._selective_seen.get(key, 0) + 1
                self._selective_seen[key] = n
            if n < 2:
                return
        self.store_pages(full_prefix, device_pages)

    # ---- prefetch (host match + stage off the scheduler thread) ----
    def prefetch(self, tokens: List[int]) -> None:
        """Start a background host-tier match + arena staging for a queued
        request (ref hiradix_cache prefetch threads / cache_controller).
        The admission path consumes the staged copy via
        take_prefetch()."""
        if not self.enable_prefetch:
            return
        key = tuple(tokens)
        if key in self._prefetch_results:
            return
        if self._prefetch_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._prefetch_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="hicache-prefetch"
            )
        self.num_prefetch += 1

        def work():
            hlen, hpages = self.match_prefix(list(key))
            if hlen == 0:
                return (0, None)
            with self._lock:
                staged = self.host.arena[hpages].copy()
            return (hlen, staged)

        self._prefetch_results[key] = self._prefetch_pool.submit(work)

    def take_prefetch(self, tokens: List[int]):
        """(hlen, staged[K, L, 2, ps, 2, FH]) if a finished prefetch covers
        these tokens, else None (caller falls back to the sync path)."""
        fut = self._prefetch_results.pop(tuple(tokens), None)
        if fut is None:
            return None
        try:
            hlen, staged = fut.result(timeout=5)
        except Exception:  # noqa: BLE001
            return None
        if hlen == 0:
            return None
        self.num_prefetch_hits += 1
        return hlen, staged

    def load_prefix_staged(self, staged: np.ndarray,
                           device_pages: List[int]) -> None:
        """Copy PRE-STAGED host pages into device pages (prefetch path)."""
        if not len(device_pages):
            return
        K = len(device_pages)
        if self.codec is not None:
            self.kv_pool.swap(self.codec.scatter_bytes(
                self.kv_pool.kv, staged[:K], device_pages))
            self.num_restored += K
            return
        kv = list(self.kv_pool.kv)
        pairs = np.empty(2 * K, np.int32)
        pairs[0::2] = np.arange(K)
        pairs[1::2] = device_pages
        jp = jnp.asarray(pairs)
        for l in range(self.host.num_layers):
            kl = copy_pages(kv[l][0], jnp.asarray(staged[:K, l, 0]), jp, n=K)
            vl = copy_pages(kv[l][1], jnp.asarray(staged[:K, l, 1]), jp, n=K)
            kv[l] = (kl, vl)
        self.kv_pool.swap(tuple(kv))
        self.num_restored += K

    # ---- host -> device ----
    def match_prefix(self, tokens: List[int]):
        """Longest host-tier prefix (L3 storage faulted into the host
        arena on miss): returns (length, host_pages)."""
        ps = self.host.page_size
        pages: List[int] = []
        n = len(tokens) // ps
        with self._lock:
            for i in range(n):
                key = tuple(tokens[: (i + 1) * ps])
                hp = self.host.get(key)
                if hp is None and self.host.storage is not None:
                    page = self.host.storage.get(key)
                    if page is not None:
                        self.host.make_room(1)
                        hp = self.host.free.pop()
                        self.host.arena[hp] = page
                        self.host.put(key, hp)
                if hp is None:
                    break
                pages.append(hp)
        return len(pages) * ps, pages

    def load_prefix(self, host_pages: List[int], device_pages: List[int]) -> None:
        """Copy host pages into freshly allocated device pages."""
        assert len(host_pages) == len(device_pages)
        if not host_pages:
            return
        staged = self.host.arena[host_pages]  # [K, L, 2, ps, 2, FH] | bytes
        K = len(host_pages)
        if self.codec is not None:
            self.kv_pool.swap(self.codec.scatter_bytes(
                self.kv_pool.kv, staged, device_pages))
            self.num_restored += K
            return
        kv = list(self.kv_pool.kv)
        pairs = np.empty(2 * K, np.int32)
        pairs[0::2] = np.arange(K)
        pairs[1::2] = device_pages
        jp = jnp.asarray(pairs)
        for l in range(self.host.num_layers):
            kl = copy_pages(kv[l][0], jnp.asarray(staged[:, l, 0]), jp, n=K)
            vl = copy_pages(kv[l][1], jnp.asarray(staged[:, l, 1]), jp, n=K)
            kv[l] = (kl, vl)
        self.kv_pool.swap(tuple(kv))
        self.num_restored += K
