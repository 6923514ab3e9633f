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
                 storage_max_bytes: int = 8 << 30):
        self.kv_pool = kv_pool
        cfg = kv_pool.config
        if cfg.mla_dim:
            raise NotImplementedError(
                "HiCache host tier does not mirror MLA latent pools yet; "
                "run MLA models without --hicache-ratio"
            )
        # Host page = both split-pool pages (storage-native layout; for
        # quantized pools that is the int32-packed row form).
        if cfg.quant:
            page_shape = (2, cfg.page_size, cfg.folded_dim // 4)
        else:
            page_shape = (2, cfg.page_size, 2, cfg.half_dim)
        n_host = max_host_pages or max(int(cfg.num_pages * host_ratio), 16)
        storage = (
            FileStorageTier(storage_dir, storage_max_bytes)
            if storage_dir else None
        )
        self.host = HostKVTier(
            cfg.num_layers, page_shape, cfg.page_size, n_host,
            cfg.storage_dtype, storage=storage,
        )
        self._gather = jax.jit(
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
        device_pages = the node's pages (the prefix's LAST k pages)."""
        ps = self.host.page_size
        k = len(device_pages)
        if k == 0:
            return
        L = len(full_prefix) // ps
        start = L - k
        self.host.make_room(k)
        host_pages = [self.host.free.pop() for _ in range(k)]
        staged = np.asarray(
            self._gather(self.kv_pool.kv, jnp.asarray(device_pages, jnp.int32))
        )  # [K, L, 2, ps, 2, FH]
        self.host.arena[host_pages] = staged
        for j, hp in enumerate(host_pages):
            key = tuple(full_prefix[: (start + j + 1) * ps])
            self.host.put(key, hp)
        self.num_stored += k

    # ---- host -> device ----
    def match_prefix(self, tokens: List[int]):
        """Longest host-tier prefix (L3 storage faulted into the host
        arena on miss): returns (length, host_pages)."""
        ps = self.host.page_size
        pages: List[int] = []
        n = len(tokens) // ps
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
        staged = self.host.arena[host_pages]  # [K, L, 2, ps, 2, FH]
        kv = list(self.kv_pool.kv)
        K = len(host_pages)
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
