"""Host-side page allocator + request-slot pool.

Ref: srt/mem_cache/allocator/{base.py:27,paged.py:105} and
ReqToTokenPool (memory_pool.py:256). Pure host bookkeeping — the device
never sees the free list, only page_table index arrays built per batch.

Page 0 is reserved (its slots absorb padded-token scatter writes).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class PageAllocator:
    def __init__(self, num_pages: int, page_size: int):
        assert num_pages >= 2
        self.num_pages = num_pages
        self.page_size = page_size
        # LIFO free list → recently-freed pages are reused hot.
        self.free_pages: List[int] = list(range(num_pages - 1, 0, -1))

    def available_pages(self) -> int:
        return len(self.free_pages)

    def available_tokens(self) -> int:
        return len(self.free_pages) * self.page_size

    def alloc(self, num_pages: int,
              start_idx: Optional[int] = None) -> Optional[List[int]]:
        if num_pages > len(self.free_pages):
            return None
        if num_pages == 0:
            return []
        out = self.free_pages[-num_pages:]
        del self.free_pages[-num_pages:]
        return out

    def free(self, pages: List[int]) -> None:
        for p in pages:
            assert 0 < p < self.num_pages
        self.free_pages.extend(pages)

    def clear(self) -> None:
        self.free_pages = list(range(self.num_pages - 1, 0, -1))


class DcpPageAllocator(PageAllocator):
    """Owner-aligned allocator for DCP-SHARDED pools (ref
    srt/layers/dcp/{layout,planner}.py interleave layout recast): the
    pool's page dim is GSPMD-sharded over the mesh axis — shard d owns
    global pages [d*NPl, (d+1)*NPl) — and a sequence's i-th page must
    live on shard i % n so each shard's decode attention reads only
    LOCAL pages (xla_backend.forward_decode_dcp). alloc() therefore
    needs the sequence-position start index; free() derives the owner
    from the page id."""

    def __init__(self, num_pages: int, page_size: int, n_shards: int):
        assert num_pages % n_shards == 0, (num_pages, n_shards)
        self.num_pages = num_pages
        self.page_size = page_size
        self.n = n_shards
        self.pages_per_shard = num_pages // n_shards
        self._init_lists()

    def _init_lists(self) -> None:
        NPl = self.pages_per_shard
        # page 0 (trash) lives on shard 0 and is never allocated
        self.owner_free: List[List[int]] = [
            list(range((d + 1) * NPl - 1, (d * NPl - 1) if d else 0, -1))
            for d in range(self.n)
        ]

    @property
    def free_pages(self):  # compat: flat view for diagnostics/invariants
        out: List[int] = []
        for lst in self.owner_free:
            out.extend(lst)
        return out

    @free_pages.setter
    def free_pages(self, v):  # PageAllocator.__init__ compat (unused)
        pass

    def available_pages(self) -> int:
        # conservative: admission must hold for any position alignment
        return min(len(lst) for lst in self.owner_free) * self.n

    def alloc(self, num_pages: int,
              start_idx: Optional[int] = None) -> Optional[List[int]]:
        if num_pages == 0:
            return []
        assert start_idx is not None, (
            "DCP allocator needs the sequence page index"
        )
        need = [0] * self.n
        for i in range(num_pages):
            need[(start_idx + i) % self.n] += 1
        if any(need[d] > len(self.owner_free[d]) for d in range(self.n)):
            return None
        out = []
        for i in range(num_pages):
            out.append(self.owner_free[(start_idx + i) % self.n].pop())
        return out

    def free(self, pages: List[int]) -> None:
        for p in pages:
            assert 0 < p < self.num_pages
            self.owner_free[p // self.pages_per_shard].append(p)

    def clear(self) -> None:
        self._init_lists()


class SwaShadowRegistry:
    """Tree-retained SWA KV for radix reuse (the page-granular analog of
    the reference's SWA tombstones, srt/mem_cache/swa_radix_cache.py).

    When a request releases into the radix tree, the SWA pages covering the
    TRAILING WINDOW of the inserted prefix are handed here, keyed by the
    tree-owned full-pool page id. A later admission whose match point's
    window is fully shadowed can reuse the prefix for sliding layers too;
    anything else clamps to 0 (correct, just uncached). Entries die with
    their full page (freed via the radix allocator shim) or are dropped
    LRU-style under SWA-pool pressure (refcount 0 only — adopted shadows
    are pinned by running requests).
    """

    def __init__(self, swa_allocator: PageAllocator):
        from collections import OrderedDict

        self.swa_allocator = swa_allocator
        self.map: "OrderedDict[int, list]" = OrderedDict()  # full -> [swa, rc]

    def register(self, full_page: int, swa_page: int) -> None:
        old = self.map.pop(full_page, None)
        if old is not None and old[1] == 0 and old[0] != swa_page:
            self.swa_allocator.free([old[0]])
        self.map[full_page] = [swa_page, 0]

    def lookup(self, full_page: int) -> Optional[int]:
        e = self.map.get(full_page)
        return e[0] if e is not None else None

    def adopt(self, full_page: int) -> Optional[int]:
        e = self.map.get(full_page)
        if e is None:
            return None
        e[1] += 1
        self.map.move_to_end(full_page)
        return e[0]

    def release(self, full_page: int) -> None:
        e = self.map.get(full_page)
        if e is not None and e[1] > 0:
            e[1] -= 1

    def on_full_pages_freed(self, pages) -> None:
        for p in pages:
            e = self.map.pop(p, None)
            if e is not None:
                self.swa_allocator.free([e[0]])

    def drop_unreferenced(self, num_pages: int) -> int:
        """Free up to num_pages SWA pages by dropping rc==0 shadows (oldest
        first). Dropping a shadow only disables future reuse."""
        freed = 0
        for full in list(self.map.keys()):
            if freed >= num_pages:
                break
            e = self.map[full]
            if e[1] == 0:
                self.swa_allocator.free([e[0]])
                del self.map[full]
                freed += 1
        return freed

    def clear(self) -> None:
        for e in self.map.values():
            self.swa_allocator.free([e[0]])
        self.map.clear()


class RadixAllocatorShim:
    """Wraps the full-pool allocator handed to the radix tree so that
    freeing a tree page also releases its SWA shadow."""

    def __init__(self, inner: PageAllocator, shadow: SwaShadowRegistry):
        self._inner = inner
        self._shadow = shadow

    def free(self, pages) -> None:
        self._shadow.on_full_pages_freed(pages)
        self._inner.free(pages)

    def __getattr__(self, name):
        return getattr(self._inner, name)


class ReqSlotPool:
    """Stable integer slot per running request (for device-resident state
    such as the next-token buffer used by the overlap schedule)."""

    def __init__(self, size: int):
        self.size = size
        self.free_slots: List[int] = list(range(size - 1, -1, -1))

    def alloc(self) -> Optional[int]:
        return self.free_slots.pop() if self.free_slots else None

    def free(self, slot: int) -> None:
        self.free_slots.append(slot)

    def clear(self) -> None:
        self.free_slots = list(range(self.size - 1, -1, -1))
