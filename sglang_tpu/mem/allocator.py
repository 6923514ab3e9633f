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

    def alloc(self, num_pages: int) -> Optional[List[int]]:
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
