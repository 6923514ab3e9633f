"""ChunkCache: the no-prefix-sharing cache controller.

Ref: srt/mem_cache/chunk_cache.py — when radix caching is disabled
(--disable-radix-cache, recurrent/hybrid models, or RL rollouts where
weights change between requests) the reference swaps the radix tree for
a ChunkCache that only tracks each in-flight request's own KV chunks
(so chunked prefill keeps its pages between chunks) and frees
everything at finish. Here page ownership already lives on the Req, so
ChunkCache is the interface-compatible null controller: match_prefix
never hits, insert/evict are no-ops, and lock bookkeeping is trivial.
Distinct from RadixCache(disable=True) so cache-policy code can
dispatch on the type, matching the reference's class split.
"""

from __future__ import annotations

from typing import List

from sglang_tpu.core.radix_cache import MatchResult, TreeNode


class ChunkCache:
    disable = True

    def __init__(self, page_size: int, page_allocator, on_evict=None):
        self.page_size = page_size
        self.allocator = page_allocator
        self.on_evict = on_evict
        self.root = TreeNode(None, (), [])
        self.root.lock_ref = 1
        self.evictable_pages = 0
        self.protected_pages = 0

    # ---- RadixCache interface ----
    def match_prefix(self, tokens: List[int]) -> MatchResult:
        return MatchResult([], 0, self.root)

    def insert(self, tokens: List[int], pages: List[int]) -> int:
        return 0  # nothing cached -> caller keeps/frees all pages

    def inc_lock(self, node: TreeNode) -> None:
        pass

    def dec_lock(self, node: TreeNode) -> None:
        pass

    def evict(self, num_pages: int) -> int:
        return 0

    def total_cached_pages(self) -> int:
        return 0

    def reset(self) -> None:
        pass

    def pretty(self) -> str:
        return "ChunkCache(no prefix sharing)"
