"""RadixAttention prefix cache: token-radix tree over KV pages.

Ref: srt/mem_cache/radix_cache.py (TreeNode:216, RadixCache:279,
match_prefix:352, insert:412, evict:562). Differences for TPU paging:
the tree is PAGE-granular — every edge key is a token chunk whose length is
a multiple of page_size, each node owns len(key)//page_size KV pages, and
children are keyed by their edge's FIRST PAGE of tokens (a full-page tuple),
so matching is exact with no partial-page ambiguity. Prefix hits are
therefore always page-aligned, which is exactly what the paged Pallas
attention and the page allocator need.

Ownership protocol (host-only, no device work here):
- match_prefix returns shared pages; caller must inc_lock the node while
  the request runs (evict skips locked paths).
- insert(tokens, pages) donates the caller's pages for the UNmatched
  suffix to the tree and returns matched_len (tokens). The caller frees its
  own duplicate pages covering [cached_len, matched_len) plus any trailing
  partial page itself.
"""

from __future__ import annotations

import heapq
import time
from typing import Dict, List, Optional, Tuple


class TreeNode:
    __slots__ = (
        "children",
        "parent",
        "key",
        "pages",
        "lock_ref",
        "last_access",
        "_id",
    )
    _counter = 0

    def __init__(self, parent: Optional["TreeNode"], key: Tuple[int, ...],
                 pages: List[int]):
        self.children: Dict[Tuple[int, ...], TreeNode] = {}
        self.parent = parent
        self.key = key
        self.pages = pages
        self.lock_ref = 0
        self.last_access = time.monotonic()
        TreeNode._counter += 1
        self._id = TreeNode._counter

    def __lt__(self, other: "TreeNode"):
        return self.last_access < other.last_access

    @property
    def is_leaf(self) -> bool:
        return not self.children


class MatchResult:
    __slots__ = ("pages", "length", "node")

    def __init__(self, pages: List[int], length: int, node: TreeNode):
        self.pages = pages
        self.length = length
        self.node = node


class RadixCache:
    def __init__(self, page_size: int, page_allocator, disable: bool = False,
                 on_evict=None):
        self.page_size = page_size
        self.allocator = page_allocator
        self.disable = disable
        self.on_evict = on_evict  # fn(full_prefix_tokens, pages) before free
        self.root = TreeNode(None, (), [])
        self.root.lock_ref = 1  # never evicted
        self.evictable_pages = 0
        self.protected_pages = 0

    def _child_key(self, key: Tuple[int, ...]) -> Tuple[int, ...]:
        return tuple(key[: self.page_size])

    # ---- matching ----
    def match_prefix(self, tokens: List[int]) -> MatchResult:
        if self.disable:
            return MatchResult([], 0, self.root)
        ps = self.page_size
        node = self.root
        pages: List[int] = []
        length = 0
        key = tuple(tokens)
        while len(key) - length >= ps:
            child = node.children.get(self._child_key(key[length:]))
            if child is None:
                break
            m = self._match_len(child.key, key[length:])
            assert m >= ps
            if m < len(child.key):
                child = self._split_node(child, m)
                pages.extend(child.pages)
                length += m
                node = child
                break
            pages.extend(child.pages)
            length += len(child.key)
            node = child
            node.last_access = time.monotonic()
        node.last_access = time.monotonic()
        return MatchResult(pages, length, node)

    def _match_len(self, node_key: Tuple[int, ...], tokens: Tuple[int, ...]) -> int:
        """Longest page-aligned common prefix length (tokens)."""
        ps = self.page_size
        max_pages = min(len(node_key), len(tokens)) // ps
        n = 0
        for p in range(max_pages):
            if node_key[p * ps : (p + 1) * ps] != tokens[p * ps : (p + 1) * ps]:
                break
            n += ps
        return n

    def _split_node(self, node: TreeNode, split_len: int) -> TreeNode:
        """Split node's edge at split_len (page-aligned); returns upper node."""
        ps = self.page_size
        assert split_len % ps == 0 and 0 < split_len < len(node.key)
        upper = TreeNode(node.parent, node.key[:split_len],
                         node.pages[: split_len // ps])
        upper.lock_ref = node.lock_ref
        upper.last_access = node.last_access
        node.parent.children[self._child_key(upper.key)] = upper
        node.key = node.key[split_len:]
        node.pages = node.pages[split_len // ps :]
        node.parent = upper
        upper.children[self._child_key(node.key)] = node
        return upper

    # ---- insertion ----
    def insert(self, tokens: List[int], pages: List[int]) -> int:
        """Insert a page-aligned token sequence backed by `pages`.

        Returns matched_len: the prefix (tokens) that already existed. The
        tree takes ownership of pages[matched_len//ps:]; the caller keeps
        responsibility for pages[:matched_len//ps] (typically shared tree
        pages it matched at admission, plus duplicates it must free).
        """
        if self.disable:
            return 0
        ps = self.page_size
        assert len(tokens) % ps == 0 and len(pages) == len(tokens) // ps
        key = tuple(tokens)
        node = self.root
        length = 0
        while length < len(key):
            child = node.children.get(self._child_key(key[length:]))
            if child is None:
                new_node = TreeNode(node, key[length:], list(pages[length // ps :]))
                node.children[self._child_key(new_node.key)] = new_node
                self.evictable_pages += len(new_node.pages)
                return length
            m = self._match_len(child.key, key[length:])
            if m < len(child.key):
                child = self._split_node(child, m)
            length += m
            node = child
            node.last_access = time.monotonic()
        return length

    # ---- locking ----
    def inc_lock(self, node: TreeNode) -> None:
        while node is not None and node is not self.root:
            if node.lock_ref == 0:
                self.evictable_pages -= len(node.pages)
                self.protected_pages += len(node.pages)
            node.lock_ref += 1
            node = node.parent

    def dec_lock(self, node: TreeNode) -> None:
        while node is not None and node is not self.root:
            node.lock_ref -= 1
            assert node.lock_ref >= 0
            if node.lock_ref == 0:
                self.evictable_pages += len(node.pages)
                self.protected_pages -= len(node.pages)
            node = node.parent

    # ---- eviction ----
    def evict(self, num_pages: int) -> int:
        """Free up to num_pages from unlocked LRU leaves. Returns freed count."""
        if self.disable:
            return 0
        leaves = [n for n in self._iter_nodes() if n.is_leaf and n.lock_ref == 0]
        heapq.heapify(leaves)
        freed = 0
        while leaves and freed < num_pages:
            node = heapq.heappop(leaves)
            if node.lock_ref > 0 or not node.is_leaf:
                continue
            if self.on_evict is not None and node.pages:
                # full prefix tokens from root to this node
                parts = []
                cur = node
                while cur is not None and cur.key:
                    parts.append(cur.key)
                    cur = cur.parent
                full = [t for chunk in reversed(parts) for t in chunk]
                try:
                    self.on_evict(full, list(node.pages))
                except Exception:  # noqa: BLE001
                    import logging

                    logging.getLogger(__name__).warning(
                        "on_evict hook failed", exc_info=True
                    )
            self.allocator.free(node.pages)
            freed += len(node.pages)
            self.evictable_pages -= len(node.pages)
            parent = node.parent
            del parent.children[self._child_key(node.key)]
            if parent is not self.root and parent.is_leaf and parent.lock_ref == 0:
                heapq.heappush(leaves, parent)
        return freed

    def _iter_nodes(self):
        stack = [self.root]
        while stack:
            n = stack.pop()
            if n is not self.root:
                yield n
            stack.extend(n.children.values())

    # ---- stats / debug ----
    def total_cached_pages(self) -> int:
        return self.evictable_pages + self.protected_pages

    def reset(self) -> None:
        for node in self._iter_nodes():
            if node.pages:
                self.allocator.free(node.pages)
        self.root = TreeNode(None, (), [])
        self.root.lock_ref = 1
        self.evictable_pages = 0
        self.protected_pages = 0

    def pretty(self) -> str:
        lines = []

        def rec(node, depth):
            for child in node.children.values():
                lines.append(
                    "  " * depth
                    + f"[{len(child.key)} tok, {len(child.pages)} pg, "
                    f"lock={child.lock_ref}] {list(child.key[:8])}..."
                )
                rec(child, depth + 1)

        rec(self.root, 0)
        return "\n".join(lines)
