"""Recurrent-state checkpoints: the mamba/hybrid radix cache.

Ref behavior: srt/mem_cache/mamba_radix_cache.py:440 (mamba_value per
TreeNode + separate mamba LRU). TPU-native recast:

- Checkpoint STORAGE is extra rows appended to the state pools themselves
  (state arrays become [S + 1 + n_ckpt, ...]; rows S+1.. are checkpoint
  rows — ModelRunner._init_kv_pool). save/restore are donated on-device
  row copies (ModelRunner.copy_state), so a prefix hit never moves state
  through the host.
- Each checkpoint anchors to a RadixCache TreeNode: `aligned` is the
  page-aligned prefix length ending at that node (the attention-layer KV
  pages live in the tree as usual), `length` is the EXACT token position of
  the state (states are not page-addressable, so length is unaligned).
  Tokens [aligned, length) live in a privately-owned `tail_page` whose used
  rows are COPIED into a fresh page on adoption (copy-on-adopt keeps
  checkpoint pages immutable). Anchored nodes are radix-LOCKED
  (inc_lock) so their attention pages cannot be evicted under the
  checkpoint; release_lru() is the scheduler's memory-pressure valve.
- Reuse for a recurrent model is legal ONLY at a checkpoint: lookup()
  walks the matched node's ancestor chain for the deepest entry whose
  exact position fits the new request, verifying the unaligned tail
  tokens.
- LRU eviction when slots run out (OrderedDict order, last = MRU).
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import List, Optional, Tuple


@dataclasses.dataclass
class CkptEntry:
    node: object  # radix TreeNode the aligned prefix ends at (locked)
    slot: int  # checkpoint slot id (0-based; device row = S + 1 + slot)
    aligned: int  # page-aligned prefix length at `node` (tokens)
    length: int  # exact token position of the stored state
    tail_page: Optional[int]  # page holding tokens [aligned, length)
    tail_tokens: Tuple[int, ...]  # the unaligned tail token ids


def _node_end(node) -> int:
    """Token length of the prefix ending at `node` (sum of edge keys)."""
    end = 0
    n = node
    while n is not None and getattr(n, "parent", None) is not None:
        end += len(n.key)
        n = n.parent
    return end


class StateCheckpointRegistry:
    """Host-side bookkeeping for recurrent-state checkpoints.

    The runner provides the device ops (copy_state row copies and, for
    hybrid models, copy_kv_page attention-page copies); the radix cache
    provides node locking. All methods are host-cheap; device copies are
    enqueued on the jit stream (ordered after the forward that produced
    the state — the scheduler flushes saves right after dispatch).
    """

    def __init__(self, n_slots: int, runner, radix, allocator):
        self.n_slots = n_slots
        self.runner = runner
        self.radix = radix
        self.allocator = allocator
        # Hybrid models carry real attention KV in the pages; pure
        # recurrent models use pages as bookkeeping only (no copies).
        self.has_attn_pages = bool(getattr(runner, "state_pool_hybrid", False))
        self.free: List[int] = list(range(n_slots))
        # node id -> entry; OrderedDict doubles as the LRU (last = MRU).
        self.by_node: "OrderedDict[int, CkptEntry]" = OrderedDict()
        self.hits = 0
        self.saves = 0

    def device_row(self, slot: int) -> int:
        """Checkpoint slot -> state-array row index (after the trash row)."""
        return self.runner.num_slots + 1 + slot

    # ---- save ----
    def save(
        self,
        node,
        req_slot: int,
        aligned: int,
        length: int,
        tail_tokens: Tuple[int, ...],
        tail_src_page: Optional[int],
    ) -> bool:
        """Snapshot req_slot's state into a checkpoint slot anchored at
        `node`. For hybrid models the unaligned tail rows are preserved by
        copying tail_src_page into a checkpoint-owned page. Returns False
        if skipped (an at-least-as-deep checkpoint already anchors here,
        or no page for the tail copy)."""
        old = self.by_node.get(id(node))
        if old is not None:
            if old.length >= length:
                return False  # existing checkpoint is at least as deep
            self._release(old)
        if not self.free:
            victim_key = next(iter(self.by_node))
            self._release(self.by_node[victim_key])
        tail_page = None
        if (
            self.has_attn_pages
            and length > aligned
            and tail_src_page is not None
        ):
            got = self.allocator.alloc(1)
            if got is None:
                return False
            tail_page = got[0]
            self.runner.copy_kv_page(tail_src_page, tail_page)
        slot = self.free.pop()
        self.runner.copy_state(req_slot, self.device_row(slot))
        self.radix.inc_lock(node)
        self.by_node[id(node)] = CkptEntry(
            node, slot, aligned, length, tail_page, tuple(tail_tokens)
        )
        self.saves += 1
        return True

    def _release(self, entry: CkptEntry) -> None:
        self.by_node.pop(id(entry.node), None)
        self.free.append(entry.slot)
        self.radix.dec_lock(entry.node)
        if entry.tail_page is not None:
            self.allocator.free([entry.tail_page])
            entry.tail_page = None

    # ---- lookup / restore ----
    def lookup(self, mr, tokens, max_len: int) -> Optional[CkptEntry]:
        """Deepest usable checkpoint on the matched node's ancestor chain:
        anchored at a fully-matched boundary (<= mr.length), with
        length <= max_len and the unaligned tail matching `tokens`."""
        node = mr.node
        end = _node_end(node)
        while node is not None and getattr(node, "parent", None) is not None:
            if end <= mr.length:  # boundary fully on the matched path
                e = self.by_node.get(id(node))
                if (
                    e is not None
                    and e.aligned == end
                    and e.length <= max_len
                    and tuple(tokens[e.aligned : e.length]) == e.tail_tokens
                ):
                    self.by_node.move_to_end(id(node))  # MRU
                    self.hits += 1
                    return e
            end -= len(node.key)
            node = node.parent
        return None

    def restore(self, entry: CkptEntry, req_slot: int) -> None:
        self.runner.copy_state(self.device_row(entry.slot), req_slot)

    def adopt_tail(self, entry: CkptEntry) -> Optional[int]:
        """Fresh request-owned page seeded with the checkpoint's tail rows
        (copy-on-adopt: the checkpoint page stays immutable). Returns the
        new page id, or None when out of pages. Pure recurrent models get
        a bare page (their pages carry no data)."""
        got = self.allocator.alloc(1)
        if got is None:
            return None
        page = got[0]
        if self.has_attn_pages and entry.tail_page is not None:
            self.runner.copy_kv_page(entry.tail_page, page)
        return page

    # ---- memory pressure / teardown ----
    def release_lru(self, n: int = 1) -> int:
        """Drop up to n least-recently-used checkpoints (unlocking their
        nodes and freeing tail pages); the scheduler's eviction valve."""
        dropped = 0
        while dropped < n and self.by_node:
            self._release(self.by_node[next(iter(self.by_node))])
            dropped += 1
        return dropped

    def reset(self) -> None:
        """Full cache flush. Caller resets the radix tree and allocator,
        so locks and tail pages need no individual releases."""
        self.by_node.clear()
        self.free = list(range(self.n_slots))
