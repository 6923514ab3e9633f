"""KV page-ownership invariant checker (debug tooling).

Ref class: the reference's KV canary / sanity checkers (srt memory debug
utilities). Every KV page must have exactly one owner at any time:

  - the allocator free list,
  - the radix tree (shared prefixes; referenced by many requests),
  - exactly one running/chunked request's OWN tail
    (pages beyond its tree-owned cached_len),
  - page 0 (the trash page).

Enabled with --enable-invariant-check: ScheduleCore runs a sweep every N
scheduling steps and raises on the first violation, which turns silent KV
corruption (double-free, use-after-free, leaked pages) into a loud,
located failure. Pure host-side; zero device cost.
"""

from __future__ import annotations

from typing import List, Optional, Set


def collect_radix_pages(radix) -> Optional[Set[int]]:
    """Page set owned by the tree; None if the impl can't enumerate (C++)."""
    root = getattr(radix, "root", None)
    if root is None or not hasattr(root, "children"):
        return None
    pages: Set[int] = set()
    stack = [root]
    while stack:
        node = stack.pop()
        for p in getattr(node, "pages", []):
            pages.add(int(p))
        stack.extend(node.children.values())
    return pages


def check_invariants(core) -> List[str]:
    """Returns a list of violation descriptions (empty = healthy)."""
    errs: List[str] = []
    alloc = core.allocator
    num_pages = alloc.num_pages
    ps = core.page_size

    free = list(alloc.free_pages)
    free_set = set(free)
    if len(free) != len(free_set):
        errs.append("allocator free list contains duplicates")
    if 0 in free_set:
        errs.append("trash page 0 in free list")
    for p in free_set:
        if not (0 < p < num_pages):
            errs.append(f"free page {p} out of range")
            break

    tree_pages = collect_radix_pages(core.radix)
    if tree_pages is not None:
        dup = tree_pages & free_set
        if dup:
            errs.append(f"pages both free and tree-owned: {sorted(dup)[:8]}")

    reqs = list(core.running)
    if core.chunked_req is not None:
        reqs.append(core.chunked_req)
    own_owner = {}
    for req in reqs:
        own_start = req.cached_len // ps
        pages = list(req.pages)
        if len(set(pages)) != len(pages):
            errs.append(f"req {req.rid} has duplicate pages")
        for p in pages[own_start:]:
            if p in free_set:
                errs.append(f"req {req.rid} own page {p} is in the free list")
            if tree_pages is not None and p in tree_pages:
                errs.append(f"req {req.rid} own page {p} is tree-owned")
            if p in own_owner and own_owner[p] != req.rid:
                errs.append(
                    f"page {p} owned by both {own_owner[p]} and {req.rid}"
                )
            own_owner[p] = req.rid
        if tree_pages is not None:
            missing = [p for p in pages[:own_start] if p not in tree_pages]
            if missing:
                errs.append(
                    f"req {req.rid} cached pages not in tree: {missing[:8]}"
                )

    # Recurrent-state checkpoints (mem/state_ckpt.py): a checkpoint's tail
    # page is its own ownership class — never free, tree-owned, or any
    # request's own page.
    ckpt = getattr(core, "state_ckpt", None)
    if ckpt is not None:
        for e in ckpt.by_node.values():
            p = e.tail_page
            if p is None:
                continue
            if p in free_set:
                errs.append(f"ckpt tail page {p} is in the free list")
            if tree_pages is not None and p in tree_pages:
                errs.append(f"ckpt tail page {p} is tree-owned")
            if p in own_owner:
                errs.append(
                    f"ckpt tail page {p} also owned by req {own_owner[p]}"
                )

    # Hybrid SWA pool: swa pages are owned by the free list, the shadow
    # registry (tree-retained windows), or exactly one request's own slots.
    if getattr(core, "hybrid_swa", False):
        salloc = core.swa_allocator
        sfree = list(salloc.free_pages)
        sfree_set = set(sfree)
        if len(sfree) != len(sfree_set):
            errs.append("swa allocator free list contains duplicates")
        shadow_pages = {e[0] for e in core.swa_shadow.map.values()}
        both = shadow_pages & sfree_set
        if both:
            errs.append(f"swa pages both free and shadowed: {sorted(both)[:8]}")
        sowner = {}
        for req in reqs:
            for j, p in enumerate(req.swa_pages):
                if not p:
                    continue
                if j < req.swa_adopted:
                    if p not in shadow_pages:
                        errs.append(
                            f"req {req.rid} adopted swa page {p} not shadowed"
                        )
                    continue
                if p in sfree_set:
                    errs.append(f"req {req.rid} swa page {p} is free")
                if p in shadow_pages:
                    errs.append(f"req {req.rid} swa page {p} is shadowed")
                if p in sowner and sowner[p] != req.rid:
                    errs.append(
                        f"swa page {p} owned by {sowner[p]} and {req.rid}"
                    )
                sowner[p] = req.rid

    # Conservation: free + tree + own <= total-1 (hicache-evicted pages have
    # returned to the free list; equality is not required because PREBUILT /
    # draft pools account separately).
    if tree_pages is not None:
        accounted = len(free_set) + len(tree_pages - free_set) + len(own_owner)
        if accounted > num_pages - 1:
            errs.append(
                f"page accounting exceeds pool: {accounted} > {num_pages - 1}"
            )
    return errs
