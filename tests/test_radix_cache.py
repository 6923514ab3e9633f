"""RadixCache unit tests (ref test strategy: test/registered/radix_cache)."""

from sglang_tpu.core.radix_cache import RadixCache
from sglang_tpu.mem.allocator import PageAllocator

PS = 4


def make():
    alloc = PageAllocator(num_pages=64, page_size=PS)
    return RadixCache(PS, alloc), alloc


def toks(n, start=0):
    return list(range(start, start + n))


def test_insert_and_match():
    cache, alloc = make()
    pages = alloc.alloc(3)
    matched = cache.insert(toks(12), pages)
    assert matched == 0
    mr = cache.match_prefix(toks(12))
    assert mr.length == 12
    assert mr.pages == pages
    # partial match: first 8 tokens shared
    mr = cache.match_prefix(toks(8) + [99, 98, 97, 96])
    assert mr.length == 8
    assert mr.pages == pages[:2]


def test_partial_page_no_match():
    cache, alloc = make()
    pages = alloc.alloc(2)
    cache.insert(toks(8), pages)
    # diverges inside the second page -> only page 1 matches
    mr = cache.match_prefix(toks(6) + [42, 43])
    assert mr.length == 4


def test_insert_dedup():
    cache, alloc = make()
    p1 = alloc.alloc(2)
    assert cache.insert(toks(8), p1) == 0
    p2 = alloc.alloc(3)
    matched = cache.insert(toks(12), p2)
    assert matched == 8  # first 8 tokens already present
    mr = cache.match_prefix(toks(12))
    assert mr.length == 12
    assert mr.pages == p1 + p2[2:]


def test_evict_lru_respects_locks():
    cache, alloc = make()
    p1 = alloc.alloc(2)
    cache.insert(toks(8), p1)
    mr1 = cache.match_prefix(toks(8))
    p2 = alloc.alloc(2)
    cache.insert([50, 51, 52, 53, 54, 55, 56, 57], p2)
    cache.inc_lock(mr1.node)
    before = alloc.available_pages()
    freed = cache.evict(10)
    assert freed == 2  # only the unlocked branch
    assert alloc.available_pages() == before + 2
    assert cache.match_prefix(toks(8)).length == 8
    cache.dec_lock(mr1.node)
    freed = cache.evict(10)
    assert freed == 2
    assert cache.match_prefix(toks(8)).length == 0
    assert cache.evictable_pages == 0


def test_split_then_deep_insert():
    cache, alloc = make()
    p1 = alloc.alloc(4)
    cache.insert(toks(16), p1)
    # new sequence shares 2 pages then diverges
    p2 = alloc.alloc(3)
    seq2 = toks(8) + [100 + i for i in range(4)]
    matched = cache.insert(seq2, p2[:3])
    assert matched == 8
    assert cache.match_prefix(seq2).length == 12
    assert cache.match_prefix(toks(16)).length == 16


def test_lock_accounting():
    cache, alloc = make()
    p1 = alloc.alloc(3)
    cache.insert(toks(12), p1)
    assert cache.evictable_pages == 3
    mr = cache.match_prefix(toks(12))
    cache.inc_lock(mr.node)
    assert cache.protected_pages == 3
    assert cache.evictable_pages == 0
    cache.dec_lock(mr.node)
    assert cache.evictable_pages == 3
