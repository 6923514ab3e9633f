"""Native C++ radix tree: behavioral equivalence with the Python tree.

Ref: srt/mem_cache/cpp_radix_tree (tree_v2) test strategy.
"""

import random

import pytest

from sglang_tpu.core.radix_cache import RadixCache
from sglang_tpu.core.radix_cache_cpp import CppRadixCache
from sglang_tpu.mem.allocator import PageAllocator

PS = 4


def make_pair():
    a1, a2 = PageAllocator(512, PS), PageAllocator(512, PS)
    return (RadixCache(PS, a1), a1), (CppRadixCache(PS, a2), a2)


def test_equivalence_random_ops():
    random.seed(0)
    (py, pa), (cpp, ca) = make_pair()
    inserted = []
    for it in range(200):
        op = random.random()
        if op < 0.5 or not inserted:
            # insert a (possibly shared-prefix) sequence
            if inserted and random.random() < 0.5:
                base = list(random.choice(inserted))
                keep = random.randrange(0, len(base) // PS + 1) * PS
                toks = base[:keep] + [
                    random.randrange(3, 50) for _ in range(PS * random.randrange(1, 4))
                ]
            else:
                toks = [random.randrange(3, 50)
                        for _ in range(PS * random.randrange(1, 6))]
            n = len(toks) // PS
            p1, p2 = pa.alloc(n), ca.alloc(n)
            m1 = py.insert(toks, p1)
            m2 = cpp.insert(toks, p2)
            assert m1 == m2, (it, toks)
            # free duplicate pages like the scheduler does
            pa.free(p1[: m1 // PS]) if m1 else None
            ca.free(p2[: m2 // PS]) if m2 else None
            inserted.append(toks)
        elif op < 0.85:
            probe = list(random.choice(inserted))
            if random.random() < 0.5:
                probe = probe + [99, 98, 97, 96]
            r1 = py.match_prefix(probe)
            r2 = cpp.match_prefix(probe)
            assert r1.length == r2.length, (it, probe)
        else:
            k = random.randrange(1, 8)
            f1 = py.evict(k)
            f2 = cpp.evict(k)
            assert f1 == f2, (it, k)
        assert py.evictable_pages == cpp.evictable_pages, it
        assert pa.available_pages() == ca.available_pages(), it


def test_locking_protects():
    (py, pa), (cpp, ca) = make_pair()
    toks = list(range(3, 3 + 12))
    for cache, alloc in ((py, pa), (cpp, ca)):
        pages = alloc.alloc(3)
        cache.insert(toks, pages)
        mr = cache.match_prefix(toks)
        assert mr.length == 12
        cache.inc_lock(mr.node)
        assert cache.evict(10) == 0
        cache.dec_lock(mr.node)
        assert cache.evict(10) == 3


def test_scheduler_with_cpp_tree(tiny_llama_dir):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=2048, radix_cache_impl="cpp",
    )
    core = ScheduleCore(args, ModelRunner(args))
    from sglang_tpu.core.radix_cache_cpp import CppRadixCache

    assert isinstance(core.radix, CppRadixCache)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    sp.normalize()
    r1 = Req("c1", [5, 6, 7, 8, 9, 10, 11, 12], sp)
    core.add_request(r1)
    while core.has_work():
        core.step()
    sp2 = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    sp2.normalize()
    r2 = Req("c2", [5, 6, 7, 8, 9, 10, 11, 12], sp2)
    core.add_request(r2)
    while core.has_work():
        core.step()
    assert r2.output_ids == r1.output_ids
    assert r2.cached_len > 0
