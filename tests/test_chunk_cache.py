"""ChunkCache (ref srt/mem_cache/chunk_cache.py): the scheduler runs a
no-sharing cache controller when radix is disabled — chunked prefill
still works, no cross-request reuse happens, pages free at finish."""

import numpy as np

from sglang_tpu.core.chunk_cache import ChunkCache
from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs


def _core(tiny_llama_dir, **kw):
    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=512, max_running_requests=4,
        chunked_prefill_size=8, **kw,
    )
    return ScheduleCore(args, ModelRunner(args))


def _run(core, prompt, n_new=6):
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("r", prompt, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids


def test_disable_radix_uses_chunk_cache(tiny_llama_dir):
    core = _core(tiny_llama_dir, disable_radix_cache=True)
    assert isinstance(core.radix, ChunkCache)
    before = core.allocator.available_pages()
    prompt = [(i * 3) % 250 + 2 for i in range(20)]  # > chunk size
    out = _run(core, prompt)
    assert len(out) == 6
    # nothing retained, all pages back in the allocator
    assert core.radix.total_cached_pages() == 0
    assert core.allocator.available_pages() == before


def test_chunk_cache_matches_radix_tokens(tiny_llama_dir):
    prompt = [(i * 11) % 250 + 2 for i in range(20)]
    toks_chunk = _run(_core(tiny_llama_dir, disable_radix_cache=True),
                      prompt)
    toks_radix = _run(_core(tiny_llama_dir), prompt)
    assert toks_chunk == toks_radix


def test_chunk_cache_interface_nulls():
    cc = ChunkCache(4, None)
    m = cc.match_prefix([1, 2, 3, 4, 5, 6, 7, 8])
    assert m.length == 0 and m.pages == []
    assert cc.insert(list(range(8)), [0, 1]) == 0
    assert cc.evict(10) == 0
    cc.inc_lock(m.node)
    cc.dec_lock(m.node)
    assert cc.total_cached_pages() == 0
