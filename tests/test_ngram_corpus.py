"""C++ ngram corpus (suffix automaton): match semantics + capacity.

Ref behavior: kernels/jit/csrc/ngram_corpus/ (global cross-request
corpus) and test/registered/unit/spec/test_ngram_corpus.py — drafts must
be real continuations of corpus occurrences, and a capacity-bounded
corpus must keep serving matches on recent content after rebuilds.
"""

import numpy as np

from sglang_tpu.speculative.ngram_corpus import NgramCorpusDrafter


def make(capacity=1 << 22, **kw):
    defaults = dict(num_draft_tokens=4, min_history=8)
    defaults.update(kw)
    d = NgramCorpusDrafter(capacity=capacity, **defaults)
    assert d._h is not None, "toolchain present in image; corpus must build"
    return d


def test_cross_request_match():
    d = make()
    # A request the server finished earlier.
    d.observe([10, 11, 12, 13, 14, 15, 16, 17])
    # A new, SHORT request (self-history can't help yet) whose tail
    # matches the corpus: expect the corpus continuation.
    assert d.propose([99, 12, 13, 14]) == [15, 16, 17]
    # no match anywhere
    assert d.propose([1, 2, 3, 4]) == []


def test_longest_suffix_preferred():
    d = make()
    d.observe([1, 2, 3, 100, 100, 100])
    d.observe([9, 2, 3, 200, 200, 200])
    # Suffix [9, 2, 3] (len 3) matches the second sequence; the shorter
    # [2, 3] also occurs in the first. Longest must win.
    assert d.propose([7, 9, 2, 3]) == [200, 200, 200]


def test_separator_fences_sequences():
    d = make()
    d.observe([1, 2, 3])
    d.observe([4, 5, 6])
    # [2, 3] ends exactly at a sequence boundary: the draft must NOT leak
    # into the next sequence's tokens.
    assert d.propose([8, 8, 2, 3]) == []
    # and the cross-boundary ngram [3, 4] must not match at all
    assert d.propose([9, 9, 3, 4]) == []


def test_self_history_takes_precedence():
    d = make(min_history=4, num_draft_tokens=3)
    d.observe([1, 2, 3, 777, 778, 779])
    # Own history has 1 2 3 -> 4; corpus has 1 2 3 -> 777. Self wins.
    toks = [1, 2, 3, 4, 9, 1, 2, 3]
    assert d.propose(toks) == [4, 9, 1]


def test_capacity_rebuild_keeps_recent():
    d = make(capacity=2048)
    rng = np.random.default_rng(0)
    for i in range(64):  # 64 * (64+1) tokens >> 2048 -> several rebuilds
        seq = rng.integers(10, 1000, size=64).astype(np.int32).tolist()
        d.observe(seq)
    s = d.stats()
    assert s["corpus_rebuilds"] > 0
    assert s["corpus_tokens"] <= 2048
    # The most recent sequence must still be matchable.
    d.observe([300001 % 32000, 5, 6, 7, 8, 9])
    assert d.propose([42, 42, 5, 6, 7]) == [8, 9]


def test_scheduler_feeds_corpus(tiny_llama_dir):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        max_running_requests=8,
        speculative_algorithm="NGRAM",
        speculative_num_draft_tokens=4,
    )
    core = ScheduleCore(args, ModelRunner(args))
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    sp.normalize()
    core.add_request(Req("a", [3, 4, 5, 6, 7, 8], sp))
    while core.has_work():
        core.step()
    s = core.drafter.stats()
    assert s["available"] and s["corpus_seqs"] == 1
