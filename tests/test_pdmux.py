"""PD multiplexing (PDMux): prefill + decode roles colocated on one chip.

Ref: srt/multiplex/multiplexing_mixin.py:101 (SM-partitioned P/D
schedulers). TPU recast (multiplex/pdmux.py): time-division ticks, two
ScheduleCores sharing one ModelRunner, page-space-partitioned KV pool,
KV handoff over the in-process PD wire protocol.
"""

import dataclasses

import pytest

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.disaggregation.fake import reset_store
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.multiplex import PDMuxCoordinator
from sglang_tpu.multiplex.pdmux import RangeAllocator
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs


def make_args(model_dir, **kw):
    return ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
        max_running_requests=8,
        **kw,
    )


def greedy_req(rid, prompt, n_new):
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    return Req(rid, prompt, sp)


def drive(core, max_steps=800):
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < max_steps
    return steps


def test_range_allocator_partition():
    a = RangeAllocator(100, 4, 1, 40)
    b = RangeAllocator(100, 4, 40, 100)
    pa = a.alloc(39)
    pb = b.alloc(60)
    assert pa is not None and pb is not None
    assert set(pa).isdisjoint(set(pb))
    assert all(1 <= p < 40 for p in pa)
    assert all(40 <= p < 100 for p in pb)
    assert a.alloc(1) is None  # partition exhausted
    with pytest.raises(AssertionError):
        a.free([50])  # outside the partition


def test_pdmux_matches_single_engine(tiny_llama_dir):
    reset_store()
    prompts = [
        [7, 8, 9, 10, 11, 12, 13],
        [3, 1, 4, 1, 5, 9, 2, 6],
        [20, 21, 22],
    ]
    n_new = 8

    args = make_args(tiny_llama_dir)
    single = ScheduleCore(args, ModelRunner(args))
    base_reqs = [greedy_req(f"b{i}", p, n_new) for i, p in enumerate(prompts)]
    for r in base_reqs:
        single.add_request(r)
    drive(single)

    margs = make_args(tiny_llama_dir, enable_pdmux=True)
    runner = ModelRunner(margs)
    mux = PDMuxCoordinator(margs, runner)
    mux_reqs = [greedy_req(f"m{i}", p, n_new) for i, p in enumerate(prompts)]
    for r in mux_reqs:
        mux.add_request(r)
    drive(mux)

    for b, m in zip(base_reqs, mux_reqs):
        assert m.output_ids == b.output_ids, (m.output_ids, b.output_ids)


def test_pdmux_decode_not_starved(tiny_llama_dir):
    """While a long prefill is chunking, an in-flight decode must keep
    producing tokens (the whole point of multiplexing)."""
    reset_store()
    args = dataclasses.replace(
        make_args(tiny_llama_dir, enable_pdmux=True, pdmux_prefill_chunk=8,
                  chunked_prefill_size=8),
        max_total_tokens=4096,
    )
    runner = ModelRunner(args)
    mux = PDMuxCoordinator(args, runner)

    short = greedy_req("short", [5, 6, 7], 24)
    mux.add_request(short)
    # let the short request reach decode
    for _ in range(60):
        mux.step()
        if short.output_ids:
            break
    assert short.output_ids, "short request never started decoding"
    tokens_before = len(short.output_ids)

    long = greedy_req("long", list(range(2, 98)), 4)  # 96-token prompt, 12 chunks
    mux.add_request(long)
    # during the long prefill's chunking window, decode must advance
    stalled = 0
    prev = tokens_before
    for _ in range(30):
        mux.step()
        if len(short.output_ids) == prev:
            stalled += 1
        prev = len(short.output_ids)
        if not mux.prefill.has_work():
            break
    assert len(short.output_ids) > tokens_before, "decode starved by prefill"
    drive(mux)
    assert len(short.output_ids) == 24
    assert len(long.output_ids) == 4


def test_pdmux_rejects_kv_canary(tiny_llama_dir):
    args = make_args(tiny_llama_dir, enable_kv_canary=True)
    runner = ModelRunner(make_args(tiny_llama_dir))
    with pytest.raises(ValueError):
        PDMuxCoordinator(args, runner)
