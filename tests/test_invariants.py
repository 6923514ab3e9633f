"""KV page-ownership invariant checker (--enable-invariant-check)."""

import numpy as np
import pytest

from sglang_tpu.core.invariants import check_invariants
from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs


def _core(tiny_llama_dir, **kw):
    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=2048, max_running_requests=8,
        radix_cache_impl="python",  # enumerable tree for full checks
        **kw,
    )
    runner = ModelRunner(args)
    return ScheduleCore(args, runner)


def test_invariants_hold_through_workload(tiny_llama_dir):
    core = _core(tiny_llama_dir, enable_invariant_check=1)
    rng = np.random.default_rng(8)
    shared = [int(t) for t in rng.integers(3, 200, size=8)]
    for i in range(5):
        sp = SamplingParams(temperature=0.0, max_new_tokens=10,
                            ignore_eos=True)
        sp.normalize()
        core.add_request(
            Req(f"i{i}", shared + [int(t) for t in rng.integers(3, 200, size=3 + i)], sp)
        )
    n = 0
    while core.has_work():
        core.step()  # raises on any violation (checked every step)
        n += 1
        assert n < 400
    assert check_invariants(core) == []


def test_invariants_catch_double_ownership(tiny_llama_dir):
    core = _core(tiny_llama_dir)
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
    sp.normalize()
    req = Req("bad", [5, 6, 7, 8, 9], sp)
    core.add_request(req)
    core.step()  # prefill launches; req is running with pages
    assert req.pages
    # corrupt: put an owned page back on the free list (double ownership)
    victim = req.pages[-1]
    core.allocator.free([victim])
    errs = check_invariants(core)
    assert any(str(victim) in e for e in errs), errs
