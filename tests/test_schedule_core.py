"""ScheduleCore e2e: continuous batching, radix reuse, retraction.

Ref test strategy: SURVEY.md §4 mock-model e2e (dummy weights, full
scheduler/cache stack on CPU).
"""

import numpy as np
import pytest

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs


def make_core(model_dir, **kw):
    defaults = dict(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        chunked_prefill_size=64,
        max_running_requests=16,
        schedule_policy="lpm",
    )
    defaults.update(kw)
    args = ServerArgs(**defaults)
    runner = ModelRunner(args)
    return ScheduleCore(args, runner), args


def run_all(core, reqs, max_steps=3000):
    for r in reqs:
        core.add_request(r)
    done = {}
    steps = 0
    while core.has_work():
        outs = core.step()
        for o in outs:
            if o.finish_reason is not None:
                done[o.rid] = o
        steps += 1
        assert steps < max_steps, "scheduler livelock"
    return done


def greedy_req(rid, prompt, n_new):
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    return Req(rid, prompt, sp)


@pytest.fixture(scope="module")
def single_req_baseline(tiny_llama_dir):
    """Outputs from bs=1 runs, used as ground truth for batched runs."""
    core, _ = make_core(tiny_llama_dir)
    prompts = {
        f"r{i}": [7, 8, 9, 10] * 3 + [20 + i, 30 + i, 40 + i] for i in range(6)
    }
    baseline = {}
    for rid, prompt in prompts.items():
        req = greedy_req(rid, prompt, 10)
        run_all(core, [req])
        baseline[rid] = list(req.output_ids)
    return prompts, baseline


def test_batched_matches_single(tiny_llama_dir, single_req_baseline):
    prompts, baseline = single_req_baseline
    core, _ = make_core(tiny_llama_dir)
    reqs = [greedy_req(rid, p, 10) for rid, p in prompts.items()]
    run_all(core, reqs)
    for req in reqs:
        assert req.output_ids == baseline[req.rid], req.rid


def test_radix_cache_hit(tiny_llama_dir, single_req_baseline):
    prompts, baseline = single_req_baseline
    core, _ = make_core(tiny_llama_dir)
    r1 = greedy_req("r0", prompts["r0"], 10)
    run_all(core, [r1])
    # identical prompt again -> page-aligned prefix should be cached
    r2 = greedy_req("r0b", prompts["r0"], 10)
    run_all(core, [r2])
    assert r2.cached_len > 0
    assert r2.output_ids == baseline["r0"]


def test_chunked_prefill_long_prompt(tiny_llama_dir):
    core, _ = make_core(tiny_llama_dir, chunked_prefill_size=16)
    prompt = [(i * 7) % 200 + 2 for i in range(100)]
    req = greedy_req("long", prompt, 5)
    run_all(core, [req])
    assert len(req.output_ids) == 5

    # same result without chunking
    core2, _ = make_core(tiny_llama_dir, chunked_prefill_size=4096)
    req2 = greedy_req("long2", prompt, 5)
    run_all(core2, [req2])
    assert req.output_ids == req2.output_ids


def test_retraction_under_memory_pressure(tiny_llama_dir):
    # Tiny KV budget: forces retraction while decoding several requests.
    core, _ = make_core(
        tiny_llama_dir, max_total_tokens=256, disable_radix_cache=True
    )
    reqs = [
        greedy_req(f"m{i}", [11 + i, 12 + i, 13 + i], 40) for i in range(8)
    ]
    run_all(core, reqs)
    for r in reqs:
        assert len(r.output_ids) == 40
    # verify against ample-memory run
    core2, _ = make_core(tiny_llama_dir)
    reqs2 = [
        greedy_req(f"m{i}", [11 + i, 12 + i, 13 + i], 40) for i in range(8)
    ]
    run_all(core2, reqs2)
    for a, b in zip(reqs, reqs2):
        assert a.output_ids == b.output_ids


def test_max_new_tokens_and_eos(tiny_llama_dir):
    core, _ = make_core(tiny_llama_dir)
    sp = SamplingParams(temperature=0.0, max_new_tokens=64, ignore_eos=False)
    sp.normalize()
    req = Req("eos", [5, 6, 7], sp, eos_token_ids={-1})  # unreachable eos
    run_all(core, [req])
    assert len(req.output_ids) == 64
    assert req.finish_reason.kind == "length"


def test_stop_token(tiny_llama_dir, single_req_baseline):
    prompts, baseline = single_req_baseline
    stop_tok = baseline["r0"][3]
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=10, stop_token_ids=[stop_tok],
        ignore_eos=True,
    )
    sp.normalize()
    core, _ = make_core(tiny_llama_dir)
    req = Req("stop", prompts["r0"], sp)
    run_all(core, [req])
    assert req.output_ids == baseline["r0"][:4]
    assert req.finish_reason.kind == "stop"
