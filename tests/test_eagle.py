"""EAGLE speculative decoding: outputs must equal plain greedy decoding.

The draft head here is DUMMY (random weights, target geometry), so
acceptance is near zero — but the verify/acceptance protocol guarantees
greedy outputs are unchanged regardless of draft quality. That invariant +
the feature-plumbing bookkeeping (kv_len sync across chunked prefill and
rollbacks) is what these tests pin down.
"""

import numpy as np

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs


def run_core(model_dir, spec, prompts, n_new, chunked=None):
    kw = dict(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        max_running_requests=16,
    )
    if spec:
        kw["speculative_algorithm"] = "EAGLE"
        kw["speculative_num_draft_tokens"] = 3
        kw["load_format"] = "auto"  # target real; head falls back to dummy
    if chunked:
        kw["chunked_prefill_size"] = chunked
    args = ServerArgs(**kw)
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"e{i}", p, sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 2000
    return [r.output_ids for r in reqs], core


def test_eagle_matches_plain_greedy(tiny_llama_dir):
    rng = np.random.default_rng(11)
    prompts = [
        [int(t) for t in rng.integers(3, 200, size=9)],
        [int(t) for t in rng.integers(3, 200, size=14)],
        [int(t) for t in rng.integers(3, 200, size=6)],
    ]
    plain, _ = run_core(tiny_llama_dir, False, prompts, 12)
    spec, core = run_core(tiny_llama_dir, True, prompts, 12)
    assert spec == plain
    assert core.num_spec_steps > 0
    # draft head KV state stayed in sync through every round
    for r in core.draft_worker.states.values():
        assert r.kv_len >= 0


def test_eagle_chunked_prefill_feature_sync(tiny_llama_dir):
    """Prompt longer than the chunk size: the head must consume features
    chunk by chunk and still leave outputs unchanged."""
    rng = np.random.default_rng(13)
    prompts = [[int(t) for t in rng.integers(3, 200, size=40)]]
    plain, _ = run_core(tiny_llama_dir, False, prompts, 10)
    spec, core = run_core(tiny_llama_dir, True, prompts, 10, chunked=16)
    assert spec == plain


def test_eagle_worker_propose_shapes(tiny_llama_dir):
    """Direct worker check: after a prefill observation the worker proposes
    exactly k chained tokens."""
    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=4096, max_running_requests=16,
        speculative_algorithm="EAGLE", speculative_num_draft_tokens=3,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    w = core.draft_worker
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
    sp.normalize()
    req = Req("w0", [5, 6, 7, 8, 9], sp)
    core.add_request(req)
    core.step()  # prefill (observes features, emits first token)
    while not req.output_ids:
        core.step()
    st = w.states.get(req.rid)
    assert st is not None and st.kv_len == 5 and st.f_last is not None
    drafts = w.propose_all([req])
    assert len(drafts) == 1 and len(drafts[0]) == 3
