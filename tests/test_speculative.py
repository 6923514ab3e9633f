"""NGRAM speculative decoding: outputs must be identical to plain greedy.

Ref test strategy: test/registered/mock_model/test_e2e_spec_eagle.py —
spec decode must not change greedy outputs, only speed.
"""

import numpy as np
import pytest

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.speculative.ngram import NgramDrafter, accept_drafts


def test_ngram_drafter():
    d = NgramDrafter(num_draft_tokens=3, min_history=4)
    # repeating pattern: ...1 2 3 4 1 2 -> expect draft [3, 4, 1]
    toks = [9, 1, 2, 3, 4, 1, 2, 3, 4, 1, 2]
    assert d.propose(toks) == [3, 4, 1]
    assert d.propose([1, 2, 3]) == []  # too short


def test_accept_drafts():
    assert accept_drafts([5, 6, 7], [5, 6, 9, 8]) == ([5, 6, 9], 2)
    assert accept_drafts([5], [4, 1]) == ([4], 0)
    assert accept_drafts([], [4]) == ([4], 0)
    assert accept_drafts([5, 6], [5, 6, 7]) == ([5, 6, 7], 2)


def run_core(model_dir, spec, prompts, n_new):
    kw = dict(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        max_running_requests=16,
    )
    if spec:
        kw["speculative_algorithm"] = "NGRAM"
        kw["speculative_num_draft_tokens"] = 4
    args = ServerArgs(**kw)
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"s{i}", p, sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 2000
    return [r.output_ids for r in reqs], core


def test_spec_matches_plain_greedy(tiny_llama_dir):
    # repetitive prompts give the drafter something to hit
    prompts = [
        [7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8],
        list(range(3, 30)),
        [5, 5, 6, 6, 5, 5, 6, 6, 5, 5],
    ]
    plain, _ = run_core(tiny_llama_dir, False, prompts, 16)
    spec, core = run_core(tiny_llama_dir, True, prompts, 16)
    assert spec == plain
    assert core.num_spec_steps > 0


def test_standalone_draft_matches_plain(tiny_llama_dir):
    """Draft model == target model (tiny): near-total acceptance, and the
    outputs must still be exactly plain greedy."""
    prompts = [
        [7, 8, 9, 7, 8, 9, 7, 8, 9],
        list(range(3, 20)),
    ]
    plain, _ = run_core(tiny_llama_dir, False, prompts, 12)

    kw = dict(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        max_running_requests=16,
        speculative_algorithm="STANDALONE",
        speculative_draft_model_path=tiny_llama_dir,
        speculative_num_draft_tokens=4,
    )
    args = ServerArgs(**kw)
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(temperature=0.0, max_new_tokens=12,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"sa{i}", p, sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 2000
    assert [r.output_ids for r in reqs] == plain
    # draft == target => most drafts accepted
    assert core.num_spec_accepted > 0
    total_emitted = sum(len(r.output_ids) for r in reqs)
    assert core.num_spec_steps < total_emitted  # fewer verify rounds than tokens
