"""MIXED prefill+decode batches (ref srt/model_executor/
forward_batch_info.py:98 ForwardMode.MIXED; scheduler mixing at
srt/managers/scheduler.py:3103).

TPU recast: the extend region keeps its aligned ragged layout; decode
rows pack densely after it at the STATIC boundary fb.mixed_tp, and
attention splits there (ops/attention/base.py _mixed_views). Parity
requirement: greedy outputs must be byte-identical with mixing on/off.
"""

import numpy as np
import pytest

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.batch_builder import SeqInput, build_forward_batch
from sglang_tpu.model_exec.forward_batch import ForwardMode
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
        chunked_prefill_size=32,
        max_running_requests=16,
        schedule_policy="fcfs",
    )
    defaults.update(kw)
    args = ServerArgs(**defaults)
    runner = ModelRunner(args)
    return ScheduleCore(args, runner), args


def greedy_req(rid, prompt, n_new):
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    return Req(rid, prompt, sp)


def run_staggered(core, prompts, n_new, stagger=4):
    """Add requests a few steps apart so decodes are running while later
    prompts chunk-prefill — the exact interleaving MIXED exists for."""
    rng = np.random.default_rng(0)
    reqs = [greedy_req(f"r{i}", p, n_new) for i, p in enumerate(prompts)]
    it = iter(reqs)
    nxt = next(it)
    core.add_request(nxt)
    steps = 0
    added = 1
    while core.has_work() or added < len(reqs):
        if added < len(reqs) and steps % stagger == stagger - 1:
            core.add_request(next(it))
            added += 1
        core.step()
        steps += 1
        assert steps < 3000
    return reqs


def _prompts():
    rng = np.random.default_rng(7)
    # long prompts -> multiple 32-token chunks each
    return [rng.integers(2, 200, size=80 + 7 * i).tolist() for i in range(5)]


@pytest.fixture(scope="module")
def mixed_vs_pure(tiny_llama_dir):
    prompts = _prompts()
    core_off, _ = make_core(tiny_llama_dir, enable_mixed_chunk=False)
    reqs_off = run_staggered(core_off, prompts, 24)
    assert core_off.num_mixed_steps == 0
    core_on, _ = make_core(tiny_llama_dir, enable_mixed_chunk=True)
    reqs_on = run_staggered(core_on, prompts, 24)
    assert core_on.num_mixed_steps > 0, "mixing never triggered — test is vacuous"
    return reqs_off, reqs_on


def test_mixed_greedy_parity(mixed_vs_pure):
    reqs_off, reqs_on = mixed_vs_pure
    for a, b in zip(reqs_off, reqs_on):
        assert a.output_ids == b.output_ids, a.rid


def test_mixed_builder_layout():
    ps = 4
    seqs = [
        # one prefill chunk: 10 new tokens on 4 cached
        SeqInput(list(range(100, 110)), 4, [1, 2, 3, 4], req_slot=0),
        # two decode rows
        SeqInput([0], 7, [5, 6], req_slot=1),
        SeqInput([0], 9, [7, 8, 9], req_slot=2),
    ]
    fb = build_forward_batch(seqs, ps, ForwardMode.MIXED, trash_slot=9,
                             num_prefill_seqs=1, align=8)
    Tp = fb.mixed_tp
    assert Tp >= 16  # 10 tokens aligned to 8 -> 16, then token-bucketed
    assert fb.mode == ForwardMode.MIXED
    ii = np.asarray(fb.input_ids)
    pos = np.asarray(fb.positions)
    sids = np.asarray(fb.seq_ids)
    loc = np.asarray(fb.out_cache_loc)
    li = np.asarray(fb.logits_indices)
    # extend region
    assert list(ii[:10]) == list(range(100, 110))
    assert list(pos[:10]) == list(range(4, 14))
    assert all(sids[:10] == 0)
    # decode tail at the static boundary
    assert pos[Tp] == 7 and pos[Tp + 1] == 9
    assert sids[Tp] == 1 and sids[Tp + 1] == 2
    assert loc[Tp] == 6 * ps + 3  # page 6, offset 7%4
    assert loc[Tp + 1] == 9 * ps + 1
    assert li[0] == 9 and li[1] == Tp and li[2] == Tp + 1
    # block maps cover only the extend region
    assert fb.block_seq.shape[0] == Tp // 8
    # decode rows wrote no blocks; trailing blocks inactive
    bqo = np.asarray(fb.block_q_off)
    assert (bqo[2:] > 1 << 20).all()
    # seq metadata rows in natural order
    sl = np.asarray(fb.seq_lens)
    assert sl[0] == 14 and sl[1] == 8 and sl[2] == 10


def test_mixed_with_sampling_seeds(tiny_llama_dir):
    """Seeded non-greedy rows must produce identical sequences regardless
    of mixing (per-row rng is keyed by (seed, step), not batch shape)."""
    prompts = _prompts()[:3]

    def run(disable):
        core, _ = make_core(tiny_llama_dir, enable_mixed_chunk=not disable)
        reqs = []
        for i, p in enumerate(prompts):
            sp = SamplingParams(temperature=0.8, max_new_tokens=12,
                                ignore_eos=True, sampling_seed=42 + i)
            sp.normalize()
            reqs.append(Req(f"s{i}", p, sp))
        it = iter(reqs)
        core.add_request(next(it))
        steps, added = 0, 1
        while core.has_work() or added < len(reqs):
            if added < len(reqs) and steps % 3 == 2:
                core.add_request(next(it))
                added += 1
            core.step()
            steps += 1
            assert steps < 2000
        return [r.output_ids for r in reqs]

    assert run(True) == run(False)
