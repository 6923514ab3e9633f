"""Pipeline parallelism (GSPMD GPipe, parallel/pipeline.py).

Ref: srt/managers/scheduler_pp_mixin.py:69 (event_loop_pp). Greedy output
under pp=2 / pp=2 x tp=2 on the 8-device CPU mesh must be identical to
single-device execution, including through chunked prefill (microbatch
causality) and multi-request decode batches.
"""

import numpy as np
import pytest


def run_greedy(model_dir, prompts, n_new, pp_size=1, tp_size=1,
               chunked=None, microbatches=None):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.parallel.mesh import create_mesh
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    kw = dict(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        tp_size=tp_size,
        pp_size=pp_size,
    )
    if chunked:
        kw["chunked_prefill_size"] = chunked
    if microbatches:
        kw["pp_microbatches"] = microbatches
    args = ServerArgs(**kw)
    mesh_ctx = create_mesh(tp_size=tp_size, pp_size=pp_size)
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"pp{i}", list(p), sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [r.output_ids for r in reqs]


def test_pp2_matches_pp1(tiny_llama_dir):
    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    ref = run_greedy(tiny_llama_dir, [prompt], 8)
    pp2 = run_greedy(tiny_llama_dir, [prompt], 8, pp_size=2)
    assert pp2 == ref, f"pp2={pp2} ref={ref}"


def test_pp2_tp2_matches_single(tiny_llama_dir):
    """PP composes with TP (tp GSPMD-auto inside the manual-pp shard_map)."""
    prompt = [3, 17, 92, 45, 6, 88, 21, 101, 30, 31]
    ref = run_greedy(tiny_llama_dir, [prompt], 6)
    pp_tp = run_greedy(tiny_llama_dir, [prompt], 6, pp_size=2, tp_size=2)
    assert pp_tp == ref, f"pp2xtp2={pp_tp} ref={ref}"


def test_pp2_batch_and_chunked_prefill(tiny_llama_dir):
    """Multi-request batches + chunked prefill: microbatch m+1 must see
    microbatch m's KV (pipeline causality), and decode microbatching
    (rows split over M) must not change tokens."""
    rng = np.random.default_rng(9)
    prompts = [
        [int(t) for t in rng.integers(3, 250, size=n)]
        for n in (21, 9, 14)
    ]
    ref = run_greedy(tiny_llama_dir, prompts, 7)
    pp2 = run_greedy(tiny_llama_dir, prompts, 7, pp_size=2, chunked=16,
                     microbatches=2)
    assert pp2 == ref, f"pp2={pp2} ref={ref}"
