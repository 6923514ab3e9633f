"""Cascade (shared-prefix) decode attention: token parity vs flat decode.

When every decode row shares a radix prefix (same page ids), the scheduler
splits attention into one shared-part dense matmul + per-row suffix and
merges via joint softmax. Must be token-identical to the flat path.
"""

import numpy as np


def _run(tiny_llama_dir, disable_cascade, seed=0):
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
        max_running_requests=16,
        disable_cascade_attn=disable_cascade,
        random_seed=seed,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    rng = np.random.default_rng(3)
    shared = [int(t) for t in rng.integers(3, 200, size=12)]  # 3 shared pages
    reqs = []
    for i in range(4):
        tail = [int(t) for t in rng.integers(3, 200, size=3 + i)]
        sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
        sp.normalize()
        r = Req(f"r{i}", shared + tail, sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 400
    return [list(r.output_ids) for r in reqs], core


def test_cascade_engages_and_matches(tiny_llama_dir):
    base, _ = _run(tiny_llama_dir, disable_cascade=True)
    fast, core = _run(tiny_llama_dir, disable_cascade=False)
    assert core.cascade_enabled
    assert all(len(o) == 16 for o in fast)
    assert fast == base


def test_cascade_detection(tiny_llama_dir):
    """The decode batch builder must have found a common page prefix."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=4096, max_running_requests=16, random_seed=0,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    rng = np.random.default_rng(5)
    shared = [int(t) for t in rng.integers(3, 200, size=12)]
    seen_shared = []
    orig = core._get_decode_batch

    def spy():
        out = orig()
        if out is not None and core._decode_shared is not None:
            seen_shared.append(core._decode_shared[1])
        return out

    core._get_decode_batch = spy
    for i in range(3):
        sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
        sp.normalize()
        core.add_request(
            Req(f"r{i}", shared + [int(t) for t in rng.integers(3, 200, size=2 + i)], sp)
        )
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 300
    assert seen_shared and max(seen_shared) >= 12
