"""Priority scheduling: admission order and retraction victim selection.

Ref: --enable-priority-scheduling (srt/managers/schedule_policy.py) —
higher priority is admitted first regardless of arrival/policy order and
retracted last under memory pressure.
"""

import numpy as np

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs


def _core(tiny_llama_dir, **kw):
    kw.setdefault("max_running_requests", 16)
    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=4096, **kw,
    )
    runner = ModelRunner(args)
    return ScheduleCore(args, runner)


def _req(rid, prompt, priority=0, n_new=4):
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    return Req(rid, prompt, sp, priority=priority)


def test_priority_admission_order(tiny_llama_dir):
    # Only one request fits at a time: the high-priority late arrival must
    # finish before the earlier low-priority ones.
    core = _core(tiny_llama_dir, max_running_requests=16)
    core.args.max_running_requests = 1  # admit one at a time
    rng = np.random.default_rng(2)
    lo1 = _req("lo1", [int(t) for t in rng.integers(3, 200, size=6)], 0)
    lo2 = _req("lo2", [int(t) for t in rng.integers(3, 200, size=6)], 0)
    hi = _req("hi", [int(t) for t in rng.integers(3, 200, size=6)], 5)
    finish_order = []
    core.add_request(lo1)
    core.add_request(lo2)
    core.add_request(hi)
    steps = 0
    while core.has_work():
        for out in core.step():
            if out.finish_reason is not None:
                finish_order.append(out.rid)
        steps += 1
        assert steps < 500
    # lo1 was already admitted when hi arrived is not possible here since
    # scheduling happens inside step(); hi must be first.
    assert finish_order[0] == "hi"


def test_priority_retraction_victim(tiny_llama_dir):
    from sglang_tpu.core.req import ReqStatus

    core = _core(tiny_llama_dir)
    rng = np.random.default_rng(3)
    hi = _req("hi", [int(t) for t in rng.integers(3, 200, size=6)], 5)
    lo = _req("lo", [int(t) for t in rng.integers(3, 200, size=6)], 0)
    for r in (hi, lo):
        core.add_request(r)
        core.waiting.remove(r)
        r.status = ReqStatus.RUNNING
        core.running.append(r)
    victim = core._retract_one()
    assert victim is lo
    assert lo.status == ReqStatus.WAITING
