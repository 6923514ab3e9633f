"""Mock-model e2e: dummy weights + token oracle exercise the full
scheduler/cache/transport stack with exactly predictable outputs.

Ref: test/registered/mock_model/test_e2e_tp.py + test/mock_model/utils.py.
"""

import numpy as np

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore, oracle_next_token
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs


def expected_output(prompt, n):
    ids = list(prompt)
    out = []
    for _ in range(n):
        t = oracle_next_token(ids, 256)
        out.append(t)
        ids.append(t)
    return out


def test_oracle_e2e_batched(tiny_llama_dir):
    args = ServerArgs(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        load_format="dummy",  # random weights; oracle decides tokens
        sampling_backend="token_oracle",
        page_size=4,
        max_total_tokens=2048,
        max_running_requests=8,
    )
    core = ScheduleCore(args, ModelRunner(args))
    prompts = [[3 + i, 7, 9, 11 + i] for i in range(6)]
    reqs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(temperature=0.0, max_new_tokens=12,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"o{i}", p, sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 1000
    for p, r in zip(prompts, reqs):
        assert r.output_ids == expected_output(p, 12), r.rid
