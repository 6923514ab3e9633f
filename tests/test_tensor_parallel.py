"""Tensor parallelism over a multi-device mesh (virtual CPU devices).

Ref test strategy: test/registered/{4-gpu-models,...} — here TP shardings
run on the 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8). Greedy output must be identical
to single-device execution.
"""

import numpy as np
import pytest


def run_greedy(model_dir, tp_size, prompt, n_new):
    import jax

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.parallel.mesh import create_mesh
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        tp_size=tp_size,
    )
    mesh_ctx = create_mesh(tp_size=tp_size)
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    req = Req("tp", prompt, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids


def test_tp2_matches_tp1(tiny_llama_dir):
    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    ref = run_greedy(tiny_llama_dir, 1, prompt, 8)
    tp2 = run_greedy(tiny_llama_dir, 2, prompt, 8)
    assert tp2 == ref, f"tp2={tp2} ref={ref}"


def test_tp2_pallas_backend_kernels(tiny_llama_dir):
    """shard_map-wrapped pallas kernels (interpret mode on CPU) under tp=2."""
    import jax

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.parallel.mesh import create_mesh
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="pallas",
        page_size=4,
        max_total_tokens=1024,
        tp_size=2,
    )
    mesh_ctx = create_mesh(tp_size=2)
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)
    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    sp.normalize()
    req = Req("tpk", prompt, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    ref = run_greedy(tiny_llama_dir, 1, prompt, 6)
    assert req.output_ids == ref
