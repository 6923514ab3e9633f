"""Device-resident decode loop: token parity vs per-step host rebuilds.

The resident loop (ScheduleCore._try_resident_decode + ModelRunner.
forward_resident) advances seq_lens/positions/out_cache_loc and the
sampling rng keys on device. These tests pin that it produces EXACTLY the
same tokens as the host-rebuild path — including across page-runway
rebuild boundaries and for seeded non-greedy sampling (the on-device
rng_keys[:, 1] += 1 must replicate the host's (seed, step) fold).
"""

import numpy as np
import pytest


def _run(tiny_llama_dir, disable_resident, decode_runway=8, **sp_kw):
    from sglang_tpu.configs.model_config import ModelConfig
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
        disable_resident_decode=disable_resident,
        decode_runway=decode_runway,
        random_seed=0,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    rng = np.random.default_rng(7)
    reqs = []
    for i in range(4):
        prompt = [int(t) for t in rng.integers(3, 200, size=6 + i)]
        sp = SamplingParams(max_new_tokens=20, ignore_eos=True, **sp_kw)
        sp.normalize()
        r = Req(f"r{i}", prompt, sp)
        r._seed = 1234 + i
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [list(r.output_ids) for r in reqs], core


def test_resident_greedy_parity(tiny_llama_dir):
    base, _ = _run(tiny_llama_dir, disable_resident=True, temperature=0.0)
    fast, core = _run(tiny_llama_dir, disable_resident=False, temperature=0.0)
    assert all(len(o) == 20 for o in fast)
    assert fast == base


def test_resident_sampling_parity(tiny_llama_dir):
    """Seeded top-k sampling must match: device rng advance == host fold."""
    base, _ = _run(
        tiny_llama_dir, disable_resident=True, temperature=0.8, top_k=20
    )
    fast, _ = _run(
        tiny_llama_dir, disable_resident=False, temperature=0.8, top_k=20
    )
    assert fast == base


def test_resident_crosses_page_runway(tiny_llama_dir):
    """runway=4 tokens (1 page) forces a host rebuild every few steps; the
    rebuilt state must continue the sequence seamlessly."""
    base, _ = _run(tiny_llama_dir, disable_resident=True, temperature=0.0)
    fast, _ = _run(
        tiny_llama_dir, disable_resident=False, decode_runway=4,
        temperature=0.0,
    )
    assert fast == base


def test_resident_respects_min_new_tokens(tiny_llama_dir):
    """Rows inside min_new_tokens ban EOS via a constant banned set; the
    resident loop must rebuild at the min_new boundary."""
    fast, _ = _run(
        tiny_llama_dir, disable_resident=False, temperature=0.0,
    )
    base, _ = _run(
        tiny_llama_dir, disable_resident=True, temperature=0.0,
    )
    assert fast == base
