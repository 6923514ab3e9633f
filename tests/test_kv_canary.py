"""KV canary: use-after-free content-corruption detection.

Ref: srt/kv_canary/. The canary must (a) stay silent through normal
serving — frees/allocs/radix evictions never trip it — and (b) fire when
a freed page's KV is actually corrupted.
"""

import numpy as np
import pytest


def make_core(tiny_llama_dir):
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=256,  # small pool -> evictions happen
        enable_kv_canary=True,
    )
    runner = ModelRunner(args)
    return ScheduleCore(args, runner), runner


def gen(core, rid, prompt, n=6):
    from sglang_tpu.core.req import Req
    from sglang_tpu.sampling.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_new_tokens=n, ignore_eos=True)
    sp.normalize()
    r = Req(rid, list(prompt), sp)
    core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return r


def test_canary_silent_through_normal_serving(tiny_llama_dir):
    core, runner = make_core(tiny_llama_dir)
    rng = np.random.default_rng(3)
    outs = {}
    for i in range(6):  # churn the small pool: evictions + reuse
        p = [int(t) for t in rng.integers(3, 200, size=20)]
        outs[i] = (p, gen(core, f"c{i}", p, 8).output_ids)
    assert core.allocator.num_stamped > 0
    assert core.allocator.num_checked > 0
    # outputs stay correct (canary stamping never touched live pages)
    p, o = outs[0]
    again = gen(core, "re0", p, 8)
    assert again.output_ids == o


def test_canary_detects_corruption(tiny_llama_dir):
    core, runner = make_core(tiny_llama_dir)
    gen(core, "a", [3, 5, 7, 9, 11, 13, 15, 17], 4)
    alloc = core.allocator
    pages = alloc.alloc(3)
    alloc.free(pages)  # stamped now; LIFO returns them next
    victim = alloc.free_pages[-1]
    assert victim in alloc._stamped
    # simulate a stale writer scribbling into the freed page
    kv = list(runner.kv_pool.kv)
    kp, vp = kv[0]
    kv[0] = (kp.at[victim, 0].set(0.0), vp)
    runner.kv_pool.kv = tuple(kv)
    with pytest.raises(AssertionError, match="canary"):
        alloc.alloc(1)


def test_debug_dumper_and_comparator(tiny_llama_dir, tmp_path):
    """--debug-dump-dir writes per-batch npz; the comparator reports zero
    divergence for identical runs and flags an injected difference."""
    import os

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.debug_utils import compare_dumps
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    def run(dump_dir):
        args = ServerArgs(
            model_path=tiny_llama_dir,
            dtype="float32",
            attention_backend="xla_native",
            page_size=4,
            max_total_tokens=1024,
            debug_dump_dir=str(dump_dir),
        )
        runner = ModelRunner(args)
        core = ScheduleCore(args, runner)
        sp = SamplingParams(temperature=0.0, max_new_tokens=4,
                            ignore_eos=True)
        sp.normalize()
        r = Req("d", [3, 5, 7, 9], sp)
        core.add_request(r)
        n = 0
        while core.has_work():
            core.step()
            n += 1
            assert n < 100
        return r.output_ids

    a = tmp_path / "a"
    b = tmp_path / "b"
    out_a = run(a)
    out_b = run(b)
    assert out_a == out_b
    assert len(os.listdir(a)) > 0
    assert compare_dumps(str(a), str(b)) == 0
    # inject a divergence
    import numpy as np

    files = sorted(os.listdir(b))
    f0 = str(b / files[0])
    data = dict(np.load(f0))
    data["next_tokens"] = data["next_tokens"] + 1
    np.savez_compressed(f0, **data)
    assert compare_dumps(str(a), str(b)) > 0
