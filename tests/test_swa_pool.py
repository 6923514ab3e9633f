"""Hybrid SWA KV pool: sliding-window layers get a dedicated small pool,
out-of-window pages are freed, and tree-shadowed trailing windows keep
prefix reuse working (ref srt/mem_cache/allocator/swa.py,
swa_radix_cache.py)."""

import numpy as np
import pytest

from tests.test_gemma2 import tiny_gemma2_dir  # noqa: F401 (fixture)


def _make_core(model_dir, **kw):
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        max_running_requests=8,
        enable_invariant_check=4,
        **kw,
    )
    runner = ModelRunner(args)
    return ScheduleCore(args, runner), runner


def _run(core, rid, prompt, n_new):
    from sglang_tpu.core.req import Req
    from sglang_tpu.sampling.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req(rid, prompt, sp)
    core.add_request(req)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return req


def test_hybrid_pool_engages_and_matches_shared_pool(tiny_gemma2_dir):
    """Gemma-2 (window=8) with the hybrid pool produces the same tokens as
    the shared-pool configuration, and actually frees out-of-window pages."""
    prompt = [(i * 7) % 120 + 3 for i in range(30)]

    core_h, runner_h = _make_core(tiny_gemma2_dir)
    assert core_h.hybrid_swa
    assert runner_h.kv_pool.config.swa_num_pages > 0
    # sliding layers (even ids) are swa-sized, full layers full-sized
    kvc = runner_h.kv_pool.config
    assert any(w > 0 for w in kvc.layer_windows)
    for l, w in enumerate(kvc.layer_windows):
        expect = kvc.swa_num_pages if w > 0 else kvc.num_pages
        assert runner_h.kv_pool.kv[l][0].shape[0] == expect

    # step manually so we can observe in-flight trimming
    from sglang_tpu.core.req import Req
    from sglang_tpu.sampling.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    sp.normalize()
    req_h = Req("h1", prompt, sp)
    core_h.add_request(req_h)
    trimmed_mid_run = False
    steps = 0
    while core_h.has_work():
        core_h.step()
        steps += 1
        assert steps < 500
        if req_h.swa_pages and req_h.swa_pages[0] == 0:
            trimmed_mid_run = True  # out-of-window slot freed while running
    # window=8, ps=4: early slots must have been freed during decode
    assert trimmed_mid_run

    core_s, _ = _make_core(tiny_gemma2_dir, disable_swa_kv_pool=True)
    assert not core_s.hybrid_swa
    req_s = _run(core_s, "s1", prompt, 16)
    assert req_h.output_ids == req_s.output_ids


def test_swa_shadow_multiturn_reuse(tiny_gemma2_dir):
    """Multi-turn continuation (new prompt extends the stored sequence)
    reuses the radix prefix: the stored END's sliding window is shadowed.
    (A match in the MIDDLE of a stored sequence clamps to 0 — same
    semantics as the reference's tombstoned SWA radix.)"""
    prompt = [(i * 11) % 120 + 3 for i in range(24)]
    core, _ = _make_core(tiny_gemma2_dir)

    r1 = _run(core, "a", prompt, 8)
    assert core.swa_shadow.map, "release should register trailing-window shadows"

    # turn 2: context = turn-1 prompt + output + new user tokens
    turn2 = list(r1.all_ids) + [9, 10, 11, 12]
    r2 = _run(core, "b", turn2, 8)
    assert r2.cached_report > 0, "stored-end match should reuse via shadows"

    # ground truth: same turn-2 prompt on a fresh core (no cache)
    core_f, _ = _make_core(tiny_gemma2_dir)
    r3 = _run(core_f, "c", list(turn2), 8)
    assert r2.output_ids == r3.output_ids


def test_swa_clamp_without_shadow(tiny_gemma2_dir):
    """If the match point's window is not shadowed, the match clamps to 0
    rather than reusing sliding-layer KV that no longer exists."""
    prompt = [(i * 5) % 120 + 3 for i in range(24)]
    core, _ = _make_core(tiny_gemma2_dir)
    r1 = _run(core, "a", prompt, 8)
    # drop all shadows (simulates swa-pool pressure shedding)
    n = len(core.swa_shadow.map)
    assert core.swa_shadow.drop_unreferenced(n) == n
    r2 = _run(core, "b", prompt, 8)
    assert r2.cached_report == 0  # clamped: no swa KV for the window
    assert r2.output_ids == r1.output_ids  # recompute is still correct


def test_swa_pool_conserved(tiny_gemma2_dir):
    """After all requests finish and the cache is flushed, both pools are
    fully free (no leaks, no double frees)."""
    core, runner = _make_core(tiny_gemma2_dir)
    for i in range(3):
        _run(core, f"r{i}", [(i * 13 + j) % 120 + 3 for j in range(20)], 6)
    assert core.flush_cache()
    assert (
        core.allocator.available_pages()
        == runner.kv_pool.config.num_pages - 1
    )
    assert (
        core.swa_allocator.available_pages()
        == runner.kv_pool.config.swa_num_pages - 1
    )
    assert not core.swa_shadow.map
