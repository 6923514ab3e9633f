"""HiSparse: host-resident latent KV + top-k host-callback gathers.

Ref: srt/managers/hisparse_coordinator.py. Design note in
mem/hisparse.py — the reference's mid-stream swap-in kernel becomes an
ordered XLA host callback; exactness vs the device-resident DSA path is
bit-for-bit because both attend over the same selected rows.
"""

import numpy as np

# pytest rootdir puts tests/ on sys.path; reuse the DSA harness.
from test_dsa_sparse import _greedy, _with_topk, tiny_dsa_dirs  # noqa: F401


def test_hisparse_matches_device_dsa_dense_bound(tiny_dsa_dirs, tmp_path):
    """topk >= context: hisparse-on equals hisparse-off token-for-token,
    the device latent pool is gone, and rows actually moved host-side."""
    _, dsa_dir = tiny_dsa_dirs
    big = _with_topk(dsa_dir, tmp_path, 1 << 20, "hs_big")
    prompt = [3, 17, 92, 45, 6, 88, 21, 101, 9, 54]
    ref, _ = _greedy(big, prompt, 8)
    ours, runner = _greedy(big, prompt, 8, enable_hisparse=True)
    assert ours == ref, f"ours={ours} ref={ref}"
    latent, idx_pool = runner.kv_pool.kv[0]
    assert latent is None and idx_pool is not None
    hp = runner.hisparse_pool
    assert hp.written > 0 and hp.swapped_in > 0
    # The host pool holds real rows for the written slots.
    assert np.abs(hp.rows[0]).sum() > 0


def test_hisparse_truly_sparse_parity(tiny_dsa_dirs, tmp_path):
    """topk < live context: both paths attend over the SAME selected
    rows, so sparse hisparse == sparse device DSA exactly."""
    _, dsa_dir = tiny_dsa_dirs
    sparse = _with_topk(dsa_dir, tmp_path, 8, "hs_topk8")
    prompt = [(i * 11) % 120 + 3 for i in range(30)]
    ref, _ = _greedy(sparse, prompt, 8)
    ours, _ = _greedy(sparse, prompt, 8, enable_hisparse=True)
    assert ours == ref, f"ours={ours} ref={ref}"


def test_hisparse_radix_reuse(tiny_dsa_dirs, tmp_path):
    """Host rows persist per slot id: a radix-cache hit on the second
    request reuses host latent rows written by the first."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    _, dsa_dir = tiny_dsa_dirs
    big = _with_topk(dsa_dir, tmp_path, 1 << 20, "hs_radix")
    args = ServerArgs(
        model_path=big, dtype="float32", attention_backend="xla_native",
        page_size=4, max_total_tokens=2048, enable_hisparse=True,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    prompt = [(i * 5) % 120 + 3 for i in range(16)]

    def gen(rid):
        sp = SamplingParams(temperature=0.0, max_new_tokens=6,
                            ignore_eos=True)
        sp.normalize()
        req = Req(rid, list(prompt), sp)
        core.add_request(req)
        while core.has_work():
            core.step()
        return req

    r1 = gen("a")
    r2 = gen("b")
    assert r2.output_ids == r1.output_ids
    assert r2.cached_report > 0  # prefix hit against host-backed rows
