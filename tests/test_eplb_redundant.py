"""EPLB redundant experts + elastic EP.

Ref: srt/eplb/eplb_algorithms/deepseek.py (replicated placements),
srt/elastic_ep/elastic_ep.py:23 (scale events). TPU recast
(sglang_tpu/eplb.py + layers/moe.py): P = E + R physical expert slots,
log2phy [E, Rmax] replica maps, token fan-out over replicas by position.
Replicas hold identical weights, so greedy outputs must stay EXACT under
any placement — including after routing around a dead EP shard.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_mixtral_dir(tmp_path_factory):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    cfg = MixtralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
    )
    model = MixtralForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_mixtral_red")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def build(model_dir, tp_size, ep_size, redundant, a2a=None):
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.parallel.mesh import create_mesh
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        tp_size=tp_size,
        ep_size=ep_size,
        ep_num_redundant_experts=redundant,
        moe_a2a_backend=a2a,
    )
    mesh_ctx = create_mesh(tp_size=tp_size, ep_size=ep_size) \
        if tp_size > 1 else None
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)
    return runner, core


def run_greedy(core, prompt, n_new, tag="r"):
    from sglang_tpu.core.req import Req
    from sglang_tpu.sampling.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req(tag, prompt, sp)
    core.add_request(req)
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 300
    return req.output_ids


def _reset():
    from sglang_tpu.layers.moe import set_redundant_experts

    set_redundant_experts(0)


def test_placement_properties():
    """compute_redundant_placement: coverage, capacity, shard diversity,
    dead-shard exclusion."""
    from sglang_tpu.eplb import compute_redundant_placement

    load = np.array([100.0, 10.0, 1.0, 1.0])
    p2l, l2p, cnt = compute_redundant_placement(
        load, ep=2, num_physical=8, rmax=3
    )
    assert p2l.shape == (8,)
    assert cnt.sum() <= 8 and (cnt >= 1).all()
    # the hot expert gets the most replicas
    assert cnt[0] == cnt.max()
    # every routable slot maps back consistently
    for e in range(4):
        for r in range(cnt[e]):
            assert p2l[l2p[e, r]] == e
    # dead shard: nothing routable on shard 1 (slots 4..7)
    p2l, l2p, cnt = compute_redundant_placement(
        load, ep=2, num_physical=8, rmax=3, dead_shards=(1,)
    )
    for e in range(4):
        for r in range(cnt[e]):
            assert l2p[e, r] < 4, "routable slot on a dead shard"
    assert (cnt >= 1).all()


def test_placement_coverage_error():
    from sglang_tpu.eplb import compute_redundant_placement

    load = np.ones(8)
    with pytest.raises(ValueError):
        # 1 live shard x 4 slots < 8 experts
        compute_redundant_placement(load, ep=2, num_physical=8, rmax=2,
                                    dead_shards=(1,))


def test_redundant_greedy_parity(tiny_mixtral_dir):
    """Replica fan-out must not change greedy outputs (replicas are exact
    weight copies)."""
    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    _, core_ref = build(tiny_mixtral_dir, 1, 1, 0)
    ref = run_greedy(core_ref, prompt, 8, "ref")
    _reset()
    _, core_red = build(tiny_mixtral_dir, 2, 2, 4)
    red = run_greedy(core_red, prompt, 8, "red")
    _reset()
    assert red == ref, f"red={red} ref={ref}"


def test_elastic_ep_scale_down(tiny_mixtral_dir):
    """Kill EP shard 1 mid-stream: placement re-covers every expert on
    shard 0's slots and greedy decoding continues exactly."""
    prompt = [5, 9, 33, 71, 12, 64, 90, 2]
    _, core_ref = build(tiny_mixtral_dir, 1, 1, 0)
    ref = run_greedy(core_ref, prompt, 8, "ref")
    _reset()

    runner, core = build(tiny_mixtral_dir, 2, 2, 4)
    ok, msg = runner.elastic_ep_scale([1])
    assert ok, msg
    # no routable slot on shard 1 (slots 4..7 of the 8 physical)
    for k, v in runner.params.items():
        if k.endswith("eplb_log2phy"):
            l2p = np.asarray(v)
            cntk = np.asarray(runner.params[k.replace("log2phy", "logcnt")])
            for e in range(l2p.shape[0]):
                assert (l2p[e, :cntk[e]] < 4).all()
    out = run_greedy(core, prompt, 8, "elastic")
    _reset()
    assert out == ref, f"elastic={out} ref={ref}"

    # restore full width
    ok, msg = runner.elastic_ep_scale([])
    assert ok, msg


def test_elastic_requires_redundancy(tiny_mixtral_dir):
    runner, _ = build(tiny_mixtral_dir, 2, 2, 0)
    ok, msg = runner.elastic_ep_scale([1])
    _reset()
    assert not ok and "redundant" in msg
