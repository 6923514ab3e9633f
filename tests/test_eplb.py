"""EPLB: expert distribution recording + placement rebalancing.

Ref: srt/eplb/{expert_distribution.py,eplb_manager.py,
eplb_algorithms/deepseek.py}. Invariant: a rebalance permutes physical
placement only — greedy outputs must be byte-identical before and after.
"""

import numpy as np
import pytest

from sglang_tpu.eplb import RECORDER, balanced_packing, imbalance


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
    path = tmp_path_factory.mktemp("tiny_mixtral_eplb")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_balanced_packing_reduces_imbalance():
    rng = np.random.default_rng(0)
    # skewed loads: two hot experts that the contiguous layout puts on
    # the same shard
    load = np.asarray([100.0, 90.0, 1.0, 2.0, 3.0, 1.0, 2.0, 1.0])
    contiguous = np.arange(8, dtype=np.int32)
    p = balanced_packing(load, 2)
    assert sorted(p.tolist()) == list(range(8))  # a permutation
    assert imbalance(load, p, 2) < imbalance(load, contiguous, 2)
    assert imbalance(load, p, 2) < 1.1  # near-perfect for this case
    # hot experts land on different shards
    s0 = set(p[:4].tolist())
    assert not {0, 1} <= s0 or not {0, 1} <= set(p[4:].tolist())
    assert (0 in s0) != (1 in s0)


def test_eplb_rebalance_preserves_outputs(tiny_mixtral_dir):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.parallel.mesh import create_mesh
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_mixtral_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        tp_size=2,
        ep_size=2,
    )
    mesh_ctx = create_mesh(tp_size=2, ep_size=2)
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)

    def gen(rid, prompt, n=6):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n,
                            ignore_eos=True)
        sp.normalize()
        r = Req(rid, list(prompt), sp)
        core.add_request(r)
        steps = 0
        while core.has_work():
            core.step()
            steps += 1
            assert steps < 300
        return r.output_ids

    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    ref = gen("a", prompt)

    # record a distribution
    RECORDER.start()
    runner.clear_compiled()
    core.flush_cache()
    gen("b", prompt)
    RECORDER.stop()
    runner.clear_compiled()
    dist = RECORDER.dump()
    assert dist, "no layers recorded"
    for k, v in dist.items():
        assert sum(v) > 0

    ok, msg = runner.eplb_rebalance()
    assert ok, msg
    # placement params are valid permutations
    from sglang_tpu.eplb import MOE_LAYER_REGISTRY

    seen = 0
    for prefix, E in MOE_LAYER_REGISTRY.items():
        key = f"{prefix}/eplb_log2phy"
        if key in runner.params:
            l2p = np.asarray(runner.params[key])
            assert sorted(l2p.tolist()) == list(range(E))
            seen += 1
    assert seen > 0

    core.flush_cache()
    out = gen("c", prompt)
    assert out == ref, f"outputs changed after rebalance: {out} vs {ref}"
