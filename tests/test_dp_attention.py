"""DP attention: batch-dim sharding over the "dp" mesh axis.

Ref: srt/layers/dp_attention.py:46-230 recast as GSPMD sharding
constraints (one program; no per-rank schedulers or idle-step sync).
Greedy parity vs single-device must be exact, including the MLA
(DeepSeek) path that motivates the feature.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_deepseek_dir(tmp_path_factory):
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(5)
    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        q_lora_rank=None, kv_lora_rank=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, n_group=2,
        topk_group=1, topk_method="group_limited_greedy",
        routed_scaling_factor=1.0, first_k_dense_replace=1,
        moe_layer_freq=1, max_position_embeddings=256, head_dim=24,
    )
    model = DeepseekV2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_dsv2_dpa")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def run_greedy(model_dir, prompt, n_new, dp=1, tp=1, dp_attn=False):
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
        tp_size=tp,
        dp_size=dp,
        enable_dp_attention=dp_attn,
    )
    mesh_ctx = create_mesh(tp_size=tp, dp_size=dp if dp_attn else 1)
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, p in enumerate([prompt, prompt[::-1]]):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"dpa{i}", list(p), sp)
        reqs.append(r)
        core.add_request(r)
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 300
    return [r.output_ids for r in reqs]


def test_dp_attention_llama_parity(tiny_llama_dir):
    prompt = [3, 17, 92, 45, 6, 88, 21, 101, 55, 12]
    ref = run_greedy(tiny_llama_dir, prompt, 8)
    got = run_greedy(tiny_llama_dir, prompt, 8, dp=2, tp=2, dp_attn=True)
    assert got == ref, f"got={got} ref={ref}"


def test_dp_attention_mla_parity(tiny_deepseek_dir):
    """The motivating case: MLA's single latent head cannot TP-split, so
    attention shards by batch while the MLP gathers."""
    prompt = [5, 9, 33, 71, 2, 45, 18]
    ref = run_greedy(tiny_deepseek_dir, prompt, 6)
    got = run_greedy(tiny_deepseek_dir, prompt, 6, dp=2, tp=2,
                     dp_attn=True)
    assert got == ref, f"got={got} ref={ref}"
