"""MoE model parity vs HF transformers (tiny random Mixtral / Qwen2MoE)."""

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
    path = tmp_path_factory.mktemp("tiny_mixtral")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def tiny_qwen2moe_dir(tmp_path_factory):
    import torch
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    torch.manual_seed(1)
    cfg = Qwen2MoeConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=4,
        num_experts_per_tok=2,
        decoder_sparse_step=1,
        norm_topk_prob=False,
        max_position_embeddings=256,
        sliding_window=None,
        use_sliding_window=False,
    )
    model = Qwen2MoeForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_qwen2moe")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def _hf_greedy(model_dir, prompt_ids, n_new):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir)
    model.eval()
    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt_ids]), max_new_tokens=n_new, do_sample=False
        )
    return out[0, len(prompt_ids):].tolist()


def _our_greedy(model_dir, prompt_ids, n_new):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    req = Req("m", prompt_ids, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids


def test_mixtral_greedy_parity(tiny_mixtral_dir):
    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    ref = _hf_greedy(tiny_mixtral_dir, prompt, 8)
    ours = _our_greedy(tiny_mixtral_dir, prompt, 8)
    assert ours == ref, f"ours={ours} ref={ref}"


def test_qwen2moe_greedy_parity(tiny_qwen2moe_dir):
    prompt = [5, 9, 100, 45, 33]
    ref = _hf_greedy(tiny_qwen2moe_dir, prompt, 8)
    ours = _our_greedy(tiny_qwen2moe_dir, prompt, 8)
    assert ours == ref, f"ours={ours} ref={ref}"
