"""Qwen3-Next (hybrid GDN linear attention + gated full attention + MoE)
greedy parity vs HF, incl. chunked prefill through the recurrent state
pool. Ref: srt/models/qwen3_next.py test strategy; HF
torch_chunk/recurrent_gated_delta_rule is the numerics oracle."""

import pytest


def _hf_greedy(model_dir, prompt, n_new):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_dir, attn_implementation="eager"
    )
    model.eval()
    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False
        )
    return out[0, len(prompt):].tolist()


def _our_greedy(model_dir, prompt, n_new, chunked_prefill_size=None):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    kw = dict(
        model_path=model_dir, dtype="float32",
        attention_backend="xla_native", page_size=4, max_total_tokens=2048,
        max_running_requests=4,
    )
    if chunked_prefill_size:
        kw["chunked_prefill_size"] = chunked_prefill_size
    args = ServerArgs(**kw)
    core = ScheduleCore(args, ModelRunner(args))
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("m", prompt, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids


@pytest.fixture(scope="module")
def tiny_qwen3_next_dir(tmp_path_factory):
    import torch
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    torch.manual_seed(33)
    cfg = Qwen3NextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4,  # 3 linear_attention + 1 full_attention
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=256, pad_token_id=0,
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=4,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        moe_intermediate_size=32, shared_expert_intermediate_size=64,
        norm_topk_prob=True, mlp_only_layers=[0],
        full_attention_interval=4,
    )
    model = Qwen3NextForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_qwen3_next")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_qwen3_next_greedy_parity(tiny_qwen3_next_dir):
    prompt = [(i * 7) % 120 + 3 for i in range(18)]
    ref = _hf_greedy(tiny_qwen3_next_dir, prompt, 10)
    ours = _our_greedy(tiny_qwen3_next_dir, prompt, 10)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"


def test_qwen3_next_chunked_prefill_parity(tiny_qwen3_next_dir):
    # Chunk boundary mid-sequence exercises conv-state + recurrent-state
    # carry between extend chunks.
    prompt = [(i * 11) % 120 + 3 for i in range(30)]
    ref = _hf_greedy(tiny_qwen3_next_dir, prompt, 8)
    ours = _our_greedy(tiny_qwen3_next_dir, prompt, 8,
                       chunked_prefill_size=12)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"
