"""Linear-attention hybrid families: LFM2 (short-conv) and MiniMax
(lightning attention) HF greedy parity.

Ref: srt/layers/attention/linear/{short_conv,lightning}_backend.py.
Together with GDN (tests/test_qwen3_next.py) these cover the reference's
linear-attention backend family on the slot-state pool design.
"""

import numpy as np
import pytest


def run_core(model_dir, prompts, n_new, chunked=None):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    kw = dict(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        max_running_requests=8,
    )
    if chunked:
        kw["chunked_prefill_size"] = chunked
    args = ServerArgs(**kw)
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"la{i}", list(p), sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [r.output_ids for r in reqs]


def hf_greedy(cls, model_dir, prompt, n_new):
    import torch

    hf = cls.from_pretrained(model_dir)
    hf.eval()
    hf.generation_config.eos_token_id = None
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]), max_new_tokens=n_new,
            do_sample=False,
        )
    return out[0, len(prompt):].tolist()


@pytest.fixture(scope="module")
def tiny_lfm2_dir(tmp_path_factory):
    import torch
    from transformers import Lfm2Config, Lfm2ForCausalLM

    torch.manual_seed(11)
    cfg = Lfm2Config(
        vocab_size=160,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=4,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        num_attention_heads=4,
        num_key_value_heads=2,
        conv_L_cache=3,
        block_auto_adjust_ff_dim=False,
        max_position_embeddings=128,
    )
    model = Lfm2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_lfm2")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_lfm2_greedy_parity(tiny_lfm2_dir):
    from transformers import Lfm2ForCausalLM

    rng = np.random.default_rng(55)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=13)],
    ]
    want = [hf_greedy(Lfm2ForCausalLM, tiny_lfm2_dir, p, 8)
            for p in prompts]
    got = run_core(tiny_lfm2_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_lfm2_chunked_prefill(tiny_lfm2_dir):
    from transformers import Lfm2ForCausalLM

    rng = np.random.default_rng(56)
    prompt = [int(t) for t in rng.integers(3, 150, size=37)]
    want = hf_greedy(Lfm2ForCausalLM, tiny_lfm2_dir, prompt, 6)
    got = run_core(tiny_lfm2_dir, [prompt], 6, chunked=16)
    assert got == [want], f"got={got} want={want}"


@pytest.fixture(scope="module")
def tiny_minimax_dir(tmp_path_factory):
    import torch
    from transformers import MiniMaxConfig, MiniMaxForCausalLM

    torch.manual_seed(12)
    cfg = MiniMaxConfig(
        vocab_size=160,
        hidden_size=48,
        intermediate_size=64,
        num_hidden_layers=4,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=12,
        num_local_experts=4,
        num_experts_per_tok=2,
        block_size=8,
        full_attn_alpha_factor=0.9,
        full_attn_beta_factor=1.1,
        linear_attn_alpha_factor=1.2,
        linear_attn_beta_factor=0.8,
        mlp_alpha_factor=0.95,
        mlp_beta_factor=1.05,
        max_position_embeddings=128,
    )
    model = MiniMaxForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_minimax")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_minimax_greedy_parity(tiny_minimax_dir):
    from transformers import MiniMaxForCausalLM

    rng = np.random.default_rng(57)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=13)],
    ]
    want = [hf_greedy(MiniMaxForCausalLM, tiny_minimax_dir, p, 8)
            for p in prompts]
    got = run_core(tiny_minimax_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_minimax_chunked_prefill(tiny_minimax_dir):
    """Lightning state carry across chunk boundaries (HF block prefill
    vs our per-token scan must agree)."""
    from transformers import MiniMaxForCausalLM

    rng = np.random.default_rng(58)
    prompt = [int(t) for t in rng.integers(3, 150, size=37)]
    want = hf_greedy(MiniMaxForCausalLM, tiny_minimax_dir, prompt, 6)
    got = run_core(tiny_minimax_dir, [prompt], 6, chunked=16)
    assert got == [want], f"got={got} want={want}"
