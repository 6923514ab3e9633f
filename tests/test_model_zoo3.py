"""Zoo sweep 3: Falcon (all 3 decoder generations), Cohere v1, OLMo-3,
FlexOlmo, Apertus, SeedOss — HF greedy parity.

Ref: srt/models/ equivalents. Covers falcon's three fused-qkv layouts,
cohere's parallel-residual + qk-LayerNorm, olmo3's per-layer sliding
windows with split rope, FlexOlmo's post-norm MoE, and Apertus xIELU.
"""

import numpy as np
import pytest


def run_core(model_dir, prompts, n_new):
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
        max_total_tokens=1024,
        max_running_requests=8,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"z3_{i}", list(p), sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [r.output_ids for r in reqs]


def hf_greedy(model, prompt, n_new):
    import torch

    model.generation_config.eos_token_id = None
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor([prompt]), max_new_tokens=n_new,
            do_sample=False,
        )
    return out[0, len(prompt):].tolist()


def _check(model, path, seed, n_new=8, n_prompts=2):
    import torch

    model.eval()
    model.save_pretrained(path, safe_serialization=True)
    rng = np.random.default_rng(seed)
    prompts = [[int(t) for t in rng.integers(3, 150, size=n)]
               for n in (9, 13)[:n_prompts]]
    want = [hf_greedy(model, p, n_new) for p in prompts]
    got = run_core(path, prompts, n_new)
    assert got == want, f"got={got} want={want}"


def test_falcon_new_arch(tmp_path_factory):
    import torch
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(21)
    cfg = FalconConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2,
        new_decoder_architecture=True, parallel_attn=True, bias=False,
        ffn_hidden_size=96,
    )
    _check(FalconForCausalLM(cfg),
           str(tmp_path_factory.mktemp("falcon_new")), 81)


def test_falcon_7b_style(tmp_path_factory):
    import torch
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(22)
    cfg = FalconConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True,
        new_decoder_architecture=False, parallel_attn=True, bias=False,
    )
    _check(FalconForCausalLM(cfg),
           str(tmp_path_factory.mktemp("falcon7b")), 82)


def test_falcon_rw_alibi_sequential(tmp_path_factory):
    import torch
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(23)
    cfg = FalconConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, multi_query=False,
        new_decoder_architecture=False, parallel_attn=False, bias=True,
        alibi=True,
    )
    _check(FalconForCausalLM(cfg),
           str(tmp_path_factory.mktemp("falcon_rw")), 83)


def test_cohere_v1_qk_norm(tmp_path_factory):
    import torch
    from transformers import CohereConfig, CohereForCausalLM

    torch.manual_seed(24)
    cfg = CohereConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, use_qk_norm=True, logit_scale=0.25,
        max_position_embeddings=128,
    )
    _check(CohereForCausalLM(cfg),
           str(tmp_path_factory.mktemp("cohere1")), 84)


def test_olmo3_sliding(tmp_path_factory):
    import torch
    from transformers import Olmo3Config, Olmo3ForCausalLM

    torch.manual_seed(25)
    cfg = Olmo3Config(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, sliding_window=8,
        layer_types=["sliding_attention", "full_attention",
                     "sliding_attention", "full_attention"],
        rope_scaling={"rope_type": "linear", "factor": 2.0},
        max_position_embeddings=128,
    )
    _check(Olmo3ForCausalLM(cfg),
           str(tmp_path_factory.mktemp("olmo3")), 85, n_new=6)


def test_flex_olmo_moe(tmp_path_factory):
    import torch
    from transformers import FlexOlmoConfig, FlexOlmoForCausalLM

    torch.manual_seed(26)
    cfg = FlexOlmoConfig(
        vocab_size=160, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=False, max_position_embeddings=128,
        pad_token_id=0,
    )
    _check(FlexOlmoForCausalLM(cfg),
           str(tmp_path_factory.mktemp("flexolmo")), 86)


def test_apertus_xielu(tmp_path_factory):
    import torch
    from transformers import ApertusConfig, ApertusForCausalLM

    torch.manual_seed(27)
    cfg = ApertusConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
    )
    _check(ApertusForCausalLM(cfg),
           str(tmp_path_factory.mktemp("apertus")), 87)


def test_seed_oss(tmp_path_factory):
    import torch
    from transformers import SeedOssConfig, SeedOssForCausalLM

    torch.manual_seed(28)
    cfg = SeedOssConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128,
    )
    _check(SeedOssForCausalLM(cfg),
           str(tmp_path_factory.mktemp("seedoss")), 88)
