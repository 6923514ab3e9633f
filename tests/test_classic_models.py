"""Classic pre-Llama families: OPT, Persimmon, GPTBigCode HF parity.

Ref: srt/models/{opt,persimmon,gpt_bigcode}.py behavior — learned
positions with the +2 fairseq offset (OPT), per-head q/k LayerNorm +
partial rope + relu² (Persimmon), MQA with fused [q|k|v] c_attn
(StarCoder 1).
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
        r = Req(f"cl{i}", list(p), sp)
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


def _prompts(seed):
    rng = np.random.default_rng(seed)
    return [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=13)],
    ]


def test_opt_greedy_parity(tmp_path_factory):
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(15)
    cfg = OPTConfig(
        vocab_size=160, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        word_embed_proj_dim=48, do_layer_norm_before=True,
    )
    model = OPTForCausalLM(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("tiny_opt"))
    model.save_pretrained(path, safe_serialization=True)
    prompts = _prompts(75)
    want = [hf_greedy(OPTForCausalLM, path, p, 8) for p in prompts]
    got = run_core(path, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_opt_350m_style_projections(tmp_path_factory):
    """word_embed_proj_dim != hidden_size + post-norm layers (OPT-350M)."""
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(16)
    cfg = OPTConfig(
        vocab_size=160, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        word_embed_proj_dim=32, do_layer_norm_before=False,
    )
    model = OPTForCausalLM(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("tiny_opt350"))
    model.save_pretrained(path, safe_serialization=True)
    prompts = _prompts(76)
    want = [hf_greedy(OPTForCausalLM, path, p, 6) for p in prompts]
    got = run_core(path, prompts, 6)
    assert got == want, f"got={got} want={want}"


def test_persimmon_greedy_parity(tmp_path_factory):
    import torch
    from transformers import PersimmonConfig, PersimmonForCausalLM

    torch.manual_seed(17)
    cfg = PersimmonConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128,
    )
    model = PersimmonForCausalLM(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("tiny_persimmon"))
    model.save_pretrained(path, safe_serialization=True)
    prompts = _prompts(77)
    want = [hf_greedy(PersimmonForCausalLM, path, p, 8) for p in prompts]
    got = run_core(path, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_gpt_bigcode_greedy_parity(tmp_path_factory):
    import torch
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    torch.manual_seed(18)
    cfg = GPTBigCodeConfig(
        vocab_size=160, n_embd=48, n_head=4, n_layer=2, n_positions=128,
        multi_query=True,
    )
    model = GPTBigCodeForCausalLM(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("tiny_bigcode"))
    model.save_pretrained(path, safe_serialization=True)
    prompts = _prompts(78)
    want = [hf_greedy(GPTBigCodeForCausalLM, path, p, 8) for p in prompts]
    got = run_core(path, prompts, 8)
    assert got == want, f"got={got} want={want}"
