"""Jamba (hybrid attention + mamba + MoE): HF greedy parity.

Ref: srt/models/jamba.py + HF JambaForCausalLM. The HybridStatePool must
carry paged KV for attention layers and slot states for mamba layers
through chunked prefill, decode, and multi-request batches.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_jamba_dir(tmp_path_factory):
    import torch
    from transformers import JambaConfig, JambaForCausalLM

    torch.manual_seed(4)
    cfg = JambaConfig(
        vocab_size=160,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        attn_layer_offset=1,
        attn_layer_period=2,
        expert_layer_offset=1,
        expert_layer_period=2,
        num_experts=4,
        num_experts_per_tok=2,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_dt_rank=8,
        use_mamba_kernels=False,
        tie_word_embeddings=False,
    )
    model = JambaForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_jamba")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def hf_greedy(model_dir, prompt, n_new):
    import torch
    from transformers import JambaForCausalLM

    hf = JambaForCausalLM.from_pretrained(model_dir)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]), max_new_tokens=n_new,
            do_sample=False,
        )
    return out[0, len(prompt):].tolist()


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
        r = Req(f"j{i}", list(p), sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [r.output_ids for r in reqs]


def test_jamba_greedy_parity(tiny_jamba_dir):
    rng = np.random.default_rng(8)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=11)],
        [int(t) for t in rng.integers(3, 150, size=7)],
    ]
    want = [hf_greedy(tiny_jamba_dir, p, 8) for p in prompts]
    got = run_core(tiny_jamba_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_jamba_chunked_prefill(tiny_jamba_dir):
    """Chunk boundary crosses both the paged-KV and the conv/ssm state
    carry paths."""
    rng = np.random.default_rng(9)
    prompt = [int(t) for t in rng.integers(3, 150, size=27)]
    want = hf_greedy(tiny_jamba_dir, prompt, 6)
    got = run_core(tiny_jamba_dir, [prompt], 6, chunked=16)
    assert got == [want], f"got={got} want={want}"
