"""GraniteMoeHybrid (Granite 4.0): Mamba-2 + attention + MoE parity.

Ref: HF GraniteMoeHybridForCausalLM. Exercises the hybrid pool,
no-rope attention with attention_multiplier scale, MoE + shared MLP,
and the granite multipliers.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_gmh_dir(tmp_path_factory):
    import torch
    from transformers import (
        GraniteMoeHybridConfig,
        GraniteMoeHybridForCausalLM,
    )

    torch.manual_seed(10)
    cfg = GraniteMoeHybridConfig(
        vocab_size=160,
        hidden_size=48,
        intermediate_size=64,
        shared_intermediate_size=80,
        num_hidden_layers=4,
        layer_types=["mamba", "attention", "mamba", "attention"],
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        mamba_n_heads=8,
        mamba_d_head=12,
        mamba_n_groups=2,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_chunk_size=8,
        embedding_multiplier=2.0,
        residual_multiplier=0.9,
        attention_multiplier=0.2,
        logits_scaling=1.5,
        max_position_embeddings=128,
    )
    model = GraniteMoeHybridForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_gmh")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def hf_greedy(model_dir, prompt, n_new):
    import torch
    from transformers import GraniteMoeHybridForCausalLM

    hf = GraniteMoeHybridForCausalLM.from_pretrained(model_dir)
    hf.eval()
    hf.generation_config.eos_token_id = None
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
        r = Req(f"gm{i}", list(p), sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [r.output_ids for r in reqs]


def test_gmh_greedy_parity(tiny_gmh_dir):
    rng = np.random.default_rng(45)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=13)],
    ]
    want = [hf_greedy(tiny_gmh_dir, p, 8) for p in prompts]
    got = run_core(tiny_gmh_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_gmh_chunked_prefill(tiny_gmh_dir):
    rng = np.random.default_rng(46)
    prompt = [int(t) for t in rng.integers(3, 150, size=37)]
    want = hf_greedy(tiny_gmh_dir, prompt, 6)
    got = run_core(tiny_gmh_dir, [prompt], 6, chunked=16)
    assert got == [want], f"got={got} want={want}"
