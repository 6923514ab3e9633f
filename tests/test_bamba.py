"""Bamba (hybrid Mamba-2 + attention): HF greedy parity.

Ref: srt/models/bamba.py + HF BambaForCausalLM. The attention layers use
the paged KV pool, the SSD layers the slot-indexed state pool — both
inside one HybridStatePool; greedy tokens must match HF through chunked
prefill and batched serving.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_bamba_dir(tmp_path_factory):
    import torch
    from transformers import BambaConfig, BambaForCausalLM

    torch.manual_seed(8)
    cfg = BambaConfig(
        vocab_size=160,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=4,
        attn_layer_indices=[1, 3],
        num_attention_heads=4,
        num_key_value_heads=2,
        attention_dropout=0.0,
        mamba_n_heads=8,
        mamba_d_head=12,
        mamba_n_groups=2,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_chunk_size=8,
        max_position_embeddings=128,
    )
    model = BambaForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_bamba")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def hf_greedy(model_dir, prompt, n_new):
    import torch
    from transformers import BambaForCausalLM

    hf = BambaForCausalLM.from_pretrained(model_dir)
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
        r = Req(f"bb{i}", list(p), sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [r.output_ids for r in reqs]


def test_bamba_greedy_parity(tiny_bamba_dir):
    rng = np.random.default_rng(25)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=13)],
        [int(t) for t in rng.integers(3, 150, size=6)],
    ]
    want = [hf_greedy(tiny_bamba_dir, p, 8) for p in prompts]
    got = run_core(tiny_bamba_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_bamba_chunked_prefill(tiny_bamba_dir):
    """SSD state carry + paged attention prefix across chunk boundaries."""
    rng = np.random.default_rng(26)
    prompt = [int(t) for t in rng.integers(3, 150, size=37)]
    want = hf_greedy(tiny_bamba_dir, prompt, 6)
    got = run_core(tiny_bamba_dir, [prompt], 6, chunked=16)
    assert got == [want], f"got={got} want={want}"
