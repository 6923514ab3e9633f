"""FalconH1 (parallel Mamba-2 + attention per layer): HF greedy parity.

Ref: srt/models/falcon_h1.py + HF FalconH1ForCausalLM. Exercises the
2-entries-per-layer HybridStatePool layout and the full mup-multiplier
surface (embedding/attention/key/ssm/mlp/lm_head + ssm section vector).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_falcon_h1_dir(tmp_path_factory):
    import torch
    from transformers import FalconH1Config, FalconH1ForCausalLM

    torch.manual_seed(9)
    cfg = FalconH1Config(
        vocab_size=160,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        mamba_d_ssm=96,
        mamba_n_heads=8,
        mamba_d_head=12,
        mamba_n_groups=2,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_chunk_size=8,
        mamba_rms_norm=True,
        max_position_embeddings=128,
        # non-trivial mup multipliers so parity exercises them all
        embedding_multiplier=2.0,
        attention_in_multiplier=0.9,
        attention_out_multiplier=1.1,
        ssm_in_multiplier=1.2,
        ssm_out_multiplier=0.8,
        key_multiplier=0.7,
        lm_head_multiplier=1.5,
        mlp_multipliers=[0.9, 1.2],
        ssm_multipliers=[0.5, 1.25, 0.8, 1.1, 0.9],
    )
    model = FalconH1ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_falcon_h1")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def hf_greedy(model_dir, prompt, n_new):
    import torch
    from transformers import FalconH1ForCausalLM

    hf = FalconH1ForCausalLM.from_pretrained(model_dir)
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
        r = Req(f"fh{i}", list(p), sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [r.output_ids for r in reqs]


def test_falcon_h1_greedy_parity(tiny_falcon_h1_dir):
    rng = np.random.default_rng(35)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=12)],
    ]
    want = [hf_greedy(tiny_falcon_h1_dir, p, 8) for p in prompts]
    got = run_core(tiny_falcon_h1_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_falcon_h1_chunked_prefill(tiny_falcon_h1_dir):
    rng = np.random.default_rng(36)
    prompt = [int(t) for t in rng.integers(3, 150, size=37)]
    want = hf_greedy(tiny_falcon_h1_dir, prompt, 6)
    got = run_core(tiny_falcon_h1_dir, [prompt], 6, chunked=16)
    assert got == [want], f"got={got} want={want}"
