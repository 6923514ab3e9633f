"""Mamba-2 (SSD) with recurrent state pool: HF greedy parity.

Ref: srt/layers/attention/mamba/ (mamba2 path) + HF Mamba2ForCausalLM
torch_forward. Same state-pool contract as mamba1 (slot-indexed
conv/ssm states, scan-from-state chunked prefill); greedy tokens must
match HF byte-identically, including across chunk boundaries and
multi-request batches.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_mamba2_dir(tmp_path_factory):
    import torch
    from transformers import Mamba2Config, Mamba2ForCausalLM

    torch.manual_seed(4)
    cfg = Mamba2Config(
        vocab_size=160,
        hidden_size=48,
        state_size=8,
        num_hidden_layers=2,
        conv_kernel=4,
        expand=2,
        num_heads=8,
        head_dim=12,
        n_groups=2,
        chunk_size=8,
    )
    model = Mamba2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_mamba2")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def hf_greedy(model_dir, prompt, n_new):
    import torch
    from transformers import Mamba2ForCausalLM

    hf = Mamba2ForCausalLM.from_pretrained(model_dir)
    hf.eval()
    hf.generation_config.eos_token_id = None  # mirror ignore_eos
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
        r = Req(f"m2_{i}", list(p), sp)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [r.output_ids for r in reqs]


def test_mamba2_greedy_parity(tiny_mamba2_dir):
    rng = np.random.default_rng(15)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=14)],
        [int(t) for t in rng.integers(3, 150, size=5)],
    ]
    want = [hf_greedy(tiny_mamba2_dir, p, 8) for p in prompts]
    got = run_core(tiny_mamba2_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_mamba2_chunked_prefill_state_carry(tiny_mamba2_dir):
    """Prompt longer than the chunk: conv + SSD states must carry across
    chunks exactly — including the mid-chunk conv offsets (tokens 1..K-2
    of a continuation chunk read state across the boundary)."""
    rng = np.random.default_rng(16)
    prompt = [int(t) for t in rng.integers(3, 150, size=37)]
    want = hf_greedy(tiny_mamba2_dir, prompt, 6)
    got = run_core(tiny_mamba2_dir, [prompt], 6, chunked=16)
    assert got == [want], f"got={got} want={want}"


def test_mamba2_slot_state_isolation(tiny_mamba2_dir):
    rng = np.random.default_rng(17)
    p1 = [int(t) for t in rng.integers(3, 150, size=8)]
    p2 = [int(t) for t in rng.integers(3, 150, size=8)]
    want2 = hf_greedy(tiny_mamba2_dir, p2, 6)
    run_core(tiny_mamba2_dir, [p1], 6)
    got12 = run_core(tiny_mamba2_dir, [p1, p2], 6)
    assert got12[1] == want2
