"""ALiBi model families (Bloom, MPT): HF greedy parity.

Ref: srt/models/{bloom,mpt}.py behavior. Exercises the alibi_slopes
path through the attention backends (relative-distance bias, which is
softmax-equivalent to HF's absolute-position form).
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
        r = Req(f"ab{i}", list(p), sp)
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
def tiny_bloom_dir(tmp_path_factory):
    import torch
    from transformers import BloomConfig, BloomForCausalLM

    torch.manual_seed(13)
    cfg = BloomConfig(
        vocab_size=160,
        hidden_size=48,
        n_head=6,  # non-power-of-2: exercises the extra-powers ladder
        n_layer=2,
    )
    model = BloomForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_bloom")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_bloom_greedy_parity(tiny_bloom_dir):
    from transformers import BloomForCausalLM

    rng = np.random.default_rng(65)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=13)],
    ]
    want = [hf_greedy(BloomForCausalLM, tiny_bloom_dir, p, 8)
            for p in prompts]
    got = run_core(tiny_bloom_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_bloom_chunked_prefill(tiny_bloom_dir):
    from transformers import BloomForCausalLM

    rng = np.random.default_rng(66)
    prompt = [int(t) for t in rng.integers(3, 150, size=37)]
    want = hf_greedy(BloomForCausalLM, tiny_bloom_dir, prompt, 6)
    got = run_core(tiny_bloom_dir, [prompt], 6, chunked=16)
    assert got == [want], f"got={got} want={want}"


@pytest.fixture(scope="module")
def tiny_mpt_dir(tmp_path_factory):
    import torch
    from transformers import MptConfig, MptForCausalLM

    torch.manual_seed(14)
    cfg = MptConfig(
        vocab_size=160,
        d_model=48,
        n_heads=6,
        n_layers=2,
        expansion_ratio=4,
    )
    model = MptForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_mpt")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_mpt_greedy_parity(tiny_mpt_dir):
    from transformers import MptForCausalLM

    rng = np.random.default_rng(67)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=13)],
    ]
    want = [hf_greedy(MptForCausalLM, tiny_mpt_dir, p, 8)
            for p in prompts]
    got = run_core(tiny_mpt_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"
