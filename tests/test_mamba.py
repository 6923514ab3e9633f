"""Mamba (selective SSM) with recurrent state pool: HF greedy parity.

Ref: srt/layers/attention/mamba/ + HF MambaForCausalLM. The state-pool
design (slot-indexed conv/ssm states, scan-from-state chunks) must
produce byte-identical greedy tokens to HF, including through chunked
prefill and multi-request batches (state isolation across slots).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_mamba_dir(tmp_path_factory):
    import torch
    from transformers import MambaConfig, MambaForCausalLM

    torch.manual_seed(3)
    cfg = MambaConfig(
        vocab_size=160,
        hidden_size=48,
        state_size=8,
        num_hidden_layers=2,
        conv_kernel=4,
        expand=2,
        time_step_rank=8,
    )
    model = MambaForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_mamba")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def hf_greedy(model_dir, prompt, n_new):
    import torch
    from transformers import MambaForCausalLM

    hf = MambaForCausalLM.from_pretrained(model_dir)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]), max_new_tokens=n_new,
            do_sample=False,
        )
    return out[0, len(prompt):].tolist()


def run_core(model_dir, prompts, n_new, chunked=None, return_logprob=False):
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
        r = Req(f"m{i}", list(p), sp, return_logprob=return_logprob)
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return [r.output_ids for r in reqs]


def test_mamba_greedy_parity(tiny_mamba_dir):
    rng = np.random.default_rng(5)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)],
        [int(t) for t in rng.integers(3, 150, size=14)],
        [int(t) for t in rng.integers(3, 150, size=5)],
    ]
    want = [hf_greedy(tiny_mamba_dir, p, 8) for p in prompts]
    got = run_core(tiny_mamba_dir, prompts, 8)
    assert got == want, f"got={got} want={want}"


def test_mamba_chunked_prefill_state_carry(tiny_mamba_dir):
    """Prompt longer than the chunk: conv + ssm states must carry across
    chunks exactly."""
    rng = np.random.default_rng(6)
    prompt = [int(t) for t in rng.integers(3, 150, size=37)]
    want = hf_greedy(tiny_mamba_dir, prompt, 6)
    got = run_core(tiny_mamba_dir, [prompt], 6, chunked=16)
    assert got == [want], f"got={got} want={want}"


def test_mamba_chunked_prefill_numeric_parity(tiny_mamba_dir):
    """Chunked prefill must match unchunked NUMERICALLY (logprobs), not
    just in argmax: a wrong conv-state entry for mid-chunk offsets
    (tokens 1..K-2 of a continuation chunk) shifts logits without
    necessarily flipping the greedy token on a tiny model."""
    rng = np.random.default_rng(11)
    # 18 tokens with chunk 16: the second chunk has 2 tokens, so its
    # offset-1 token reads conv state across the chunk boundary.
    prompt = [int(t) for t in rng.integers(3, 150, size=18)]

    def lps(chunked):
        from sglang_tpu.core.req import Req
        from sglang_tpu.core.schedule_core import ScheduleCore
        from sglang_tpu.model_exec.model_runner import ModelRunner
        from sglang_tpu.sampling.sampling_params import SamplingParams
        from sglang_tpu.server_args import ServerArgs

        kw = dict(model_path=tiny_mamba_dir, dtype="float32",
                  attention_backend="xla_native", page_size=4,
                  max_total_tokens=1024, max_running_requests=8)
        if chunked:
            kw["chunked_prefill_size"] = chunked
        core = ScheduleCore(ServerArgs(**kw), ModelRunner(ServerArgs(**kw)))
        sp = SamplingParams(temperature=0.0, max_new_tokens=4,
                            ignore_eos=True)
        sp.normalize()
        r = Req("m0", list(prompt), sp, return_logprob=True)
        core.add_request(r)
        steps = 0
        while core.has_work():
            core.step()
            steps += 1
            assert steps < 200
        return r.output_ids, np.asarray(r.output_logprobs, np.float64)

    ids_full, lp_full = lps(None)
    ids_chunk, lp_chunk = lps(16)
    assert ids_full == ids_chunk
    np.testing.assert_allclose(lp_chunk, lp_full, rtol=0, atol=2e-4)


def test_mamba_sequential_requests_state_isolation(tiny_mamba_dir):
    """A slot reused by a second request must start from zero state."""
    rng = np.random.default_rng(7)
    p1 = [int(t) for t in rng.integers(3, 150, size=8)]
    p2 = [int(t) for t in rng.integers(3, 150, size=8)]
    want2 = hf_greedy(tiny_mamba_dir, p2, 6)
    got = run_core(tiny_mamba_dir, [p1], 6)
    # same core, second request reuses slot 0
    from sglang_tpu.core.req import Req  # noqa: F401
    got12 = run_core(tiny_mamba_dir, [p1, p2], 6)
    assert got12[1] == want2
