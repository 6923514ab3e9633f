"""Recurrent-state checkpoint cache (mamba/hybrid radix cache).

Ref: srt/mem_cache/mamba_radix_cache.py — the reference anchors a mamba
state per radix TreeNode so hybrid models keep prefix caching. Here the
checkpoints are extra rows in the state pools (mem/state_ckpt.py); these
tests prove a cache-HIT extend produces the same greedy tokens as a cold
run (and as HF), for both a hybrid (Jamba: paged attention + SSM) and a
pure-recurrent (Mamba) model, including the unaligned-tail adoption path.
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
    path = tmp_path_factory.mktemp("tiny_jamba_ckpt")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


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
    path = tmp_path_factory.mktemp("tiny_mamba_ckpt")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def hf_greedy(model_dir, prompt, n_new):
    """Manual greedy loop — unlike generate(), never stops at EOS (the
    scheduler side runs with ignore_eos=True)."""
    import torch
    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(model_dir)
    hf.eval()
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(n_new):
            logits = hf(input_ids=torch.tensor([ids])).logits[0, -1]
            ids.append(int(logits.argmax()))
    return ids[len(prompt):]


def make_core(model_dir, n_ckpt=32):
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        max_running_requests=8,
        num_state_checkpoints=n_ckpt,
    )
    runner = ModelRunner(args)
    return ScheduleCore(args, runner)


def run_one(core, prompt, n_new, rid):
    from sglang_tpu.core.req import Req
    from sglang_tpu.sampling.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    r = Req(rid, list(prompt), sp)
    core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 500
    return r.output_ids


def _shared_prefix_case(rng_seed):
    """Prompt A (length 11 = 2 pages + 3 unaligned tail at page_size 4),
    then prompt B extending A — B must restore A's prompt checkpoint."""
    rng = np.random.default_rng(rng_seed)
    pa = [int(t) for t in rng.integers(3, 150, size=11)]
    pb = pa + [int(t) for t in rng.integers(3, 150, size=5)]
    return pa, pb


def test_hybrid_state_ckpt_hit_parity(tiny_jamba_dir):
    pa, pb = _shared_prefix_case(8)
    core = make_core(tiny_jamba_dir)
    assert core.state_ckpt is not None
    out_a = run_one(core, pa, 6, "a")
    assert core.state_ckpt.saves >= 1
    out_b = run_one(core, pb, 6, "b")
    assert core.state_ckpt.hits >= 1, "warm request missed the checkpoint"
    assert out_a == hf_greedy(tiny_jamba_dir, pa, 6)
    assert out_b == hf_greedy(tiny_jamba_dir, pb, 6)


def test_hybrid_ckpt_vs_cold_run(tiny_jamba_dir):
    """The cache-hit extend must be token-identical to a cold core."""
    pa, pb = _shared_prefix_case(12)
    warm = make_core(tiny_jamba_dir)
    run_one(warm, pa, 4, "a")
    warm_b = run_one(warm, pb, 8, "b")
    assert warm.state_ckpt.hits >= 1
    cold = make_core(tiny_jamba_dir, n_ckpt=0)
    assert cold.state_ckpt is None  # prefix caching fully off
    cold_b = run_one(cold, pb, 8, "b")
    assert warm_b == cold_b


def test_pure_recurrent_ckpt_hit_parity(tiny_mamba_dir):
    pa, pb = _shared_prefix_case(21)
    core = make_core(tiny_mamba_dir)
    assert core.state_ckpt is not None
    out_a = run_one(core, pa, 6, "a")
    out_b = run_one(core, pb, 6, "b")
    assert core.state_ckpt.hits >= 1
    assert out_a == hf_greedy(tiny_mamba_dir, pa, 6)
    assert out_b == hf_greedy(tiny_mamba_dir, pb, 6)


def test_ckpt_lru_eviction(tiny_mamba_dir):
    """With 2 slots, three distinct prompts roll the LRU; every run stays
    HF-correct and a repeat of the most recent prompt family still hits."""
    core = make_core(tiny_mamba_dir, n_ckpt=2)
    rng = np.random.default_rng(5)
    prompts = [
        [int(t) for t in rng.integers(3, 150, size=9)] for _ in range(3)
    ]
    for i, p in enumerate(prompts):
        out = run_one(core, p, 4, f"p{i}")
        assert out == hf_greedy(tiny_mamba_dir, p, 4)
    assert len(core.state_ckpt.by_node) <= 2
    pb = prompts[-1] + [7, 8, 9]
    out_b = run_one(core, pb, 4, "warm")
    assert core.state_ckpt.hits >= 1
    assert out_b == hf_greedy(tiny_mamba_dir, pb, 4)
