"""Expert parallelism (EP-MoE): experts sharded over the tp-axis devices.

Ref: srt/layers/moe/ep_moe/. EP greedy outputs must equal single-device
(and plain MoE-TP) execution — the zero-weight padding-group formulation is
exact, not an approximation.
"""

import pytest


@pytest.fixture(scope="module")
def tiny_mixtral_dir(tmp_path_factory):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    cfg = MixtralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
    )
    model = MixtralForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_mixtral_ep")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def run_greedy(model_dir, tp_size, ep_size, prompt, n_new, a2a=None):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.parallel.mesh import create_mesh
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        tp_size=tp_size,
        ep_size=ep_size,
        moe_a2a_backend=a2a,
    )
    mesh_ctx = create_mesh(tp_size=tp_size, ep_size=ep_size)
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    req = Req("ep", prompt, sp)
    core.add_request(req)
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 300
    return req.output_ids


def test_ep2_matches_single_device(tiny_mixtral_dir):
    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    ref = run_greedy(tiny_mixtral_dir, 1, 1, prompt, 8)
    ep2 = run_greedy(tiny_mixtral_dir, 2, 2, prompt, 8)
    assert ep2 == ref, f"ep2={ep2} ref={ref}"


def test_ep4_matches_single_device(tiny_mixtral_dir):
    """One expert per shard (E == ep)."""
    prompt = [5, 9, 33, 71, 12, 64]
    ref = run_greedy(tiny_mixtral_dir, 1, 1, prompt, 6)
    ep4 = run_greedy(tiny_mixtral_dir, 4, 4, prompt, 6)
    assert ep4 == ref, f"ep4={ep4} ref={ref}"


def test_ep_ragged_a2a_matches_single_device(tiny_mixtral_dir):
    """Ragged all-to-all dispatch (each shard's GEMM reads ONLY the rows
    its experts own) must stay exact. Ref: srt/layers/moe/token_dispatcher.
    """
    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    ref = run_greedy(tiny_mixtral_dir, 1, 1, prompt, 8)
    a2a2 = run_greedy(tiny_mixtral_dir, 2, 2, prompt, 8, a2a="ragged")
    assert a2a2 == ref, f"a2a2={a2a2} ref={ref}"
    a2a4 = run_greedy(tiny_mixtral_dir, 4, 4, prompt, 8, a2a="ragged")
    assert a2a4 == ref, f"a2a4={a2a4} ref={ref}"


def test_invalid_ep_size_rejected():
    from sglang_tpu.parallel.mesh import create_mesh

    with pytest.raises(ValueError):
        create_mesh(tp_size=4, ep_size=2)
