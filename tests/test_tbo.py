"""Two-batch overlap (TBO) over the EP ragged-a2a dispatch.

Ref: srt/batch_overlap/two_batch_overlap.py:78 — the reference splits a
batch into two microbatches and hides one's MoE all-to-all under the
other's compute via CUDA streams. The TPU recast (layers/moe.py set_tbo)
expresses the two halves as independent dataflow chains inside one XLA
program; exactness must be unaffected.
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
    path = tmp_path_factory.mktemp("tiny_mixtral_tbo")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def tiny_dsv2_shared_dir(tmp_path_factory):
    """DeepSeek-V2 with a shared expert — the SBO target shape."""
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(6)
    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        q_lora_rank=None, kv_lora_rank=32,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, topk_method="group_limited_greedy",
        routed_scaling_factor=1.0, first_k_dense_replace=0,
        moe_layer_freq=1, max_position_embeddings=256, head_dim=24,
    )
    model = DeepseekV2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_dsv2_sbo")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def run_greedy(model_dir, tp_size, ep_size, prompt, n_new, a2a=None,
               tbo=False, sbo=False):
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
        enable_two_batch_overlap=tbo,
        enable_single_batch_overlap=sbo,
    )
    mesh_ctx = create_mesh(tp_size=tp_size, ep_size=ep_size)
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("tbo", prompt, sp)
    core.add_request(req)
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 300
    # Reset the module-level knobs so later tests in the process see the
    # default-off state.
    from sglang_tpu.layers.moe import set_sbo, set_tbo

    set_tbo(False)
    set_sbo(False)
    return req.output_ids


def test_tbo_exactness_ep2(tiny_mixtral_dir):
    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    ref = run_greedy(tiny_mixtral_dir, 1, 1, prompt, 8)
    tbo = run_greedy(tiny_mixtral_dir, 2, 2, prompt, 8, a2a="ragged",
                     tbo=True)
    assert tbo == ref, f"tbo={tbo} ref={ref}"


def test_tbo_exactness_ep4(tiny_mixtral_dir):
    prompt = [5, 9, 33, 71, 12, 64, 90, 2]
    ref = run_greedy(tiny_mixtral_dir, 1, 1, prompt, 6)
    tbo = run_greedy(tiny_mixtral_dir, 4, 4, prompt, 6, a2a="ragged",
                     tbo=True)
    assert tbo == ref, f"tbo={tbo} ref={ref}"


def test_sbo_exactness_ep2(tiny_dsv2_shared_dir):
    """SBO (ref batch_overlap/single_batch_overlap.py): shared-expert FFN
    computed inside the EP dispatch on local rows must not change greedy
    outputs."""
    prompt = [3, 17, 92, 45, 6, 88, 21, 101]
    ref = run_greedy(tiny_dsv2_shared_dir, 1, 1, prompt, 8)
    sbo = run_greedy(tiny_dsv2_shared_dir, 2, 2, prompt, 8, a2a="ragged",
                     sbo=True)
    assert sbo == ref, f"sbo={sbo} ref={ref}"


def test_sbo_with_tbo_ep2(tiny_dsv2_shared_dir):
    """SBO + TBO together: each TBO half carries its own shared chain."""
    prompt = [5, 9, 33, 71, 12, 64, 90, 2]
    ref = run_greedy(tiny_dsv2_shared_dir, 1, 1, prompt, 6)
    both = run_greedy(tiny_dsv2_shared_dir, 2, 2, prompt, 6, a2a="ragged",
                      tbo=True, sbo=True)
    assert both == ref, f"both={both} ref={ref}"


def test_sbo_noop_without_a2a(tiny_dsv2_shared_dir):
    """Padded EP (no ragged a2a): shared weights still replicated, FFN
    added structurally — outputs unchanged."""
    prompt = [3, 17, 92, 45, 6, 88]
    ref = run_greedy(tiny_dsv2_shared_dir, 1, 1, prompt, 6)
    out = run_greedy(tiny_dsv2_shared_dir, 2, 2, prompt, 6, sbo=True)
    assert out == ref


def test_tbo_noop_without_a2a(tiny_mixtral_dir):
    """TBO only applies to the ragged-a2a path; padded EP must still be
    exact with the flag set (the split is skipped)."""
    prompt = [3, 17, 92, 45, 6, 88]
    ref = run_greedy(tiny_mixtral_dir, 1, 1, prompt, 6)
    out = run_greedy(tiny_mixtral_dir, 2, 2, prompt, 6, tbo=True)
    assert out == ref
