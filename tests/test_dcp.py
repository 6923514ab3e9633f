"""Decode context parallelism (DCP): context pages sharded over the mesh
axis with a cross-chip LSE merge.

Ref: srt/layers/dcp/comm.py:15-22. Invariant: greedy outputs identical to
single-device execution — the LSE merge is exact.
"""

import numpy as np
import pytest


def run_greedy(model_dir, tp_size, prompt, n_new, dcp=False,
               kv_dtype="auto"):
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
        enable_dcp=dcp,
        kv_cache_dtype=kv_dtype,
    )
    mesh_ctx = create_mesh(tp_size=tp_size)
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("d", list(prompt), sp)
    core.add_request(req)
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 300
    return req.output_ids


def test_dcp_llama_matches_single_device(tiny_llama_dir):
    prompt = [3, 17, 92, 45, 6, 88, 21, 101, 55, 12]
    ref = run_greedy(tiny_llama_dir, 1, prompt, 8)
    dcp2 = run_greedy(tiny_llama_dir, 2, prompt, 8, dcp=True)
    assert dcp2 == ref, f"dcp2={dcp2} ref={ref}"
    dcp4 = run_greedy(tiny_llama_dir, 4, prompt, 8, dcp=True)
    assert dcp4 == ref, f"dcp4={dcp4} ref={ref}"


def test_dcp_with_fp8_kv(tiny_llama_dir):
    prompt = [9, 4, 77, 31, 6, 52]
    ref = run_greedy(tiny_llama_dir, 1, prompt, 6, kv_dtype="fp8_e5m2")
    dcp2 = run_greedy(tiny_llama_dir, 2, prompt, 6, dcp=True,
                      kv_dtype="fp8_e5m2")
    assert dcp2 == ref


def test_dcp_deepseek_mla(tmp_path_factory):
    """MLA decode over DCP: the latent head can't head-split; the context
    shard + LSE merge is how DeepSeek decode parallelizes."""
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(5)
    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        q_lora_rank=None, kv_lora_rank=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, n_group=2,
        topk_group=1, topk_method="group_limited_greedy",
        routed_scaling_factor=1.0, first_k_dense_replace=1,
        moe_layer_freq=1, max_position_embeddings=256, head_dim=24,
    )
    model = DeepseekV2ForCausalLM(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("tiny_dsv2_dcp"))
    model.save_pretrained(path, safe_serialization=True)

    prompt = [3, 17, 92, 45, 6, 88]
    ref = run_greedy(path, 1, prompt, 6)
    dcp2 = run_greedy(path, 2, prompt, 6, dcp=True)
    assert dcp2 == ref, f"dcp2={dcp2} ref={ref}"


def run_greedy_cp(model_dir, tp_size, prompt, n_new, cp=False,
                  backend="xla_native", cp_strategy="zigzag"):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.parallel.mesh import create_mesh
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend=backend,
        page_size=4,
        max_total_tokens=1024,
        tp_size=tp_size,
        enable_cp=cp,
        cp_strategy=cp_strategy,
    )
    mesh_ctx = create_mesh(tp_size=tp_size)
    runner = ModelRunner(args, mesh_ctx=mesh_ctx)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("c", list(prompt), sp)
    core.add_request(req)
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 300
    return req.output_ids


def test_cp_zigzag_prefill_matches_single_device(tiny_llama_dir):
    """Zigzag CP (ref layers/cp/zigzag.py): extend blocks dealt over the
    mesh; greedy outputs must be identical."""
    import numpy as np

    rng = np.random.default_rng(7)
    prompt = [int(t) for t in rng.integers(3, 200, size=40)]
    ref = run_greedy_cp(tiny_llama_dir, 1, prompt, 6)
    cp2 = run_greedy_cp(tiny_llama_dir, 2, prompt, 6, cp=True)
    assert cp2 == ref, f"cp2={cp2} ref={ref}"
    cp2p = run_greedy_cp(tiny_llama_dir, 2, prompt, 6, cp=True,
                         backend="pallas")
    assert cp2p == ref, f"cp2p={cp2p} ref={ref}"


def test_cp_interleave_prefill_matches_single_device(tiny_llama_dir):
    """Interleave CP (ref layers/cp/interleave.py): chip c owns every
    cpn-th extend block; greedy outputs must be identical."""
    import numpy as np

    rng = np.random.default_rng(8)
    prompt = [int(t) for t in rng.integers(3, 200, size=40)]
    ref = run_greedy_cp(tiny_llama_dir, 1, prompt, 6)
    il2 = run_greedy_cp(tiny_llama_dir, 2, prompt, 6, cp=True,
                        cp_strategy="interleave")
    assert il2 == ref, f"il2={il2} ref={ref}"


def test_dcp_pool_memory_sharded(tiny_llama_dir):
    """DCP now shards pool MEMORY: page dim distributed over the mesh
    axis (per-device bytes = 1/n) with the owner-aligned allocator;
    greedy parity must hold (interleave layout + LSE merge exact)."""
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.parallel.mesh import create_mesh
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=1024, tp_size=4, enable_dcp=True,
    )
    runner = ModelRunner(args, mesh_ctx=create_mesh(tp_size=4))
    assert runner.dcp_pool_sharded
    kp = runner.kv_pool.kv[0][0]
    spec = kp.sharding.spec
    assert spec[0] == "tp", spec
    NP = runner.kv_pool.config.num_pages
    # each device holds 1/4 of the pages
    shard = next(iter(kp.addressable_shards))
    assert shard.data.shape[0] == NP // 4
