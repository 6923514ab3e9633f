"""DeepSeek-V2 (MLA + grouped-top-k MoE) greedy parity vs HF."""

import pytest


@pytest.fixture(scope="module")
def tiny_dsv2_dir(tmp_path_factory):
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(5)
    cfg = DeepseekV2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        q_lora_rank=None,
        kv_lora_rank=32,
        n_routed_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        n_group=2,
        topk_group=1,
        topk_method="group_limited_greedy",
        routed_scaling_factor=1.0,
        first_k_dense_replace=1,
        moe_layer_freq=1,
        max_position_embeddings=256,
        head_dim=24,
    )
    model = DeepseekV2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_dsv2")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def _hf_greedy(model_dir, prompt, n_new):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_dir, attn_implementation="eager"
    )
    model.eval()
    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False
        )
    return out[0, len(prompt):].tolist()


def _our_greedy(model_dir, prompt, n_new):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
    )
    core = ScheduleCore(args, ModelRunner(args))
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    req = Req("d", prompt, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids


def test_deepseek_v2_greedy_parity(tiny_dsv2_dir):
    prompt = [3, 17, 92, 45, 6, 88, 21, 101, 9, 54]
    ref = _hf_greedy(tiny_dsv2_dir, prompt, 10)
    ours = _our_greedy(tiny_dsv2_dir, prompt, 10)
    assert ours == ref, f"ours={ours} ref={ref}"


def test_deepseek_v2_yarn_parity(tiny_dsv2_dir, tmp_path):
    """Real V2/V3 checkpoints extend context with YaRN (mscale_all_dim
    variant): greedy parity must hold with yarn enabled."""
    import json
    import shutil

    src = tiny_dsv2_dir
    dst = tmp_path / "dsv2_yarn"
    shutil.copytree(src, dst)
    cfg = json.loads((dst / "config.json").read_text())
    cfg["rope_scaling"] = {
        "type": "yarn", "factor": 4.0, "beta_fast": 32, "beta_slow": 1,
        "mscale": 0.707, "mscale_all_dim": 0.707,
        "original_max_position_embeddings": 64,
    }
    (dst / "config.json").write_text(json.dumps(cfg))
    prompt = [(i * 9) % 120 + 3 for i in range(12)]
    ref = _hf_greedy(str(dst), prompt, 8)
    ours = _our_greedy(str(dst), prompt, 8)
    assert len(ref) >= 4
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"


def test_mla_latent_pool_shape_and_pallas_parity(tiny_dsv2_dir):
    """The MLA pool stores ONE latent row per token (kv_lora+rope wide),
    and the pallas backend (kernel write + ragged extend, interpret mode)
    matches the xla_native path token-for-token."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    prompt = [5, 9, 33, 70, 2, 41, 8, 19, 77, 23, 64, 12]

    outs = {}
    for backend in ("xla_native", "pallas"):
        args = ServerArgs(
            model_path=tiny_dsv2_dir,
            dtype="float32",
            attention_backend=backend,
            page_size=4,
            max_total_tokens=2048,
        )
        runner = ModelRunner(args)
        cfg = runner.kv_pool.config
        assert cfg.mla_dim == 32 + 8  # kv_lora_rank + qk_rope_head_dim
        latent, none_v = runner.kv_pool.kv[0]
        assert none_v is None
        assert latent.shape[2:] == (2, cfg.mla_dim // 2)
        core = ScheduleCore(args, runner)
        sp = SamplingParams(temperature=0.0, max_new_tokens=8,
                            ignore_eos=True)
        sp.normalize()
        req = Req(f"mla-{backend}", list(prompt), sp)
        core.add_request(req)
        while core.has_work():
            core.step()
        outs[backend] = req.output_ids
    assert outs["pallas"] == outs["xla_native"]


def test_deepseek_nextn_draft_matches_plain_greedy(tiny_dsv2_dir):
    """MTP/NextN draft head (dummy weights) through the EAGLE protocol:
    outputs must equal plain greedy decoding, and the draft's 1-layer MLA
    latent pool must stay in sync (ref srt/models/deepseek_nextn.py)."""
    import numpy as np

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    def run(spec):
        kw = dict(
            model_path=tiny_dsv2_dir,
            dtype="float32",
            attention_backend="xla_native",
            page_size=4,
            max_total_tokens=2048,
        )
        if spec:
            kw.update(
                speculative_algorithm="EAGLE",
                speculative_num_draft_tokens=3,
            )
        args = ServerArgs(**kw)
        runner = ModelRunner(args)
        core = ScheduleCore(args, runner)
        rng = np.random.default_rng(17)
        prompts = [[int(t) for t in rng.integers(3, 120, size=8)],
                   [int(t) for t in rng.integers(3, 120, size=11)]]
        reqs = []
        for i, p in enumerate(prompts):
            sp = SamplingParams(temperature=0.0, max_new_tokens=8,
                                ignore_eos=True)
            sp.normalize()
            r = Req(f"n{i}", p, sp)
            reqs.append(r)
            core.add_request(r)
        steps = 0
        while core.has_work():
            core.step()
            steps += 1
            assert steps < 500
        return [r.output_ids for r in reqs], core

    plain, _ = run(False)
    spec, core = run(True)
    assert spec == plain
    assert core.num_spec_steps > 0
    from sglang_tpu.models.deepseek_nextn import DeepseekNextN

    assert isinstance(core.draft_worker.model, DeepseekNextN)


def test_deepseek_v3_sigmoid_routing_parity(tmp_path_factory):
    """DeepSeek-V3 noaux_tc routing: sigmoid scores + e_score_correction
    bias, top-2-sum group scores, renormalize (HF DeepseekV3TopkRouter)."""
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(6)
    cfg = DeepseekV3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        q_lora_rank=None, kv_lora_rank=32,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=2.5, first_k_dense_replace=1,
        max_position_embeddings=256,
    )
    model = DeepseekV3ForCausalLM(cfg)
    with torch.no_grad():
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.3, 0.3)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_dsv3")
    model.save_pretrained(path, safe_serialization=True)
    prompt = [3, 14, 15, 9, 26, 5, 35, 89, 79, 32, 38, 46]
    ref = _hf_greedy(str(path), prompt, 8)
    ours = _our_greedy(str(path), prompt, 8)
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"
