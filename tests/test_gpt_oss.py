"""GPT-OSS greedy parity vs HF: attention sinks, alternating sliding/full
layers, biased projections, clamped-swiglu MoE with interleaved gate/up."""

import pytest


@pytest.fixture(scope="module")
def tiny_gptoss_dir(tmp_path_factory):
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(9)
    cfg = GptOssConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=48,
        num_hidden_layers=4,  # two sliding + two full layers
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=8,
        max_position_embeddings=256,
        rope_scaling=None,
        pad_token_id=0,
        tie_word_embeddings=False,
    )
    model = GptOssForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_gptoss")
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


def _our_greedy(model_dir, prompt, n_new, backend="xla_native"):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir, dtype="float32",
        attention_backend=backend, page_size=4, max_total_tokens=2048,
    )
    core = ScheduleCore(args, ModelRunner(args))
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    req = Req("g", prompt, sp)
    core.add_request(req)
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 300
    return req.output_ids


def test_gpt_oss_greedy_parity(tiny_gptoss_dir):
    # long enough that the sliding-window layers actually clip context
    prompt = [(i * 13) % 120 + 3 for i in range(20)]
    ref = _hf_greedy(tiny_gptoss_dir, prompt, 10)
    ours = _our_greedy(tiny_gptoss_dir, prompt, 10)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"


def test_gpt_oss_pallas_backend(tiny_gptoss_dir):
    """Hybrid pallas backend must fall back to the XLA sink path and match."""
    prompt = [(i * 11) % 120 + 3 for i in range(12)]
    ref = _our_greedy(tiny_gptoss_dir, prompt, 8, backend="xla_native")
    ours = _our_greedy(tiny_gptoss_dir, prompt, 8, backend="pallas")
    assert ours == ref


def test_yarn_rope_matches_hf():
    """apply_yarn_scaling must match HF _compute_yarn_parameters, including
    the GPT-OSS truncate=False variant and the DeepSeek mscale variant."""
    import numpy as np
    import torch
    from transformers import GptOssConfig
    from transformers.modeling_rope_utils import _compute_yarn_parameters

    from sglang_tpu.layers.rotary import apply_yarn_scaling

    cases = [
        {"rope_type": "yarn", "factor": 32.0, "beta_fast": 32.0,
         "beta_slow": 1.0, "truncate": False,
         "original_max_position_embeddings": 4096},
        {"rope_type": "yarn", "factor": 8.0,
         "original_max_position_embeddings": 2048},
        {"rope_type": "yarn", "factor": 40.0, "mscale": 1.0,
         "mscale_all_dim": 0.8,
         "original_max_position_embeddings": 4096},
    ]
    for sc in cases:
        cfg = GptOssConfig(
            hidden_size=256, num_attention_heads=4, head_dim=64,
            rope_theta=150000.0, max_position_embeddings=131072,
            rope_scaling=dict(sc), num_hidden_layers=1,
        )
        ref_inv, ref_att = _compute_yarn_parameters(cfg, torch.device("cpu"))
        ours_inv, ours_att = apply_yarn_scaling(64, 150000.0, sc, 131072)
        assert abs(ours_att - ref_att) < 1e-6, sc
        np.testing.assert_allclose(
            np.asarray(ours_inv), ref_inv.numpy(), rtol=1e-6
        )


def test_gpt_oss_yarn_parity(tiny_gptoss_dir, tmp_path):
    """Greedy parity with YARN rope enabled on the tiny config."""
    import json
    import shutil

    import pytest

    src = tiny_gptoss_dir
    dst = tmp_path / "gptoss_yarn"
    shutil.copytree(src, dst)
    cfg = json.loads((dst / "config.json").read_text())
    cfg["rope_scaling"] = {
        "rope_type": "yarn", "factor": 4.0, "beta_fast": 32.0,
        "beta_slow": 1.0, "truncate": False,
        "original_max_position_embeddings": 64,
    }
    (dst / "config.json").write_text(json.dumps(cfg))
    prompt = [(i * 7) % 120 + 3 for i in range(16)]
    ref = _hf_greedy(str(dst), prompt, 8)
    ours = _our_greedy(str(dst), prompt, 8)
    assert len(ref) >= 4
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"
