"""Gemma2 greedy parity vs HF (sandwich norms, softcaps, alternating SWA)."""

import pytest


def _build_tiny_gemma2(path=None):
    import tempfile

    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(3)
    cfg = Gemma2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,  # exercise both sliding and global layers
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        sliding_window=8,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        query_pre_attn_scalar=16,
    )
    model = Gemma2ForCausalLM(cfg)
    model.eval()
    if path is None:
        path = tempfile.mkdtemp(prefix="tiny_gemma2_")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def tiny_gemma2_dir(tmp_path_factory):
    return _build_tiny_gemma2(str(tmp_path_factory.mktemp("tiny_gemma2")))


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
    req = Req("g", prompt, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids


def test_gemma2_greedy_parity(tiny_gemma2_dir):
    # long enough that sliding-window layers actually clip context
    prompt = [(i * 13) % 120 + 3 for i in range(24)]
    ref = _hf_greedy(tiny_gemma2_dir, prompt, 10)
    ours = _our_greedy(tiny_gemma2_dir, prompt, 10)
    assert ours == ref, f"ours={ours} ref={ref}"


@pytest.fixture(scope="module")
def tiny_gemma3_dir(tmp_path_factory):
    import torch
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    torch.manual_seed(4)
    cfg = Gemma3TextConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=6,  # 5 sliding (local rope) + 1 global
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        sliding_window=8,
        query_pre_attn_scalar=16,
        rope_theta=1000000.0,
        rope_local_base_freq=10000.0,
        pad_token_id=0,
    )
    model = Gemma3ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_gemma3")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_gemma3_greedy_parity(tiny_gemma3_dir):
    prompt = [(i * 13) % 120 + 3 for i in range(24)]  # windows clip context
    ref = _hf_greedy(tiny_gemma3_dir, prompt, 10)
    ours = _our_greedy(tiny_gemma3_dir, prompt, 10)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"
