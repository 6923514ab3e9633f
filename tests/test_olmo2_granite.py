"""OLMo-2 and Granite greedy parity vs HF transformers."""

import pytest


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
        model_path=model_dir, dtype="float32",
        attention_backend="xla_native", page_size=4, max_total_tokens=2048,
    )
    core = ScheduleCore(args, ModelRunner(args))
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    req = Req("m", prompt, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids


@pytest.fixture(scope="module")
def tiny_olmo2_dir(tmp_path_factory):
    import torch
    from transformers import Olmo2Config, Olmo2ForCausalLM

    torch.manual_seed(7)
    cfg = Olmo2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, pad_token_id=0,
    )
    model = Olmo2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_olmo2")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def tiny_granite_dir(tmp_path_factory):
    import torch
    from transformers import GraniteConfig, GraniteForCausalLM

    torch.manual_seed(8)
    cfg = GraniteConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, pad_token_id=0,
        embedding_multiplier=6.0, attention_multiplier=0.12,
        residual_multiplier=0.5, logits_scaling=4.0,
        tie_word_embeddings=False,
    )
    model = GraniteForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_granite")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_olmo2_greedy_parity(tiny_olmo2_dir):
    prompt = [(i * 5) % 120 + 3 for i in range(14)]
    ref = _hf_greedy(tiny_olmo2_dir, prompt, 10)
    ours = _our_greedy(tiny_olmo2_dir, prompt, 10)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"


def test_granite_greedy_parity(tiny_granite_dir):
    prompt = [(i * 3) % 120 + 3 for i in range(14)]
    ref = _hf_greedy(tiny_granite_dir, prompt, 10)
    ours = _our_greedy(tiny_granite_dir, prompt, 10)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"


@pytest.fixture(scope="module")
def tiny_starcoder2_dir(tmp_path_factory):
    import torch
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    torch.manual_seed(9)
    cfg = Starcoder2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, pad_token_id=0, sliding_window=16,
    )
    model = Starcoder2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_starcoder2")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_starcoder2_greedy_parity(tiny_starcoder2_dir):
    prompt = [(i * 7) % 120 + 3 for i in range(24)]  # exceeds the window
    ref = _hf_greedy(tiny_starcoder2_dir, prompt, 10)
    ours = _our_greedy(tiny_starcoder2_dir, prompt, 10)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"


@pytest.fixture(scope="module")
def tiny_cohere2_dir(tmp_path_factory):
    import torch
    from transformers import Cohere2Config, Cohere2ForCausalLM

    torch.manual_seed(10)
    cfg = Cohere2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4,  # 3 sliding (rope) + 1 full (NoPE)
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, pad_token_id=0, sliding_window=8,
        logit_scale=0.25,
    )
    model = Cohere2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_cohere2")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_cohere2_greedy_parity(tiny_cohere2_dir):
    prompt = [(i * 13) % 120 + 3 for i in range(20)]  # exceeds the window
    ref = _hf_greedy(tiny_cohere2_dir, prompt, 10)
    ours = _our_greedy(tiny_cohere2_dir, prompt, 10)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"


@pytest.fixture(scope="module")
def tiny_stablelm_dir(tmp_path_factory):
    import torch
    from transformers import StableLmConfig, StableLmForCausalLM

    torch.manual_seed(11)
    cfg = StableLmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, pad_token_id=0,
        partial_rotary_factor=0.25, use_qkv_bias=True,
    )
    model = StableLmForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_stablelm")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_stablelm_greedy_parity(tiny_stablelm_dir):
    prompt = [(i * 11) % 120 + 3 for i in range(14)]
    ref = _hf_greedy(tiny_stablelm_dir, prompt, 10)
    ours = _our_greedy(tiny_stablelm_dir, prompt, 10)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"


@pytest.fixture(scope="module")
def tiny_olmo_dir(tmp_path_factory):
    import torch
    from transformers import OlmoConfig, OlmoForCausalLM

    torch.manual_seed(12)
    cfg = OlmoConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, pad_token_id=0, clip_qkv=5.0,
    )
    model = OlmoForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_olmo")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_olmo_greedy_parity(tiny_olmo_dir):
    prompt = [(i * 17) % 120 + 3 for i in range(14)]
    ref = _hf_greedy(tiny_olmo_dir, prompt, 10)
    ours = _our_greedy(tiny_olmo_dir, prompt, 10)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"
