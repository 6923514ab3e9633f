"""Greedy parity vs HF for the round-3 model-zoo sweep:
GLM, GLM-4, EXAONE-4, SmolLM3, Arcee, ERNIE-4.5, Nemotron, Phi, GPT-2,
GPT-NeoX. Ref test strategy: SURVEY.md §4 (token-identical greedy vs the
known-good HF implementation, through the full scheduler)."""

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
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("m", prompt, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids


def _save(tmp_path_factory, tag, model):
    model.eval()
    path = tmp_path_factory.mktemp(tag)
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def _check(model_dir, n_new=10, stride=5):
    prompt = [(i * stride) % 120 + 3 for i in range(14)]
    ref = _hf_greedy(model_dir, prompt, n_new)
    ours = _our_greedy(model_dir, prompt, n_new)
    assert len(ref) >= 5
    assert ours[: len(ref)] == ref, f"ours={ours} ref={ref}"


COMMON = dict(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=256, pad_token_id=0,
)


def test_glm_parity(tmp_path_factory):
    import torch
    from transformers import GlmConfig, GlmForCausalLM

    torch.manual_seed(20)
    cfg = GlmConfig(**COMMON, head_dim=16, partial_rotary_factor=0.5,
                    attention_bias=True)
    _check(_save(tmp_path_factory, "tiny_glm", GlmForCausalLM(cfg)))


def test_glm4_parity(tmp_path_factory):
    import torch
    from transformers import Glm4Config, Glm4ForCausalLM

    torch.manual_seed(21)
    cfg = Glm4Config(**COMMON, head_dim=16, partial_rotary_factor=0.5,
                     attention_bias=True)
    _check(_save(tmp_path_factory, "tiny_glm4", Glm4ForCausalLM(cfg)))


def test_exaone4_parity(tmp_path_factory):
    import torch
    from transformers import Exaone4Config, Exaone4ForCausalLM

    torch.manual_seed(22)
    cfg = dict(COMMON)
    cfg["num_hidden_layers"] = 4  # 3 sliding + 1 global (NoPE)
    cfg = Exaone4Config(**cfg, sliding_window=8, sliding_window_pattern=4)
    _check(_save(tmp_path_factory, "tiny_exaone4", Exaone4ForCausalLM(cfg)),
           stride=13)


def test_smollm3_parity(tmp_path_factory):
    import torch
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    torch.manual_seed(23)
    cfg = SmolLM3Config(**COMMON, no_rope_layer_interval=2)
    _check(_save(tmp_path_factory, "tiny_smollm3", SmolLM3ForCausalLM(cfg)))


def test_arcee_parity(tmp_path_factory):
    import torch
    from transformers import ArceeConfig, ArceeForCausalLM

    torch.manual_seed(24)
    cfg = ArceeConfig(**COMMON)
    _check(_save(tmp_path_factory, "tiny_arcee", ArceeForCausalLM(cfg)))


def test_ernie45_parity(tmp_path_factory):
    import torch
    from transformers import Ernie4_5Config, Ernie4_5ForCausalLM

    torch.manual_seed(25)
    cfg = Ernie4_5Config(**COMMON)
    _check(_save(tmp_path_factory, "tiny_ernie45",
                 Ernie4_5ForCausalLM(cfg)))


def test_nemotron_parity(tmp_path_factory):
    import torch
    from transformers import NemotronConfig, NemotronForCausalLM

    torch.manual_seed(26)
    cfg = NemotronConfig(**COMMON, partial_rotary_factor=0.5,
                         hidden_act="relu2")
    _check(_save(tmp_path_factory, "tiny_nemotron",
                 NemotronForCausalLM(cfg)))


def test_phi_parity(tmp_path_factory):
    import torch
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(27)
    cfg = PhiConfig(**COMMON, partial_rotary_factor=0.5)
    _check(_save(tmp_path_factory, "tiny_phi", PhiForCausalLM(cfg)))


def test_gpt2_parity(tmp_path_factory):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(28)
    cfg = GPT2Config(
        vocab_size=128, n_embd=64, n_layer=2, n_head=4, n_positions=256,
        pad_token_id=0,
    )
    _check(_save(tmp_path_factory, "tiny_gpt2", GPT2LMHeadModel(cfg)))


@pytest.mark.parametrize("parallel", [True, False])
def test_gpt_neox_parity(tmp_path_factory, parallel):
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(29)
    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=256, rotary_pct=0.25,
        use_parallel_residual=parallel,
    )
    _check(_save(tmp_path_factory, f"tiny_neox{int(parallel)}",
                 GPTNeoXForCausalLM(cfg)))
