"""Multi-LoRA batching parity vs HF peft (tiny random adapter).

Ref test strategy: test/registered/lora.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_lora_dir(tiny_llama_dir, tmp_path_factory):
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import LlamaForCausalLM

    torch.manual_seed(7)
    base = LlamaForCausalLM.from_pretrained(tiny_llama_dir)
    cfg = LoraConfig(
        r=4,
        lora_alpha=8,
        target_modules=["q_proj", "k_proj", "v_proj", "o_proj",
                        "gate_proj", "up_proj", "down_proj"],
        lora_dropout=0.0,
    )
    model = get_peft_model(base, cfg)
    # random non-zero B so the adapter actually changes outputs
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "lora_B" in name:
                p.normal_(0, 0.05)
            elif "lora_A" in name:
                p.normal_(0, 0.05)
    path = tmp_path_factory.mktemp("tiny_lora")
    model.save_pretrained(path)
    return str(path)


def _hf_lora_greedy(base_dir, lora_dir, prompt, n_new):
    import torch
    from peft import PeftModel
    from transformers import LlamaForCausalLM

    base = LlamaForCausalLM.from_pretrained(base_dir)
    model = PeftModel.from_pretrained(base, lora_dir)
    model = model.merge_and_unload()
    model.eval()
    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False
        )
    return out[0, len(prompt):].tolist()


def _our_lora_greedy(base_dir, lora_dir, prompts, n_new, lora_names):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=base_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
        enable_lora=True,
        max_lora_rank=8,
        lora_paths=[f"adapter={lora_dir}"],
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, (p, name) in enumerate(zip(prompts, lora_names)):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"l{i}", p, sp, lora_id=name)
        reqs.append(r)
        core.add_request(r)
    while core.has_work():
        core.step()
    return [r.output_ids for r in reqs]


def test_dynamic_lora_load_unload(tiny_llama_dir, tiny_lora_dir):
    """Dynamic /load_lora_adapter path: server starts WITHOUT LoRA, loads an
    adapter at runtime, serves with it, then unloads (ref lora_manager.py:221,
    http_server.py:1519)."""
    from sglang_tpu.entrypoints.engine import Engine

    eng = Engine(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
    )
    try:
        prompt = [3, 17, 92, 45, 6]
        n_new = 6
        sp = {"temperature": 0, "max_new_tokens": n_new, "ignore_eos": True}
        base_out = eng.generate(input_ids=prompt, sampling_params=sp)

        ok, msg, loaded = eng.load_lora_adapter("dyn", tiny_lora_dir)
        assert ok, msg
        assert "dyn" in loaded

        ref = _hf_lora_greedy(tiny_llama_dir, tiny_lora_dir, prompt, n_new)
        out = eng.generate(
            input_ids=prompt, sampling_params=sp, lora_path="dyn"
        )
        assert out["output_ids"] == ref
        assert out["output_ids"] != base_out["output_ids"]

        ok, msg, loaded = eng.unload_lora_adapter("dyn")
        assert ok and "dyn" not in loaded
        # unknown adapter now errors cleanly
        ok2, _, _ = eng.unload_lora_adapter("dyn")
        assert not ok2
    finally:
        eng.shutdown()


def test_lora_parity_and_mixed_batch(tiny_llama_dir, tiny_lora_dir):
    prompt_a = [3, 17, 92, 45, 6]
    prompt_b = [8, 9, 10, 11]
    n_new = 8
    ref_lora = _hf_lora_greedy(tiny_llama_dir, tiny_lora_dir, prompt_a, n_new)

    import torch
    from transformers import LlamaForCausalLM

    base = LlamaForCausalLM.from_pretrained(tiny_llama_dir)
    base.eval()
    with torch.no_grad():
        ref_base = base.generate(
            torch.tensor([prompt_b]), max_new_tokens=n_new, do_sample=False
        )[0, len(prompt_b):].tolist()

    # mixed batch: one request with the adapter, one without
    ours = _our_lora_greedy(
        tiny_llama_dir, tiny_lora_dir, [prompt_a, prompt_b], n_new,
        ["adapter", None],
    )
    assert ours[0] == ref_lora, f"{ours[0]} != {ref_lora}"
    assert ours[1] == ref_base, f"{ours[1]} != {ref_base}"
    assert ref_lora != ref_base  # adapter actually changed behavior
