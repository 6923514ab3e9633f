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


@pytest.fixture(scope="module")
def tiny_lora_vocab_dir(tiny_llama_dir, tmp_path_factory):
    """Adapter that ALSO targets lm_head + embed_tokens (vocab-sized
    modules; ref srt/lora lm-head mixing)."""
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import LlamaForCausalLM

    torch.manual_seed(13)
    base = LlamaForCausalLM.from_pretrained(tiny_llama_dir)
    cfg = LoraConfig(
        r=4, lora_alpha=8,
        target_modules=["q_proj", "v_proj", "lm_head", "embed_tokens"],
        lora_dropout=0.0,
    )
    model = get_peft_model(base, cfg)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "lora_B" in name or "lora_embedding_B" in name:
                p.normal_(0, 0.05)
            elif "lora_A" in name or "lora_embedding_A" in name:
                p.normal_(0, 0.05)
    path = tmp_path_factory.mktemp("tiny_lora_vocab")
    model.save_pretrained(path)
    return str(path)


def test_lora_lm_head_and_embedding(tiny_llama_dir, tiny_lora_vocab_dir):
    """Greedy parity vs merged peft for an adapter spanning lm_head and
    embed_tokens, alongside a base-model request in the same batch."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    prompt = [11, 12, 13, 14, 15, 16]
    n_new = 6
    ref_lora = _hf_lora_greedy(tiny_llama_dir, tiny_lora_vocab_dir,
                               prompt, n_new)

    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=2048, enable_lora=True, max_lora_rank=8,
        lora_paths=[f"vocab={tiny_lora_vocab_dir}"],
        lora_target_modules=["lm_head", "embed_tokens"],
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, name in enumerate(["vocab", None]):
        sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                            ignore_eos=True)
        sp.normalize()
        r = Req(f"v{i}", list(prompt), sp, lora_id=name)
        reqs.append(r)
        core.add_request(r)
    while core.has_work():
        core.step()
    assert reqs[0].output_ids == ref_lora
    # the base-model request in the same batch is unaffected
    base_args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=2048,
    )
    br = ModelRunner(base_args)
    bc = ScheduleCore(base_args, br)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    rb = Req("b", list(prompt), sp)
    bc.add_request(rb)
    while bc.has_work():
        bc.step()
    assert reqs[1].output_ids == rb.output_ids


def test_lora_eviction_policy(tiny_llama_dir, tiny_lora_dir):
    """A full pool evicts the LRU unpinned adapter on load; pinned
    adapters survive (ref srt/lora/eviction_policy.py)."""
    from sglang_tpu.lora.manager import LoRAManager
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(model_path=tiny_llama_dir, dtype="float32",
                      page_size=4, max_total_tokens=512)
    runner = ModelRunner(args)
    mgr = LoRAManager(runner.model, runner.model_config, max_loras=2,
                      max_rank=8, dtype=runner.model_config.dtype)
    mgr.load("a", tiny_lora_dir)
    mgr.load("b", tiny_lora_dir)
    # touch "a" so "b" is LRU
    mgr.slot_of("a")
    mgr.load("c", tiny_lora_dir)  # evicts b
    assert set(mgr.adapters) == {"a", "c"}
    # pin both; a further load must fail
    mgr.pin("a")
    mgr.pin("c")
    with pytest.raises(RuntimeError, match="pinned"):
        mgr.load("d", tiny_lora_dir)
    mgr.unpin("c")
    mgr.load("d", tiny_lora_dir)  # evicts c (unpinned LRU)
    assert "a" in mgr.adapters and "d" in mgr.adapters


def test_lora_overlap_loading(tiny_llama_dir, tiny_lora_dir):
    """load_async publishes the slot only when complete; the adapter is
    usable right after the future resolves."""
    from sglang_tpu.lora.manager import LoRAManager
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(model_path=tiny_llama_dir, dtype="float32",
                      page_size=4, max_total_tokens=512)
    runner = ModelRunner(args)
    mgr = LoRAManager(runner.model, runner.model_config, max_loras=2,
                      max_rank=8, dtype=runner.model_config.dtype)
    fut = mgr.load_async("bg", tiny_lora_dir)
    slot = fut.result(timeout=120)
    assert mgr.slot_of("bg") == slot
    assert mgr.scalings[slot] == 2.0  # alpha 8 / r 4
