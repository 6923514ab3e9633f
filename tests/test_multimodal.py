"""Multimodal embedding injection: parity vs HF inputs_embeds forward,
plus mm-aware radix keys (same placeholders, different images).

Ref: srt/multimodal/ + mm_utils embedding splice; GenerateReqInput.mm_hashes.
"""

import numpy as np
import pytest

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs

IMG_TOKEN = 100  # placeholder id


def make_core(model_dir):
    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
    )
    return ScheduleCore(args, ModelRunner(args))


def run_mm(core, rid, prompt, mm_positions, mm_embeds, n_new):
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    req = Req(rid, prompt, sp)
    req.mm_positions = mm_positions
    req.mm_embeds = mm_embeds
    core.add_request(req)
    while core.has_work():
        core.step()
    return req


def hf_mm_greedy(model_dir, prompt, positions, embeds, n_new):
    import torch
    from transformers import LlamaForCausalLM

    model = LlamaForCausalLM.from_pretrained(model_dir)
    model.eval()
    emb = model.get_input_embeddings()(torch.tensor([prompt]))
    for j, pos in enumerate(positions):
        emb[0, pos] = torch.tensor(embeds[j])
    with torch.no_grad():
        out = model.generate(
            inputs_embeds=emb, max_new_tokens=n_new, do_sample=False
        )
    return out[0].tolist()  # with inputs_embeds HF returns only new tokens


def test_mm_embedding_parity(tiny_llama_dir):
    rng = np.random.default_rng(0)
    prompt = [5, 6, IMG_TOKEN, IMG_TOKEN, 9, 10]
    positions = [2, 3]
    embeds = (rng.standard_normal((2, 64)) * 0.3).astype(np.float32)
    ref = hf_mm_greedy(tiny_llama_dir, prompt, positions, embeds, 8)
    core = make_core(tiny_llama_dir)
    req = run_mm(core, "mm1", prompt, positions, embeds, 8)
    assert req.output_ids == ref, f"{req.output_ids} != {ref}"


def test_mm_radix_keys_distinguish_images(tiny_llama_dir):
    """Identical placeholder prompts with DIFFERENT embeddings must not
    poison each other through the prefix cache."""
    rng = np.random.default_rng(1)
    prompt = [5, 6, IMG_TOKEN, IMG_TOKEN, 9, 10, 11, 12]
    positions = [2, 3]
    e1 = (rng.standard_normal((2, 64)) * 0.3).astype(np.float32)
    e2 = (rng.standard_normal((2, 64)) * 0.3).astype(np.float32)

    core = make_core(tiny_llama_dir)
    r1 = run_mm(core, "a", prompt, positions, e1, 6)
    r2 = run_mm(core, "b", prompt, positions, e2, 6)
    # independent engines as ground truth
    ref1 = run_mm(make_core(tiny_llama_dir), "a2", prompt, positions, e1, 6)
    ref2 = run_mm(make_core(tiny_llama_dir), "b2", prompt, positions, e2, 6)
    assert r1.output_ids == ref1.output_ids
    assert r2.output_ids == ref2.output_ids
    assert r1.output_ids != r2.output_ids or e1.tobytes() == e2.tobytes()
    # same image again -> radix hit
    r3 = run_mm(core, "c", prompt, positions, e1, 6)
    assert r3.output_ids == ref1.output_ids
    assert r3.cached_len > 0


def test_input_embeds_api(tiny_llama_dir):
    """/generate with input_embeds: embeddings of real tokens must produce
    the same greedy output as the tokens themselves (ref
    GenerateReqInput.input_embeds)."""
    import numpy as np

    from sglang_tpu.entrypoints.engine import Engine

    eng = Engine(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
        max_running_requests=8,
        enable_single_process=True,
        log_level="warning",
    )
    try:
        import safetensors.numpy

        weights = safetensors.numpy.load_file(
            f"{tiny_llama_dir}/model.safetensors"
        )
        embed = weights["model.embed_tokens.weight"]  # [V, H]
        ids = [11, 12, 13, 14, 15]
        sp = {"temperature": 0, "max_new_tokens": 6, "ignore_eos": True}
        ref = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
        out = eng.generate(
            input_embeds=embed[ids].tolist(), sampling_params=sp
        )["output_ids"]
        assert out == ref, (out, ref)
    finally:
        eng.shutdown()
