"""Greedy decode must be token-identical to HF transformers.

Ref test strategy: SURVEY.md §4 (accuracy parity against known-good
implementation). Exercises: weight loading, paged KV extend+decode,
xla_native attention, greedy sampling.
"""

import numpy as np
import pytest


def _hf_greedy(model_dir, prompt_ids, n_new):
    import torch
    from transformers import LlamaForCausalLM

    model = LlamaForCausalLM.from_pretrained(model_dir)
    model.eval()
    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt_ids]),
            max_new_tokens=n_new,
            do_sample=False,
            use_cache=True,
        )
    return out[0, len(prompt_ids):].tolist()


def _our_greedy(model_dir, prompt_ids, n_new, page_size=16, chunk=None):
    from sglang_tpu.model_exec.batch_builder import SeqInput, build_forward_batch
    from sglang_tpu.model_exec.forward_batch import ForwardMode
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_batch_info import build_sampling_tensors
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs
    from sglang_tpu.utils import cdiv

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=page_size,
        max_total_tokens=2048,
    )
    runner = ModelRunner(args)

    sp = SamplingParams(temperature=0.0)
    sp.normalize()

    # allocate pages for the whole sequence up front (test-local allocator)
    total_len = len(prompt_ids) + n_new
    pages = list(range(1, 1 + cdiv(total_len, page_size)))

    out_tokens = []
    # prefill (optionally chunked)
    chunks = [prompt_ids] if chunk is None else [
        prompt_ids[i : i + chunk] for i in range(0, len(prompt_ids), chunk)
    ]
    prefix = 0
    token = None
    trash = runner.trash_slot
    for ci, ch in enumerate(chunks):
        is_final = ci == len(chunks) - 1
        npages = cdiv(prefix + len(ch), page_size)
        fb = build_forward_batch(
            [SeqInput(ch, prefix, pages[:npages], req_slot=0 if is_final else -1)],
            page_size,
            ForwardMode.EXTEND,
            trash_slot=trash,
        )
        st = build_sampling_tensors([sp], [0], [0], fb.padded_bs)
        out = runner.forward(fb, st)
        token = int(np.asarray(out.next_tokens)[0])
        prefix += len(ch)
    out_tokens.append(token)

    for step in range(1, n_new):
        npages = cdiv(prefix + 1, page_size)
        fb = build_forward_batch(
            [SeqInput([token], prefix, pages[:npages], req_slot=0)],
            page_size,
            ForwardMode.DECODE,
            trash_slot=trash,
        )
        st = build_sampling_tensors([sp], [0], [step], fb.padded_bs)
        out = runner.forward(fb, st)
        token = int(np.asarray(out.next_tokens)[0])
        prefix += 1
        out_tokens.append(token)
    return out_tokens


def test_greedy_parity(tiny_llama_dir):
    prompt = [3, 17, 92, 45, 6, 88, 21, 101, 33, 7]
    n_new = 12
    ref = _hf_greedy(tiny_llama_dir, prompt, n_new)
    ours = _our_greedy(tiny_llama_dir, prompt, n_new)
    assert ours == ref, f"ours={ours} ref={ref}"


def test_greedy_parity_chunked_prefill(tiny_llama_dir):
    prompt = list(range(2, 50))
    n_new = 6
    ref = _hf_greedy(tiny_llama_dir, prompt, n_new)
    ours = _our_greedy(tiny_llama_dir, prompt, n_new, chunk=13)
    assert ours == ref, f"ours={ours} ref={ref}"
