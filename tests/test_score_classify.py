"""/v1/score, /classify, /pause_generation API surfaces.

Ref: openai/serving_score.py, http_server.py /classify + /pause_generation.
"""

import numpy as np
import pytest


def test_score_label_probs_match_hf(tiny_llama_dir):
    """Engine.score: label-token probabilities at the next-token position
    must equal HF's softmax at those ids."""
    import torch
    from transformers import AutoModelForCausalLM

    from sglang_tpu.entrypoints.engine import Engine

    query = [3, 11, 7, 5]
    items = [[2, 9], [4, 8, 6]]
    labels = [10, 20, 30]

    hf = AutoModelForCausalLM.from_pretrained(tiny_llama_dir)
    hf.eval()
    want = []
    for it in items:
        ids = torch.tensor([query + it])
        with torch.no_grad():
            logits = hf(input_ids=ids).logits[0, -1]
        p = torch.softmax(logits.float(), dim=-1)[labels]
        want.append(p.numpy())

    engine = Engine(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        skip_tokenizer_init=True,
        enable_single_process=True,
    )
    try:
        got = engine.score(query, items, labels)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=2e-3, atol=1e-5)
        # apply_softmax renormalizes over the label subset
        got_sm = engine.score(query, items, labels, apply_softmax=True)
        for g, w in zip(got_sm, want):
            np.testing.assert_allclose(g, w / w.sum(), rtol=2e-3, atol=1e-5)
    finally:
        engine.shutdown()


@pytest.fixture(scope="module")
def tiny_classifier_dir(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForSequenceClassification

    torch.manual_seed(9)
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        num_labels=3,
        pad_token_id=0,
    )
    model = LlamaForSequenceClassification(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_cls")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_classify_logits_match_hf(tiny_classifier_dir):
    import torch
    from transformers import LlamaForSequenceClassification as HFCls

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    prompt = [3, 11, 7, 5, 2]
    hf = HFCls.from_pretrained(tiny_classifier_dir)
    hf.eval()
    with torch.no_grad():
        want = hf(input_ids=torch.tensor([prompt])).logits[0].numpy()

    args = ServerArgs(
        model_path=tiny_classifier_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(max_new_tokens=1)
    sp.normalize()
    r = Req("c", list(prompt), sp)
    r.is_embedding = True
    core.add_request(r)
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 50
    np.testing.assert_allclose(
        np.asarray(r.embedding), want, rtol=2e-4, atol=2e-4
    )


def test_pause_and_continue(tiny_llama_dir):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
    sp.normalize()
    r = Req("p", [3, 5, 7], sp)
    core.paused = True
    core.add_request(r)
    for _ in range(10):
        core.step()
    assert r.output_ids == []  # nothing launches while paused
    core.paused = False
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 100
    assert len(r.output_ids) == 4


def test_deterministic_inference_batch_invariance(tiny_llama_dir):
    """--enable-deterministic-inference: a request's greedy output must
    not depend on what it is co-batched with (every batch pads to the
    largest bucket; cascade off)."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs
    from sglang_tpu.utils import set_deterministic_buckets

    args = ServerArgs(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=4096,
        max_running_requests=8,
        enable_deterministic_inference=True,
    )
    try:
        runner = ModelRunner(args)
        core = ScheduleCore(args, runner)
        assert not core.cascade_enabled

        def run(prompts):
            reqs = []
            for i, p in enumerate(prompts):
                sp = SamplingParams(temperature=0.0, max_new_tokens=6,
                                    ignore_eos=True)
                sp.normalize()
                r = Req(f"det{i}-{len(prompts)}", list(p), sp)
                reqs.append(r)
                core.add_request(r)
            n = 0
            while core.has_work():
                core.step()
                n += 1
                assert n < 300
            return [r.output_ids for r in reqs]

        x = [3, 11, 7, 5, 2, 9, 4, 8]
        y = [14, 6, 100, 42]
        alone = run([x])
        core.flush_cache()
        together = run([x, y])
        assert together[0] == alone[0]
    finally:
        set_deterministic_buckets(False)
