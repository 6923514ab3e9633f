"""BERT embedding model: HF parity through the encode path.

Ref: srt/models/bert.py (CLS pooling embedding models).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(5)
    cfg = BertConfig(
        vocab_size=200,
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=96,
        max_position_embeddings=128,
    )
    model = BertModel(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_bert")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_bert_cls_embedding_matches_hf(tiny_bert_dir):
    import torch
    from transformers import BertModel as HFBert

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    prompts = [[2, 45, 99, 150, 7], [11, 4, 88], [3, 3, 3, 120, 44, 9, 61]]

    hf = HFBert.from_pretrained(tiny_bert_dir)
    hf.eval()
    refs = []
    for p in prompts:
        with torch.no_grad():
            out = hf(input_ids=torch.tensor([p])).last_hidden_state[0, 0]
        v = out.numpy()
        refs.append(v / np.linalg.norm(v))

    args = ServerArgs(
        model_path=tiny_bert_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    reqs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(max_new_tokens=1)
        sp.normalize()
        r = Req(f"b{i}", list(p), sp)
        r.is_embedding = True
        reqs.append(r)
        core.add_request(r)
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < 50
    for r, ref in zip(reqs, refs):
        got = np.asarray(r.embedding)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
