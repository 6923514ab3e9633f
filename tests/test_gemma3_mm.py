"""Gemma3 multimodal: processor/ViT/projector and greedy parity vs HF
Gemma3ForConditionalGeneration.

Ref: srt/models/gemma3_mm.py.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_gemma3_mm_dir(tmp_path_factory):
    import torch
    from transformers import (
        Gemma3Config,
        Gemma3ForConditionalGeneration,
        Gemma3TextConfig,
        SiglipVisionConfig,
    )

    torch.manual_seed(81)
    vision = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=7,
    )
    text = Gemma3TextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=256, sliding_window=16,
    )
    cfg = Gemma3Config(
        vision_config=vision, text_config=text,
        image_token_index=99, mm_tokens_per_image=4,
        boi_token_index=97, eoi_token_index=98,
    )
    model = Gemma3ForConditionalGeneration(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_gemma3mm")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def test_image():
    from PIL import Image

    rng = np.random.default_rng(5)
    return Image.fromarray((rng.random((36, 44, 3)) * 255).astype(np.uint8))


def test_gemma3_mm_greedy_matches_hf(tiny_gemma3_mm_dir, test_image):
    import torch
    from transformers import AutoConfig, Gemma3ForConditionalGeneration

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.multimodal.processors import get_mm_processor
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    hf_cfg = AutoConfig.from_pretrained(tiny_gemma3_mm_dir)
    proc = get_mm_processor(["Gemma3ForConditionalGeneration"], hf_cfg)
    processed = proc(test_image)
    assert processed.num_tokens == 4
    img_tok = hf_cfg.image_token_index

    prompt = [5, 12, img_tok, img_tok, img_tok, img_tok, 9, 31]
    n_new = 6

    hf = Gemma3ForConditionalGeneration.from_pretrained(tiny_gemma3_mm_dir)
    hf.eval()
    with torch.no_grad():
        # pixel parity: HF Gemma3 processor resizes + 0.5/0.5-normalizes
        pv = torch.tensor(processed.pixel_values)
        ref_feats = hf.get_image_features(pixel_values=pv).numpy()
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=pv,
            max_new_tokens=n_new, do_sample=False,
        )
    ref = out[0, len(prompt):].tolist()

    args = ServerArgs(
        model_path=tiny_gemma3_mm_dir, dtype="float32",
        attention_backend="xla_native", page_size=4, max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    embeds = np.asarray(
        runner.model.encode_images(runner.params, processed.pixel_values)
    )
    np.testing.assert_allclose(
        embeds.reshape(ref_feats.shape), ref_feats, rtol=2e-4, atol=2e-4
    )
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("g3mm", list(prompt), sp)
    req.mm_positions = [2, 3, 4, 5]
    flat = embeds.reshape(-1, runner.model_config.hidden_size)
    req.mm_embeds = [flat[j] for j in range(4)]
    core.add_request(req)
    while core.has_work():
        core.step()
    assert req.output_ids == ref
