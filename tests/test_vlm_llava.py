"""LLaVA end-to-end: processor parity, ViT parity, greedy generation
parity vs HF LlavaForConditionalGeneration.

Ref: srt/models/llava.py + srt/multimodal/processors/llava.py.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_llava_vlm_dir(tmp_path_factory):
    import torch
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    torch.manual_seed(7)
    vision = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
    )
    text = LlamaConfig(
        vocab_size=128,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
    )
    cfg = LlavaConfig(
        vision_config=vision,
        text_config=text,
        image_token_index=99,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    model = LlavaForConditionalGeneration(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_llava")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def test_image():
    from PIL import Image

    rng = np.random.default_rng(3)
    return Image.fromarray((rng.random((40, 52, 3)) * 255).astype(np.uint8))


def test_processor_matches_hf(tiny_llava_vlm_dir, test_image):
    from transformers import AutoConfig, CLIPImageProcessor

    from sglang_tpu.multimodal.processors import get_mm_processor

    hf_cfg = AutoConfig.from_pretrained(tiny_llava_vlm_dir)
    proc = get_mm_processor(["LlavaForConditionalGeneration"], hf_cfg)
    out = proc(test_image)
    hf_proc = CLIPImageProcessor(
        size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28}
    )
    ref = hf_proc(test_image, return_tensors="np").pixel_values
    np.testing.assert_allclose(out.pixel_values, ref, atol=1e-6)
    assert out.num_tokens == 4  # (28/14)^2


def test_vit_features_match_hf(tiny_llava_vlm_dir, test_image):
    import torch
    from transformers import AutoConfig, LlavaForConditionalGeneration

    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.multimodal.processors import get_mm_processor
    from sglang_tpu.server_args import ServerArgs

    hf_cfg = AutoConfig.from_pretrained(tiny_llava_vlm_dir)
    proc = get_mm_processor(["LlavaForConditionalGeneration"], hf_cfg)
    pixels = proc(test_image).pixel_values

    hf = LlavaForConditionalGeneration.from_pretrained(tiny_llava_vlm_dir)
    hf.eval()
    with torch.no_grad():
        ref = hf.get_image_features(
            pixel_values=torch.tensor(pixels),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
        if isinstance(ref, (list, tuple)):
            ref = ref[0]
        ref = ref.numpy()

    args = ServerArgs(
        model_path=tiny_llava_vlm_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    mine = np.asarray(
        runner.model.encode_images(runner.params, pixels)
    ).reshape(ref.shape)
    np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4)


def test_llava_greedy_generation_matches_hf(tiny_llava_vlm_dir, test_image):
    import torch
    from transformers import AutoConfig, LlavaForConditionalGeneration

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.multimodal.processors import get_mm_processor
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    hf_cfg = AutoConfig.from_pretrained(tiny_llava_vlm_dir)
    proc = get_mm_processor(["LlavaForConditionalGeneration"], hf_cfg)
    processed = proc(test_image)
    img_tok = hf_cfg.image_token_index

    # prompt: text, 4 image placeholders, text
    prompt = [5, 12, img_tok, img_tok, img_tok, img_tok, 9, 31]
    n_new = 6

    hf = LlavaForConditionalGeneration.from_pretrained(tiny_llava_vlm_dir)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(processed.pixel_values),
            max_new_tokens=n_new,
            do_sample=False,
        )
    ref = out[0, len(prompt):].tolist()

    args = ServerArgs(
        model_path=tiny_llava_vlm_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    embeds = np.asarray(
        runner.model.encode_images(runner.params, processed.pixel_values)
    ).reshape(-1, runner.model_config.hidden_size)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("llava", list(prompt), sp)
    req.mm_positions = [2, 3, 4, 5]
    req.mm_embeds = [embeds[j] for j in range(4)]
    core.add_request(req)
    while core.has_work():
        core.step()
    assert req.output_ids == ref


def test_llava_serving_e2e_with_vit_cache(tiny_llava_vlm_dir, test_image):
    """Engine path: image_data in, placeholder expansion, ViT encode at
    admission, and a repeated image hitting BOTH the ViT-embedding cache
    and the radix prefix cache."""
    import io

    from sglang_tpu.entrypoints.engine import Engine

    buf = io.BytesIO()
    test_image.save(buf, format="PNG")
    img_bytes = buf.getvalue()

    engine = Engine(
        model_path=tiny_llava_vlm_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
        skip_tokenizer_init=True,
        enable_single_process=True,
    )
    try:
        img_tok = 99
        prompt = [5, 12, img_tok, 9, 31]  # ONE image token, expands to 4
        out1 = engine.generate(
            input_ids=prompt,
            image_data=[img_bytes],
            sampling_params={"temperature": 0.0, "max_new_tokens": 5,
                            "ignore_eos": True},
        )
        assert len(out1["output_ids"]) == 5
        core = engine.scheduler_core()
        assert len(core.mm_embed_cache) == 1
        out2 = engine.generate(
            input_ids=prompt,
            image_data=[img_bytes],
            sampling_params={"temperature": 0.0, "max_new_tokens": 5,
                            "ignore_eos": True},
        )
        # identical image + prompt: same tokens, ViT cache hit, radix reuse
        assert out2["output_ids"] == out1["output_ids"]
        assert core.mm_cache_hits >= 1
        assert out2["meta_info"]["cached_tokens"] > 0
    finally:
        engine.shutdown()
