"""InternVL: ViT+pixel-shuffle+projector features and greedy parity vs HF
InternVLForConditionalGeneration (Qwen2 text backbone).

Ref: srt/models/internvl.py.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_internvl_dir(tmp_path_factory):
    import torch
    from transformers import (
        InternVLConfig,
        InternVLForConditionalGeneration,
        InternVLVisionConfig,
        Qwen2Config,
    )

    torch.manual_seed(91)
    vision = InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=7,
        use_qk_norm=False, norm_type="layer_norm",
        layer_scale_init_value=0.1, use_absolute_position_embeddings=True,
    )
    text = Qwen2Config(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    cfg = InternVLConfig(
        vision_config=vision, text_config=text,
        image_token_id=99, downsample_ratio=0.5,
        vision_feature_layer=-1, vision_feature_select_strategy="default",
    )
    model = InternVLForConditionalGeneration(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_internvl")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_internvl_greedy_matches_hf(tiny_internvl_dir):
    import torch
    from transformers import AutoConfig, InternVLForConditionalGeneration

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.multimodal.processors import get_mm_processor
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    from PIL import Image

    rng = np.random.default_rng(9)
    img = Image.fromarray((rng.random((30, 42, 3)) * 255).astype(np.uint8))
    hf_cfg = AutoConfig.from_pretrained(tiny_internvl_dir)
    proc = get_mm_processor(["InternVLForConditionalGeneration"], hf_cfg)
    processed = proc(img)
    # 28/7 = 4x4 patches, pixel shuffle 0.5 -> 2x2 = 4 tokens
    assert processed.num_tokens == 4

    prompt = [5, 12, 99, 99, 99, 99, 9, 31]
    n_new = 6
    hf = InternVLForConditionalGeneration.from_pretrained(tiny_internvl_dir)
    hf.eval()
    pv = torch.tensor(processed.pixel_values)
    with torch.no_grad():
        ref_feats = hf.get_image_features(
            pixel_values=pv,
            vision_feature_layer=-1,
            vision_feature_select_strategy="default",
        ).numpy()
        out = hf.generate(
            input_ids=torch.tensor([prompt]), pixel_values=pv,
            max_new_tokens=n_new, do_sample=False,
        )
    ref = out[0, len(prompt):].tolist()

    args = ServerArgs(
        model_path=tiny_internvl_dir, dtype="float32",
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
    req = Req("ivl", list(prompt), sp)
    req.mm_positions = [2, 3, 4, 5]
    flat = embeds.reshape(-1, runner.model_config.hidden_size)
    req.mm_embeds = [flat[j] for j in range(4)]
    core.add_request(req)
    while core.has_work():
        core.step()
    assert req.output_ids == ref
