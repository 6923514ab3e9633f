"""Qwen2-VL end-to-end: ViT parity, mrope positions, greedy generation
parity vs HF Qwen2VLForConditionalGeneration (with an image).

Ref: srt/models/qwen2_vl.py + HF get_rope_index numerics.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_qwen2vl_dir(tmp_path_factory):
    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig,
    )

    torch.manual_seed(11)
    vc = Qwen2VLVisionConfig(
        depth=2, embed_dim=32, hidden_size=48, num_heads=4, patch_size=14,
        spatial_merge_size=2, temporal_patch_size=2, mlp_ratio=2,
    )
    cfg = Qwen2VLConfig(
        vocab_size=128,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        vision_config=vc.to_dict(),
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=99,
        vision_start_token_id=97,
        vision_end_token_id=98,
        video_token_id=100,
    )
    model = Qwen2VLForConditionalGeneration(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_qwen2vl")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def test_image():
    from PIL import Image

    rng = np.random.default_rng(5)
    return Image.fromarray((rng.random((56, 56, 3)) * 255).astype(np.uint8))


def test_vision_features_match_hf(tiny_qwen2vl_dir, test_image):
    import torch
    from transformers import AutoConfig, Qwen2VLForConditionalGeneration

    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.multimodal.processors import get_mm_processor
    from sglang_tpu.server_args import ServerArgs

    hf_cfg = AutoConfig.from_pretrained(tiny_qwen2vl_dir)
    proc = get_mm_processor(["Qwen2VLForConditionalGeneration"], hf_cfg)
    out = proc(test_image)
    assert out.grid_thw == (1, 4, 4)
    assert out.num_tokens == 4

    hf = Qwen2VLForConditionalGeneration.from_pretrained(tiny_qwen2vl_dir)
    hf.eval()
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(out.pixel_values),
            grid_thw=torch.tensor([list(out.grid_thw)]),
        ).numpy()

    args = ServerArgs(
        model_path=tiny_qwen2vl_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    mine = np.asarray(
        runner.model.encode_images(runner.params, out.pixel_values,
                                   grid_thw=out.grid_thw)
    )
    np.testing.assert_allclose(mine, ref, rtol=3e-4, atol=3e-4)


def test_mrope_positions_match_hf(tiny_qwen2vl_dir):
    import torch
    from transformers import AutoConfig, Qwen2VLForConditionalGeneration

    from sglang_tpu.models.qwen2_vl import compute_mrope_positions

    hf_cfg = AutoConfig.from_pretrained(tiny_qwen2vl_dir)
    hf = Qwen2VLForConditionalGeneration.from_pretrained(tiny_qwen2vl_dir)
    # prompt: 2 text, vision_start, 4 image tokens, vision_end, 2 text
    prompt = [5, 12, 97, 99, 99, 99, 99, 98, 9, 31]
    with torch.no_grad():
        ref_pos, ref_delta = hf.model.get_rope_index(
            torch.tensor([prompt]),
            image_grid_thw=torch.tensor([[1, 4, 4]]),
        )
    pos, delta = compute_mrope_positions(prompt, 99, [(1, 4, 4)], merge=2)
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])


def test_qwen2vl_greedy_generation_matches_hf(tiny_qwen2vl_dir, test_image):
    import torch
    from transformers import AutoConfig, Qwen2VLForConditionalGeneration

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.models.qwen2_vl import compute_mrope_positions
    from sglang_tpu.multimodal.processors import get_mm_processor
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    hf_cfg = AutoConfig.from_pretrained(tiny_qwen2vl_dir)
    proc = get_mm_processor(["Qwen2VLForConditionalGeneration"], hf_cfg)
    processed = proc(test_image)
    prompt = [5, 12, 97, 99, 99, 99, 99, 98, 9, 31]
    n_new = 6

    hf = Qwen2VLForConditionalGeneration.from_pretrained(tiny_qwen2vl_dir)
    hf.eval()
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(processed.pixel_values),
            image_grid_thw=torch.tensor([list(processed.grid_thw)]),
            max_new_tokens=n_new,
            do_sample=False,
        )
    ref = out[0, len(prompt):].tolist()

    args = ServerArgs(
        model_path=tiny_qwen2vl_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    embeds = np.asarray(
        runner.model.encode_images(
            runner.params, processed.pixel_values, grid_thw=processed.grid_thw
        )
    )
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("q2vl", list(prompt), sp)
    req.mm_positions = [3, 4, 5, 6]
    req.mm_embeds = [embeds[j] for j in range(4)]
    req.mrope_positions, req.mrope_delta = compute_mrope_positions(
        prompt, 99, [processed.grid_thw], merge=2
    )
    core.add_request(req)
    while core.has_work():
        core.step()
    assert req.output_ids == ref
