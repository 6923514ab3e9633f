"""Video modality (Qwen2-VL) + EVS token pruning.

Ref: srt/multimodal/processors/qwen_vl.py video path, HF
Qwen2VLImageProcessor(videos=...), HF get_rope_index(video_grid_thw),
srt/multimodal/evs/evs_core.py.
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
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, vision_config=vc.to_dict(),
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=99, vision_start_token_id=97,
        vision_end_token_id=98, video_token_id=100,
    )
    model = Qwen2VLForConditionalGeneration(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_qwen2vl_vid")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def frames():
    from PIL import Image

    rng = np.random.default_rng(7)
    base = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
    # frames 0/1 nearly identical, 2/3 fresh content (EVS separability)
    f1 = np.clip(base.astype(np.int16) + rng.integers(-2, 3, base.shape),
                 0, 255).astype(np.uint8)
    f2 = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
    f3 = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
    return [Image.fromarray(a) for a in (base, f1, f2, f3)]


def _proc(tiny_qwen2vl_dir):
    from transformers import AutoConfig

    from sglang_tpu.multimodal.processors import get_mm_processor

    hf_cfg = AutoConfig.from_pretrained(tiny_qwen2vl_dir)
    return get_mm_processor(["Qwen2VLForConditionalGeneration"], hf_cfg), \
        hf_cfg


def test_video_processor_matches_hf(tiny_qwen2vl_dir, frames):
    from transformers import Qwen2VLImageProcessor

    proc, _ = _proc(tiny_qwen2vl_dir)
    out = proc.process_video(frames)
    assert out.grid_thw == (2, 4, 4)
    assert out.num_tokens == 2 * 2 * 2

    hf_proc = Qwen2VLImageProcessor(
        min_pixels=56 * 56, max_pixels=28 * 28 * 1280, patch_size=14,
        temporal_patch_size=2, merge_size=2,
    )
    ref = hf_proc(images=None, videos=[frames], return_tensors="np")
    np.testing.assert_array_equal(
        ref["video_grid_thw"][0], np.asarray(out.grid_thw))
    np.testing.assert_allclose(
        out.pixel_values, ref["pixel_values_videos"], rtol=2e-5, atol=2e-5)


def test_video_vision_features_match_hf(tiny_qwen2vl_dir, frames):
    import torch
    from transformers import Qwen2VLForConditionalGeneration

    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    proc, _ = _proc(tiny_qwen2vl_dir)
    out = proc.process_video(frames)

    hf = Qwen2VLForConditionalGeneration.from_pretrained(tiny_qwen2vl_dir)
    hf.eval()
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(out.pixel_values),
            grid_thw=torch.tensor([list(out.grid_thw)]),
        ).numpy()

    runner = ModelRunner(ServerArgs(
        model_path=tiny_qwen2vl_dir, dtype="float32",
        attention_backend="xla_native", page_size=4, max_total_tokens=512,
    ))
    got = np.asarray(runner.model.encode_images(
        runner.params, out.pixel_values, grid_thw=out.grid_thw))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_video_mrope_positions_match_hf(tiny_qwen2vl_dir):
    import torch
    from transformers import Qwen2VLForConditionalGeneration

    from sglang_tpu.models.qwen2_vl import compute_mrope_positions

    hf = Qwen2VLForConditionalGeneration.from_pretrained(tiny_qwen2vl_dir)
    # 2 text, vision_start, 8 video tokens (t=2, 2x2 merged), end, 2 text
    prompt = [5, 12, 97] + [100] * 8 + [98, 9, 31]
    with torch.no_grad():
        ref_pos, ref_delta = hf.model.get_rope_index(
            torch.tensor([prompt]),
            video_grid_thw=torch.tensor([[2, 4, 4]]),
        )
    pos, delta = compute_mrope_positions(
        prompt, {99, 100}, [(2, 4, 4)], merge=2)
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])


def test_video_greedy_generation_matches_hf(tiny_qwen2vl_dir, frames):
    import torch
    from transformers import Qwen2VLForConditionalGeneration

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    proc, _ = _proc(tiny_qwen2vl_dir)
    out = proc.process_video(frames)
    prompt = [5, 12, 97] + [100] * out.num_tokens + [98, 9, 31]
    n_new = 6

    hf = Qwen2VLForConditionalGeneration.from_pretrained(tiny_qwen2vl_dir)
    hf.eval()
    with torch.no_grad():
        o = hf.generate(
            input_ids=torch.tensor([prompt]),
            pixel_values_videos=torch.tensor(out.pixel_values),
            video_grid_thw=torch.tensor([list(out.grid_thw)]),
            max_new_tokens=n_new, do_sample=False,
        )
    ref = o[0, len(prompt):].tolist()

    args = ServerArgs(
        model_path=tiny_qwen2vl_dir, dtype="float32",
        attention_backend="xla_native", page_size=4, max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("vid", list(prompt), sp)
    # the REAL admission path: payload dicts like the tokenizer sends
    core.attach_mm_inputs(req, [dict(
        pixel_values=out.pixel_values, grid_thw=out.grid_thw,
        mm_hash=out.mm_hash, num_tokens=out.num_tokens, offset=3,
        modality="video", evs_q=0.0,
    )])
    core.add_request(req)
    while core.has_work():
        core.step()
    assert req.output_ids == ref


def test_evs_retention_mask_semantics():
    from sglang_tpu.multimodal.evs import (
        compute_retained_tokens_count,
        compute_retention_mask,
    )

    rng = np.random.default_rng(3)
    hh = ww = 2
    f0 = rng.standard_normal((hh * ww, 8))
    f2 = rng.standard_normal((hh * ww, 8))
    emb = np.concatenate([f0, f0, f2], axis=0)  # frame1 == frame0
    mask = compute_retention_mask(emb, (3, 4, 4), 2, q=0.34)
    keep = compute_retained_tokens_count(tokens_per_frame=4, num_frames=3,
                                         q=0.34)
    assert mask.sum() == keep == 7
    assert mask[:4].all(), "first frame must be fully retained"
    # frame 1 duplicates frame 0 -> its tokens prune first; the 3
    # remaining slots go to frame 2's (novel) tokens
    assert not mask[4:8].any()
    assert mask[8:].sum() == 3
    # q=0 keeps everything
    assert compute_retention_mask(emb, (3, 4, 4), 2, q=0.0).all()


def test_video_generation_with_evs_pruning(tiny_qwen2vl_dir, frames):
    """EVS prunes the placeholder span; generation still runs and the
    retained tokens keep their original mrope grid coordinates."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.multimodal.evs import compute_retained_tokens_count
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    proc, _ = _proc(tiny_qwen2vl_dir)
    out = proc.process_video(frames)
    q = 0.5
    kept = compute_retained_tokens_count(
        tokens_per_frame=out.num_tokens // out.grid_thw[0],
        num_frames=out.grid_thw[0], q=q,
    )
    assert kept < out.num_tokens
    prompt = [5, 12, 97] + [100] * kept + [98, 9, 31]

    args = ServerArgs(
        model_path=tiny_qwen2vl_dir, dtype="float32",
        attention_backend="xla_native", page_size=4, max_total_tokens=1024,
        evs_video_pruning_rate=q,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=4, ignore_eos=True)
    sp.normalize()
    req = Req("vid-evs", list(prompt), sp)
    core.attach_mm_inputs(req, [dict(
        pixel_values=out.pixel_values, grid_thw=out.grid_thw,
        mm_hash=out.mm_hash, num_tokens=kept, offset=3,
        modality="video", evs_q=q,
    )])
    assert len(req.mm_positions) == kept
    assert req.mrope_positions.shape == (3, len(prompt))
    core.add_request(req)
    while core.has_work():
        core.step()
    assert len(req.output_ids) == 4
