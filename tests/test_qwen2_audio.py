"""Qwen2-Audio: whisper log-mel + encoder tower + e2e greedy parity vs
HF Qwen2AudioForConditionalGeneration.

Ref: srt/models/qwen2_audio.py; HF feature extraction verified exact in
test_whisper_features_match_hf."""

import numpy as np
import pytest

AUD_TOK = 100


@pytest.fixture(scope="module")
def tiny_qwen2_audio_dir(tmp_path_factory):
    import torch
    from transformers import Qwen2AudioForConditionalGeneration
    from transformers.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioConfig,
        Qwen2AudioEncoderConfig,
    )
    from transformers import Qwen2Config

    torch.manual_seed(3)
    audio_cfg = Qwen2AudioEncoderConfig(
        num_mel_bins=32, d_model=32, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=64,
        max_source_positions=1500, scale_embedding=False,
    )
    text_cfg = Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    cfg = Qwen2AudioConfig(
        audio_config=audio_cfg.to_dict(), text_config=text_cfg.to_dict(),
        audio_token_index=AUD_TOK,
    )
    model = Qwen2AudioForConditionalGeneration(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_q2audio")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_whisper_features_match_hf():
    from transformers import WhisperFeatureExtractor

    from sglang_tpu.multimodal.audio import whisper_log_mel

    rng = np.random.default_rng(0)
    for n_mels, n in ((32, 16000 * 2 + 123), (128, 16000 * 30)):
        x = rng.normal(0, 0.1, size=n).astype(np.float32)
        fe = WhisperFeatureExtractor(feature_size=n_mels)
        ref = fe(x, sampling_rate=16000, return_tensors="np",
                 padding="max_length")["input_features"][0]
        ours = whisper_log_mel(x, n_mels=n_mels)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)


def test_wav_roundtrip(tmp_path):
    import io
    import wave

    from sglang_tpu.multimodal.audio import load_audio

    rng = np.random.default_rng(1)
    x = (rng.normal(0, 0.2, size=8000).clip(-1, 1) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(x.tobytes())
    raw = buf.getvalue()
    got = load_audio(raw)
    np.testing.assert_allclose(got, x.astype(np.float32) / 32768.0,
                               atol=1e-6)
    # base64 + file path entry points
    import base64

    got2 = load_audio(base64.b64encode(raw).decode())
    np.testing.assert_array_equal(got, got2)
    p = tmp_path / "a.wav"
    p.write_bytes(raw)
    got3 = load_audio(str(p))
    np.testing.assert_array_equal(got, got3)


def test_encoder_tower_matches_hf(tiny_qwen2_audio_dir):
    import torch
    from transformers import Qwen2AudioForConditionalGeneration

    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    rng = np.random.default_rng(2)
    feats = rng.normal(0, 0.5, size=(32, 3000)).astype(np.float32)
    n_frames = 500

    hf = Qwen2AudioForConditionalGeneration.from_pretrained(
        tiny_qwen2_audio_dir
    )
    hf.eval()
    with torch.no_grad():
        fl = torch.tensor([n_frames])
        feat_lens, out_lens = hf.audio_tower._get_feat_extract_output_lengths(fl)
        L = (3000 - 2) // 2 + 1
        rng_mask = torch.arange(L)[None, :] >= feat_lens[:, None]
        amask = torch.zeros(1, 1, L, L)
        amask[rng_mask.view(1, 1, 1, L).expand(1, 1, L, L)] = float("-inf")
        enc = hf.audio_tower(
            torch.tensor(feats)[None], attention_mask=amask
        ).last_hidden_state
        ref = hf.multi_modal_projector(enc)[0].numpy()

    args = ServerArgs(
        model_path=tiny_qwen2_audio_dir, dtype="float32",
        attention_backend="xla_native", page_size=4, max_total_tokens=1024,
    )
    runner = ModelRunner(args)
    ours = np.asarray(
        runner.model.encode_images(runner.params, feats,
                                   grid_thw=(n_frames,))
    )
    n_out = int(out_lens[0])
    np.testing.assert_allclose(ours[:n_out], ref[:n_out], atol=2e-4)


def test_qwen2_audio_e2e_greedy_parity(tiny_qwen2_audio_dir):
    import torch
    from transformers import Qwen2AudioForConditionalGeneration

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.multimodal.audio import Qwen2AudioProcessor
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs
    from transformers import AutoConfig

    rng = np.random.default_rng(5)
    wav = rng.normal(0, 0.2, size=16000).astype(np.float32)  # 1s -> 100 mel

    cfg = AutoConfig.from_pretrained(tiny_qwen2_audio_dir)
    proc = Qwen2AudioProcessor(cfg)
    pa = proc(wav)
    assert pa.num_frames == 100
    assert pa.num_tokens == ((100 - 1) // 2 + 1 - 2) // 2 + 1  # 25

    prompt_head = [5, 6, 7]
    prompt_tail = [9, 10]
    n_new = 6

    # HF reference
    hf = Qwen2AudioForConditionalGeneration.from_pretrained(
        tiny_qwen2_audio_dir
    )
    hf.eval()
    input_ids = prompt_head + [AUD_TOK] * pa.num_tokens + prompt_tail
    fam = torch.zeros(1, 3000, dtype=torch.long)
    fam[0, :pa.num_frames] = 1
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([input_ids]),
            input_features=torch.tensor(pa.features)[None],
            feature_attention_mask=fam,
            max_new_tokens=n_new, do_sample=False,
        )
    ref = out[0, len(input_ids):].tolist()

    # ours: processor expansion + scheduler mm attach
    args = ServerArgs(
        model_path=tiny_qwen2_audio_dir, dtype="float32",
        attention_backend="xla_native", page_size=4, max_total_tokens=2048,
    )
    core = ScheduleCore(args, ModelRunner(args))
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("a", input_ids, sp)
    core.attach_mm_inputs(req, [dict(
        pixel_values=pa.features, grid_thw=(pa.num_frames,),
        mm_hash=pa.mm_hash, offset=len(prompt_head),
        num_tokens=pa.num_tokens,
    )])
    core.add_request(req)
    while core.has_work():
        core.step()
    assert req.output_ids == ref, f"{req.output_ids} != {ref}"
