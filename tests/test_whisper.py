"""Whisper encoder-decoder ASR: HF greedy parity through the scheduler,
cross-KV slot reuse across requests, and the radix audio salt.

Ref: srt/models/whisper.py (encoder KV via dummy-prepended tokens there;
slot-indexed cross-KV tail here — models/whisper.py docstring).
"""

import numpy as np
import pytest

SOT, EN, TRANSCRIBE, NOTS = 250, 251, 252, 253


@pytest.fixture(scope="module")
def whisper_dir(tmp_path_factory):
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    from conftest import _write_tiny_tokenizer

    torch.manual_seed(7)
    cfg = WhisperConfig(
        vocab_size=256,
        num_mel_bins=32,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=96,
        decoder_layers=2,
        decoder_attention_heads=4,
        decoder_ffn_dim=96,
        max_source_positions=1500,
        max_target_positions=448,
        decoder_start_token_id=SOT,
        bos_token_id=SOT,
        eos_token_id=2,
        pad_token_id=0,
    )
    model = WhisperForConditionalGeneration(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_whisper")
    model.save_pretrained(path, safe_serialization=True)
    _write_tiny_tokenizer(str(path), vocab_size=256)
    return str(path)


def _make_core(model_dir):
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
        max_running_requests=4,
    )
    runner = ModelRunner(args)
    return ScheduleCore(args, runner), runner


def _mel(seed: int, n_mels=32):
    from sglang_tpu.multimodal.audio import whisper_log_mel

    rng = np.random.default_rng(seed)
    audio = rng.normal(0, 0.2, size=16000).astype(np.float32)
    return whisper_log_mel(audio, n_mels=n_mels)


def _hf_greedy(model_dir, feats, dec_ids, n_new):
    import torch
    from transformers import WhisperForConditionalGeneration

    model = WhisperForConditionalGeneration.from_pretrained(model_dir)
    model.eval()
    ids = list(dec_ids)
    f = torch.tensor(feats, dtype=torch.float32)[None]
    with torch.no_grad():
        enc = model.model.encoder(f).last_hidden_state
        for _ in range(n_new):
            out = model(
                decoder_input_ids=torch.tensor(ids)[None],
                encoder_outputs=(enc,),
            )
            ids.append(int(out.logits[0, -1].argmax()))
    return ids[len(dec_ids):]


def _run(core, runner, rid, feats, dec_ids, n_new):
    from sglang_tpu.core.req import Req
    from sglang_tpu.sampling.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req(rid, list(dec_ids), sp)
    h = int(abs(hash(feats.tobytes())))
    core.attach_mm_inputs(
        req, [dict(pixel_values=feats, mm_hash=h, num_tokens=0, offset=0)]
    )
    core.add_request(req)
    while core.has_work():
        core.step()
    return req


def test_whisper_hf_greedy_parity(whisper_dir):
    core, runner = _make_core(whisper_dir)
    feats = _mel(0)
    dec = [SOT, EN, TRANSCRIBE, NOTS]
    ref = _hf_greedy(whisper_dir, feats, dec, 8)
    req = _run(core, runner, "w1", feats, dec, 8)
    assert req.output_ids == ref


def test_whisper_two_audios_distinct(whisper_dir):
    """Same decoder prompt, different audios: the mm salt must keep the
    radix prefixes apart and outputs must match per-audio HF."""
    core, runner = _make_core(whisper_dir)
    dec = [SOT, EN, TRANSCRIBE, NOTS]
    f1, f2 = _mel(1), _mel(2)
    r1 = _run(core, runner, "a", f1, dec, 6)
    r2 = _run(core, runner, "b", f2, dec, 6)
    assert r1.output_ids == _hf_greedy(whisper_dir, f1, dec, 6)
    assert r2.output_ids == _hf_greedy(whisper_dir, f2, dec, 6)


def test_whisper_concurrent_batch(whisper_dir):
    """Two in-flight requests decode against their own cross-KV slots."""
    core, runner = _make_core(whisper_dir)
    from sglang_tpu.core.req import Req
    from sglang_tpu.sampling.sampling_params import SamplingParams

    dec = [SOT, EN, TRANSCRIBE, NOTS]
    f1, f2 = _mel(3), _mel(4)
    ref1 = _hf_greedy(whisper_dir, f1, dec, 6)
    ref2 = _hf_greedy(whisper_dir, f2, dec, 6)
    reqs = []
    for rid, f in (("c1", f1), ("c2", f2)):
        sp = SamplingParams(temperature=0.0, max_new_tokens=6,
                            ignore_eos=True)
        sp.normalize()
        req = Req(rid, list(dec), sp)
        core.attach_mm_inputs(
            req,
            [dict(pixel_values=f, mm_hash=int(abs(hash(f.tobytes()))),
                  num_tokens=0, offset=0)],
        )
        core.add_request(req)
        reqs.append(req)
    while core.has_work():
        core.step()
    assert reqs[0].output_ids == ref1
    assert reqs[1].output_ids == ref2
