"""Audio API e2e: /v1/audio/transcriptions, /v1/realtime (WebSocket),
and chat input_audio parts against a live server running the tiny
Qwen2-Audio checkpoint.

Ref: srt/entrypoints/http_server.py:1772 (/v1/audio/transcriptions),
:1812 (/v1/realtime), serving_transcription.py."""

import base64
import io
import json
import os
import subprocess
import sys
import time
import wave

import numpy as np
import pytest
import requests

from sglang_tpu.utils import find_free_port

AUD_TOK = 100


def _wav_bytes(x: np.ndarray, sr=16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x.clip(-1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def audio_model_dir(tmp_path_factory):
    import torch
    from transformers import Qwen2AudioForConditionalGeneration, Qwen2Config
    from transformers.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioConfig,
        Qwen2AudioEncoderConfig,
    )

    from conftest import _write_tiny_tokenizer

    torch.manual_seed(3)
    cfg = Qwen2AudioConfig(
        audio_config=Qwen2AudioEncoderConfig(
            num_mel_bins=32, d_model=32, encoder_layers=2,
            encoder_attention_heads=4, encoder_ffn_dim=64,
            max_source_positions=1500,
        ).to_dict(),
        text_config=Qwen2Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=2048,
            rope_theta=10000.0, tie_word_embeddings=False,
        ).to_dict(),
        audio_token_index=AUD_TOK,
    )
    model = Qwen2AudioForConditionalGeneration(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("q2a_srv")
    model.save_pretrained(path, safe_serialization=True)
    _write_tiny_tokenizer(str(path), vocab_size=256)
    return str(path)


@pytest.fixture(scope="module")
def server(audio_model_dir, tmp_path_factory):
    port = find_free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        TOKENIZERS_PARALLELISM="false",
    )
    log_path = tmp_path_factory.mktemp("srv") / "server_log.txt"
    log_f = open(log_path, "wb")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "sglang_tpu.launch_server",
            "--model-path", audio_model_dir,
            "--dtype", "float32",
            "--attention-backend", "xla_native",
            "--page-size", "4",
            "--max-total-tokens", "4096",
            "--port", str(port),
            "--enable-single-process",
            "--log-level", "warning",
        ],
        env=env, stdout=log_f, stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 480  # xdist load starves boots
    while time.time() < deadline:
        try:
            if requests.get(base + "/health", timeout=2).status_code == 200:
                break
        except Exception:
            pass
        if proc.poll() is not None:
            out = log_path.read_bytes().decode(errors="replace")
            raise RuntimeError(f"server died:\n{out[-4000:]}")
        time.sleep(1)
    else:
        proc.kill()
        raise TimeoutError("server did not become healthy")
    yield base
    proc.terminate()
    try:
        proc.wait(timeout=60)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=30)
    log_f.close()


def test_transcription_multipart(server):
    rng = np.random.default_rng(0)
    wav = _wav_bytes(rng.normal(0, 0.2, size=16000).astype(np.float32))
    r = requests.post(
        server + "/v1/audio/transcriptions",
        files={"file": ("a.wav", wav, "audio/wav")},
        data={"model": "tiny", "response_format": "json"},
        timeout=120,
    )
    assert r.status_code == 200, r.text
    assert isinstance(r.json()["text"], str)


def test_transcription_text_format_and_translation(server):
    rng = np.random.default_rng(1)
    wav = _wav_bytes(rng.normal(0, 0.2, size=8000).astype(np.float32))
    r = requests.post(
        server + "/v1/audio/transcriptions",
        files={"file": ("a.wav", wav, "audio/wav")},
        data={"model": "tiny", "response_format": "text"},
        timeout=120,
    )
    assert r.status_code == 200
    assert r.headers["Content-Type"].startswith("text/plain")
    r2 = requests.post(
        server + "/v1/audio/translations",
        files={"file": ("a.wav", wav, "audio/wav")},
        data={"model": "tiny"},
        timeout=120,
    )
    assert r2.status_code == 200 and "text" in r2.json()


def test_chat_input_audio_part(server):
    rng = np.random.default_rng(2)
    wav_b64 = base64.b64encode(
        _wav_bytes(rng.normal(0, 0.2, size=8000).astype(np.float32))
    ).decode()
    r = requests.post(
        server + "/v1/chat/completions",
        json={
            "model": "tiny",
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "input_audio",
                     "input_audio": {"data": wav_b64, "format": "wav"}},
                    {"type": "text", "text": " w5 w6"},
                ],
            }],
            "max_tokens": 4,
            "temperature": 0,
        },
        timeout=120,
    )
    assert r.status_code == 200, r.text
    assert r.json()["choices"][0]["message"]["content"] is not None


def test_realtime_websocket(server):
    import asyncio

    import aiohttp

    rng = np.random.default_rng(3)
    pcm16 = (
        (rng.normal(0, 0.2, size=8000).clip(-1, 1) * 32767)
        .astype(np.int16).tobytes()
    )

    async def run():
        events = []
        async with aiohttp.ClientSession() as s:
            async with s.ws_connect(
                server.replace("http", "ws") + "/v1/realtime"
            ) as ws:
                ev = json.loads((await ws.receive()).data)
                assert ev["type"] == "session.created"
                await ws.send_json({
                    "type": "session.update",
                    "session": {"instructions": "w7 w8"},
                })
                ev = json.loads((await ws.receive()).data)
                assert ev["type"] == "session.updated"
                half = len(pcm16) // 2
                for chunk in (pcm16[:half], pcm16[half:]):
                    await ws.send_json({
                        "type": "input_audio_buffer.append",
                        "audio": base64.b64encode(chunk).decode(),
                    })
                await ws.send_json({"type": "input_audio_buffer.commit"})
                ev = json.loads((await ws.receive()).data)
                assert ev["type"] == "input_audio_buffer.committed"
                await ws.send_json({"type": "response.create"})
                while True:
                    msg = await asyncio.wait_for(ws.receive(), timeout=120)
                    ev = json.loads(msg.data)
                    events.append(ev["type"])
                    if ev["type"] == "response.done":
                        break
        return events

    events = asyncio.new_event_loop().run_until_complete(run())
    assert "response.output_text.done" in events
    assert events[-1] == "response.done"
