"""HTTP server e2e: launch a real server subprocess, hit the API.

Ref test strategy: popen_launch_server (python/sglang/test/test_utils.py).
"""

import json
import os
import subprocess
import sys
import time

import pytest
import requests

from sglang_tpu.utils import find_free_port


@pytest.fixture(scope="module")
def server(tiny_llama_dir, tmp_path_factory):
    port = find_free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        TOKENIZERS_PARALLELISM="false",
    )
    # Server output goes to a FILE, not a PIPE: nothing drains a pipe here,
    # so enough log output would fill the 64KB buffer and block the server
    # mid-write (observed as flaky 120s request timeouts).
    log_path = tmp_path_factory.mktemp("srv") / "server_log.txt"
    log_f = open(log_path, "wb")
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "sglang_tpu.launch_server",
            "--model-path", tiny_llama_dir,
            "--dtype", "float32",
            "--attention-backend", "xla_native",
            "--page-size", "4",
            "--max-total-tokens", "4096",
            "--port", str(port),
            "--enable-single-process",
            "--log-level", "warning",
        ],
        env=env,
        stdout=log_f,
        stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 300
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
    proc.wait(timeout=10)
    log_f.close()


def test_health_and_info(server):
    assert requests.get(server + "/health").status_code == 200
    info = requests.get(server + "/get_model_info").json()
    assert info["is_generation"]
    sinfo = requests.get(server + "/get_server_info").json()
    assert sinfo["max_total_tokens"] > 0


def test_generate(server):
    r = requests.post(
        server + "/generate",
        json={
            "text": "w10 w11 w12",
            "sampling_params": {"temperature": 0, "max_new_tokens": 6,
                               "ignore_eos": True},
        },
    )
    assert r.status_code == 200, r.text
    out = r.json()
    assert len(out["output_ids"]) == 6
    assert out["meta_info"]["finish_reason"]["type"] == "length"


def test_generate_stream(server):
    r = requests.post(
        server + "/generate",
        json={
            "text": "w20 w21",
            "sampling_params": {"temperature": 0, "max_new_tokens": 5,
                               "ignore_eos": True},
            "stream": True,
        },
        stream=True,
    )
    events = []
    for line in r.iter_lines():
        if line.startswith(b"data: "):
            payload = line[6:]
            if payload == b"[DONE]":
                break
            events.append(json.loads(payload))
    assert events
    assert events[-1]["meta_info"]["finish_reason"] is not None


def test_v1_completions(server):
    r = requests.post(
        server + "/v1/completions",
        json={
            "model": "test",
            "prompt": "w30 w31 w32",
            "max_tokens": 5,
            "temperature": 0,
            "ignore_eos": True,
        },
    )
    assert r.status_code == 200, r.text
    out = r.json()
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] == 5
    assert isinstance(out["choices"][0]["text"], str)


def test_v1_chat_completions(server):
    r = requests.post(
        server + "/v1/chat/completions",
        json={
            "model": "test",
            "messages": [{"role": "user", "content": "w40 w41"}],
            "max_tokens": 5,
            "temperature": 0,
            "ignore_eos": True,
        },
    )
    assert r.status_code == 200, r.text
    out = r.json()
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_v1_chat_n_choices(server):
    r = requests.post(
        server + "/v1/chat/completions",
        json={
            "model": "test",
            "messages": [{"role": "user", "content": "w40 w41"}],
            "max_tokens": 4,
            "temperature": 0.8,
            "n": 2,
            "seed": 3,
            "ignore_eos": True,
        },
    )
    assert r.status_code == 200, r.text
    out = r.json()
    assert len(out["choices"]) == 2
    assert sorted(c["index"] for c in out["choices"]) == [0, 1]
    assert out["usage"]["completion_tokens"] == 8


def test_v1_completions_n_stream(server):
    r = requests.post(
        server + "/v1/completions",
        json={
            "model": "test",
            "prompt": "w30 w31",
            "max_tokens": 3,
            "temperature": 0.8,
            "n": 2,
            "stream": True,
            "ignore_eos": True,
        },
        stream=True,
    )
    assert r.status_code == 200
    seen_idx = set()
    for line in r.iter_lines():
        if not line or not line.startswith(b"data: "):
            continue
        payload = line[len(b"data: "):]
        if payload == b"[DONE]":
            break
        chunk = json.loads(payload)
        for c in chunk["choices"]:
            seen_idx.add(c["index"])
    assert seen_idx == {0, 1}


def test_v1_chat_stream(server):
    r = requests.post(
        server + "/v1/chat/completions",
        json={
            "model": "test",
            "messages": [{"role": "user", "content": "w50"}],
            "max_tokens": 5,
            "temperature": 0,
            "stream": True,
            "ignore_eos": True,
        },
        stream=True,
    )
    chunks = []
    for line in r.iter_lines():
        if line.startswith(b"data: "):
            payload = line[6:]
            if payload == b"[DONE]":
                break
            chunks.append(json.loads(payload))
    assert chunks
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    assert chunks[-1]["choices"][0]["finish_reason"] is not None


def test_v1_models(server):
    out = requests.get(server + "/v1/models").json()
    assert out["data"][0]["id"]


def test_flush_cache(server):
    # wait for in-flight work to settle, then flush
    time.sleep(1)
    r = requests.post(server + "/flush_cache")
    assert r.status_code in (200, 400)


def test_anthropic_messages(server):
    r = requests.post(
        server + "/v1/messages",
        json={
            "model": "test",
            "max_tokens": 4,
            "messages": [{"role": "user", "content": "w60 w61"}],
        },
    )
    assert r.status_code == 200, r.text
    out = r.json()
    assert out["type"] == "message"
    assert out["content"][0]["type"] == "text"
    assert out["usage"]["output_tokens"] >= 1


def test_ollama_chat(server):
    r = requests.post(
        server + "/api/chat",
        json={
            "model": "test",
            "stream": False,
            "messages": [{"role": "user", "content": "w62"}],
            "options": {"num_predict": 4, "temperature": 0},
        },
    )
    assert r.status_code == 200, r.text
    out = r.json()
    assert out["done"] is True
    assert out["message"]["role"] == "assistant"


def test_ollama_chat_streaming(server):
    """Ollama streams NDJSON lines by default."""
    import json as _json

    r = requests.post(
        server + "/api/chat",
        json={
            "model": "test",
            "messages": [{"role": "user", "content": "w63 w64"}],
            "options": {"num_predict": 4, "temperature": 0},
        },
        stream=True,
    )
    assert r.status_code == 200, r.text
    lines = [_json.loads(l) for l in r.iter_lines() if l]
    assert lines[-1]["done"] is True
    assert lines[-1]["eval_count"] >= 1
    text = "".join(l["message"]["content"] for l in lines)
    assert len(text) > 0
    assert all(not l["done"] for l in lines[:-1])


def test_anthropic_messages_streaming(server):
    """Anthropic SSE event sequence with text deltas."""
    import json as _json

    r = requests.post(
        server + "/v1/messages",
        json={
            "model": "test",
            "max_tokens": 5,
            "stream": True,
            "messages": [{"role": "user", "content": "w65 w66"}],
        },
        stream=True,
    )
    assert r.status_code == 200, r.text
    events = []
    for line in r.iter_lines():
        if line and line.startswith(b"data: "):
            events.append(_json.loads(line[6:]))
    kinds = [e["type"] for e in events]
    assert kinds[0] == "message_start"
    assert "content_block_start" in kinds
    assert "content_block_delta" in kinds
    assert kinds[-1] == "message_stop"
    text = "".join(
        e["delta"]["text"] for e in events if e["type"] == "content_block_delta"
    )
    assert len(text) > 0
    md = [e for e in events if e["type"] == "message_delta"][0]
    assert md["usage"]["output_tokens"] >= 1


def test_v1_rerank(server):
    r = requests.post(
        server + "/v1/rerank",
        json={
            "query": "w10 w11 w12",
            "documents": ["w10 w11 w12", "w90 w91", "w10 w11"],
            "top_n": 2,
        },
        timeout=120,
    )
    assert r.status_code == 200, r.text
    out = r.json()
    assert len(out["results"]) == 2
    # identical document must rank first with ~1.0 cosine score
    assert out["results"][0]["document"] == "w10 w11 w12"
    assert out["results"][0]["relevance_score"] > 0.99
    assert out["results"][0]["relevance_score"] >= out["results"][1]["relevance_score"]


def test_return_text_in_logprobs(server):
    r = requests.post(
        server + "/generate",
        json={
            "text": "w33 w34 w35",
            "sampling_params": {"temperature": 0, "max_new_tokens": 3,
                                "ignore_eos": True},
            "return_logprob": True,
            "top_logprobs_num": 2,
            "return_text_in_logprobs": True,
        },
        timeout=120,
    )
    assert r.status_code == 200, r.text
    meta = r.json()["meta_info"]
    for lp, tid, text in meta["output_token_logprobs"]:
        assert isinstance(text, str) and text
    for vals, ids, texts in meta["output_top_logprobs"]:
        assert len(texts) == len(ids)
        assert all(isinstance(t, str) for t in texts)


def test_parse_function_call_endpoint(server):
    text = ('<tool_call>\n{"name": "get_weather", "arguments": '
            '{"city": "Paris"}}\n</tool_call>')
    r = requests.post(
        server + "/parse_function_call",
        json={
            "text": text,
            "tool_call_parser": "qwen25",
            "tools": [{"type": "function",
                       "function": {"name": "get_weather"}}],
        },
        timeout=30,
    )
    assert r.status_code == 200
    out = r.json()
    assert out["calls"] and out["calls"][0]["name"] == "get_weather"


def test_separate_reasoning_endpoint(server):
    r = requests.post(
        server + "/separate_reasoning",
        json={
            "text": "<think>step by step</think>The answer is 4.",
            "reasoning_parser": "deepseek-r1",
        },
        timeout=30,
    )
    assert r.status_code == 200
    out = r.json()
    assert out["reasoning_text"] == "step by step"
    assert out["text"] == "The answer is 4."


def test_pause_continue_endpoints(server):
    assert requests.post(server + "/pause_generation", timeout=30
                         ).json()["success"]
    assert requests.post(server + "/continue_generation", timeout=30
                         ).json()["success"]
    # still serving afterwards
    r = requests.post(
        server + "/generate",
        json={"text": "hi", "sampling_params":
              {"max_new_tokens": 2, "ignore_eos": True}},
        timeout=120,
    )
    assert r.status_code == 200


def test_v1_score_endpoint(server):
    r = requests.post(
        server + "/v1/score",
        json={"query": [3, 5, 7], "items": [[2], [9, 4]],
              "label_token_ids": [10, 11], "apply_softmax": True},
        timeout=120,
    )
    assert r.status_code == 200
    out = r.json()
    assert len(out["scores"]) == 2
    for row in out["scores"]:
        assert len(row) == 2
        assert abs(sum(row) - 1.0) < 1e-5


def test_v1_responses(server):
    r = requests.post(
        server + "/v1/responses",
        json={"input": "w10 w11 w12", "max_output_tokens": 5},
        timeout=120,
    )
    assert r.status_code == 200, r.text
    out = r.json()
    assert out["object"] == "response"
    assert out["output"][0]["content"][0]["type"] == "output_text"
    assert out["output_text"] == out["output"][0]["content"][0]["text"]
    assert out["usage"]["output_tokens"] >= 1
    # message-list input + instructions
    r2 = requests.post(
        server + "/v1/responses",
        json={
            "instructions": "be brief",
            "input": [{"role": "user", "content": [
                {"type": "input_text", "text": "w13 w14"}]}],
            "max_output_tokens": 4,
        },
        timeout=120,
    )
    assert r2.status_code == 200, r2.text
    assert r2.json()["status"] in ("completed", "incomplete")
