"""DSL execution backends.

Ref: python/sglang/lang/backend/{runtime_endpoint.py, base_backend.py}.
EngineBackend runs in-process against sglang_tpu.entrypoints.engine.Engine;
RuntimeEndpoint speaks HTTP /generate to a running server.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union


def _sampling_from_gen(spec) -> Dict[str, Any]:
    sp = {
        "max_new_tokens": spec.max_tokens,
        "temperature": spec.temperature,
        "top_p": spec.top_p,
        "top_k": spec.top_k,
        "ignore_eos": spec.ignore_eos,
    }
    if spec.stop:
        sp["stop"] = spec.stop
    if spec.regex:
        sp["regex"] = spec.regex
    if spec.json_schema:
        sp["json_schema"] = spec.json_schema
    return sp


class EngineBackend:
    def __init__(self, engine):
        self.engine = engine
        self.tokenizer = engine.tokenizer_manager.tokenizer

    def _to_text(self, prompt) -> str:
        if isinstance(prompt, str):
            return prompt
        # chat messages -> template
        try:
            return self.tokenizer.apply_chat_template(
                prompt, tokenize=False, add_generation_prompt=True
            )
        except Exception:
            out = ""
            for m in prompt:
                out += f"<|{m['role']}|>\n{m['content']}\n"
            return out + "<|assistant|>\n"

    def generate(self, prompt, spec, images=None, videos=None) -> str:
        out = self.engine.generate(
            prompt=self._to_text(prompt),
            sampling_params=_sampling_from_gen(spec),
            image_data=images,
            video_data=videos,
        )
        return out["text"]


class RuntimeEndpoint:
    def __init__(self, base_url: str, timeout: float = 300):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        import requests

        self._requests = requests

    def generate(self, prompt, spec, images=None, videos=None) -> str:
        body: Dict[str, Any] = {"sampling_params": _sampling_from_gen(spec)}
        if images:
            body["image_data"] = images
        if videos:
            body["video_data"] = videos
        if isinstance(prompt, str):
            body["text"] = prompt
        else:
            # join chat messages server-side via /v1/chat? keep /generate:
            body["text"] = "".join(
                f"<|{m['role']}|>\n{m['content']}\n" for m in prompt
            ) + "<|assistant|>\n"
        r = self._requests.post(
            self.base_url + "/generate", json=body, timeout=self.timeout
        )
        r.raise_for_status()
        return r.json()["text"]


class _ChatHTTPBackend:
    """Shared remote chat-protocol driver (requests-based, blocking)."""

    def __init__(self, base_url: str, api_key: str = "", model: str = "",
                 timeout: float = 300):
        import requests

        self._requests = requests
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.timeout = timeout

    def _messages(self, prompt) -> List[Dict[str, str]]:
        if isinstance(prompt, str):
            return [{"role": "user", "content": prompt}]
        return list(prompt)


class OpenAIBackend(_ChatHTTPBackend):
    """Remote OpenAI-protocol backend (ref lang/backend/openai.py):
    points at api.openai.com or ANY OpenAI-compatible server — including
    this framework's own /v1/chat/completions."""

    def generate(self, prompt, spec, images=None, videos=None) -> str:
        if images or videos:
            raise NotImplementedError(
                "OpenAIBackend: pass media inside message content parts"
            )
        body = {
            "model": self.model,
            "messages": self._messages(prompt),
            "max_tokens": spec.max_tokens,
            "temperature": spec.temperature,
            "top_p": spec.top_p,
        }
        if spec.stop:
            body["stop"] = spec.stop
        if spec.regex:
            # OpenAI-protocol servers with extensions accept this field;
            # pure OpenAI ignores it (select() then relies on stop/temp).
            body["regex"] = spec.regex
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        r = self._requests.post(
            self.base_url + "/v1/chat/completions", json=body,
            headers=headers, timeout=self.timeout,
        )
        r.raise_for_status()
        return r.json()["choices"][0]["message"]["content"] or ""


class AnthropicBackend(_ChatHTTPBackend):
    """Remote Anthropic-protocol backend (ref lang/backend/anthropic.py):
    /v1/messages — works against api.anthropic.com or this framework's
    own Anthropic-compatible endpoint."""

    def generate(self, prompt, spec, images=None, videos=None) -> str:
        if images or videos:
            raise NotImplementedError(
                "AnthropicBackend: pass media inside message content parts"
            )
        msgs = self._messages(prompt)
        system = None
        if msgs and msgs[0]["role"] == "system":
            system = msgs[0]["content"]
            msgs = msgs[1:]
        body = {
            "model": self.model,
            "messages": msgs,
            "max_tokens": spec.max_tokens,
            "temperature": spec.temperature,
        }
        if system:
            body["system"] = system
        if spec.stop:
            body["stop_sequences"] = spec.stop
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["x-api-key"] = self.api_key
        r = self._requests.post(
            self.base_url + "/v1/messages", json=body, headers=headers,
            timeout=self.timeout,
        )
        r.raise_for_status()
        content = r.json().get("content") or []
        return "".join(c.get("text", "") for c in content
                       if c.get("type") == "text")
