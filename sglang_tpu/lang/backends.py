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

    def generate(self, prompt, spec) -> str:
        out = self.engine.generate(
            prompt=self._to_text(prompt),
            sampling_params=_sampling_from_gen(spec),
        )
        return out["text"]


class RuntimeEndpoint:
    def __init__(self, base_url: str, timeout: float = 300):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        import requests

        self._requests = requests

    def generate(self, prompt, spec) -> str:
        body: Dict[str, Any] = {"sampling_params": _sampling_from_gen(spec)}
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
