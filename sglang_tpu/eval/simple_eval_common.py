"""Shared machinery for the simple_eval_* accuracy harnesses.

Ref behavior: python/sglang/test/simple_eval_common.py — a chat sampler
hitting /v1/chat/completions plus answer-extraction/grading utilities.
Datasets must be local files (zero-egress image): each harness takes a
--data-path csv/jsonl instead of downloading.
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import urllib.request


@dataclass
class EvalResult:
    score: float
    metrics: Dict[str, float] = field(default_factory=dict)
    n: int = 0


class ChatCompletionSampler:
    """Minimal OpenAI-chat sampler against a running server."""

    def __init__(self, base_url: str, model: str = "default",
                 temperature: float = 0.0, max_tokens: int = 1024,
                 system_message: Optional[str] = None):
        self.url = base_url.rstrip("/") + "/v1/chat/completions"
        self.model = model
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.system_message = system_message

    def __call__(self, messages: List[Dict[str, str]]) -> str:
        if self.system_message:
            messages = [{"role": "system",
                         "content": self.system_message}] + messages
        body = json.dumps({
            "model": self.model,
            "messages": messages,
            "temperature": self.temperature,
            "max_tokens": self.max_tokens,
        }).encode()
        req = urllib.request.Request(
            self.url, data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = json.loads(resp.read())
        return out["choices"][0]["message"]["content"] or ""


def map_with_progress(fn, items, num_threads: int = 8) -> List[Any]:
    """Thread-pool map preserving order (evals are IO-bound)."""
    results: List[Any] = [None] * len(items)
    lock = threading.Lock()
    idx = {"v": 0}

    def worker():
        while True:
            with lock:
                i = idx["v"]
                if i >= len(items):
                    return
                idx["v"] += 1
            results[i] = fn(items[i])

    threads = [threading.Thread(target=worker)
               for _ in range(min(num_threads, max(1, len(items))))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results


ANSWER_PATTERN_MULTICHOICE = re.compile(
    r"(?i)Answer[ \t]*:[ \t]*\$?([A-D])\$?"
)
ANSWER_PATTERN = re.compile(r"(?i)Answer[ \t]*:[ \t]*([^\n]+)")

MULTILINGUAL_ANSWER_REGEXES = [
    r"Answer\s*:", r"Respuesta\s*:", r"Réponse\s*:", r"Antwort\s*:",
    r"答案\s*[:：]", r"答え\s*[:：]", r"উত্তর\s*[:：]", r"Jawaban\s*:",
]


def extract_mc_answer(response: str) -> Optional[str]:
    m = ANSWER_PATTERN_MULTICHOICE.search(response)
    return m.group(1).upper() if m else None


def normalize_number(s: str) -> str:
    return s.replace(",", "").replace("$", "").strip().rstrip(".")


def math_equal(a: str, b: str) -> bool:
    """Loose numeric/string equality for MATH-style answers."""
    a, b = normalize_number(a), normalize_number(b)
    if a == b:
        return True
    try:
        return abs(float(a) - float(b)) < 1e-6
    except (TypeError, ValueError):
        return False


def aggregate(scores: List[float]) -> EvalResult:
    n = len(scores)
    return EvalResult(
        score=(sum(scores) / n) if n else 0.0,
        metrics={"n": float(n)},
        n=n,
    )
