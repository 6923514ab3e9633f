"""Reasoning-content separation (<think>...</think> family).

Ref: srt/parser/reasoning_parser.py — splits model output into
reasoning_content and content for DeepSeek-R1/QwQ/Qwen3-style models,
with streaming increments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

TOKEN_MAP = {
    "deepseek-r1": ("<think>", "</think>", True),
    "deepseek-v3": ("<think>", "</think>", False),
    "qwen3": ("<think>", "</think>", False),
    "qwen3-thinking": ("<think>", "</think>", True),
    "glm45": ("<think>", "</think>", False),
    "kimi": ("◁think▷", "◁/think▷", False),
    "step3": ("<think>", "</think>", True),
}


@dataclasses.dataclass
class ParseResult:
    reasoning_text: Optional[str]
    normal_text: Optional[str]


class ReasoningParser:
    """force_reasoning: model starts in reasoning mode without the open tag
    (DeepSeek-R1 emits `</think>` only).

    model_type "gpt-oss" routes through the Harmony channel parser
    (parser/harmony_parser.py): analysis channels -> reasoning_content,
    final channels -> content, tool-call blocks pass through as normal
    text for the function-call detector. Ref: srt/parser/harmony_parser.py
    + reasoning_parser.py's gpt-oss detector."""

    def __init__(self, model_type: str = "deepseek-r1",
                 stream_reasoning: bool = True):
        self._harmony = None
        if model_type in ("gpt-oss", "gpt_oss"):
            from sglang_tpu.parser.harmony_parser import HarmonyParser

            self._harmony = HarmonyParser()
            self.stream_reasoning = stream_reasoning
            return
        if model_type not in TOKEN_MAP:
            raise ValueError(
                f"unknown reasoning model type {model_type!r}; "
                f"have {sorted(TOKEN_MAP) + ['gpt-oss']}"
            )
        self.open_tag, self.close_tag, force = TOKEN_MAP[model_type]
        self.stream_reasoning = stream_reasoning
        self.in_reasoning = force
        self._buffer = ""

    def _harmony_result(self, events) -> ParseResult:
        reasoning = "".join(e.content for e in events
                            if e.type == "reasoning") or None
        normal_parts = [e.raw or e.content if e.type == "tool_call"
                        else e.content
                        for e in events if e.type in ("normal", "tool_call")]
        return ParseResult(reasoning, "".join(normal_parts) or None)

    def parse_non_stream(self, text: str) -> ParseResult:
        if self._harmony is not None:
            events = self._harmony.parse(text) + self._harmony.flush()
            res = self._harmony_result(events)
            return ParseResult(
                (res.reasoning_text or "").strip() or None,
                (res.normal_text or "").strip(),
            )
        in_reasoning = self.in_reasoning or self.open_tag in text
        if not in_reasoning:
            return ParseResult(None, text)
        body = text.replace(self.open_tag, "")
        if self.close_tag not in body:
            return ParseResult(body.strip(), "")
        reasoning, _, normal = body.partition(self.close_tag)
        return ParseResult(reasoning.strip(), normal.strip())

    def parse_stream_chunk(self, delta: str) -> ParseResult:
        """Returns the split for this increment."""
        if self._harmony is not None:
            res = self._harmony_result(self._harmony.parse(delta))
            if not self.stream_reasoning:
                res = ParseResult(None, res.normal_text)
            return res
        self._buffer += delta
        text = self._buffer
        if not self.in_reasoning and text.startswith(self.open_tag):
            self.in_reasoning = True
            text = text[len(self.open_tag):]
            self._buffer = text
        if not self.in_reasoning:
            # could still be a partial open tag
            if self.open_tag.startswith(text):
                return ParseResult(None, None)
            self._buffer = ""
            return ParseResult(None, text)
        if self.close_tag in text:
            reasoning, _, normal = text.partition(self.close_tag)
            self.in_reasoning = False
            self._buffer = ""
            return ParseResult(
                reasoning if self.stream_reasoning and reasoning else None,
                normal or None,
            )
        # hold back potential partial close tag
        safe = len(text)
        for i in range(1, len(self.close_tag)):
            if text.endswith(self.close_tag[:i]):
                safe = len(text) - i
                break
        out, self._buffer = text[:safe], text[safe:]
        if self.stream_reasoning and out:
            return ParseResult(out, None)
        return ParseResult(None, None)
