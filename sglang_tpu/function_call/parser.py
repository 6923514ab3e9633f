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


def _balanced_end(text: str, start: int) -> int:
    """End index (exclusive) of the balanced JSON value at `start`, or -1
    if incomplete."""
    depth = 0
    in_str = False
    esc = False
    for j in range(start, len(text)):
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
                return j + 1
    return -1


def _partial_suffix_len(text: str, token: str) -> int:
    """Length of the longest proper suffix of text that is a prefix of
    token (holdback so a split marker isn't emitted as normal text)."""
    m = min(len(text), len(token) - 1)
    for k in range(m, 0, -1):
        if token.startswith(text[-k:]):
            return k
    return 0


class BaseDetector:
    name = "base"
    bot_token = ""
    eot_token = ""

    def __init__(self):
        self._sbuf = ""  # streaming: unconsumed text
        self._n_stream_calls = 0

    def has_tool_call(self, text: str) -> bool:
        return bool(self.bot_token) and self.bot_token in text

    def parse_streaming_increment(self, delta: str, tools) -> ParseResult:
        """Incremental SSE parse (ref base_format_detector.py
        parse_streaming_increment / serving_chat.py:1443): returns normal
        text that is safe to emit now plus any tool calls that COMPLETED
        with this increment. Marker-split text is held back until resolved.
        """
        self._sbuf += delta
        normal_parts: List[str] = []
        calls: List[ToolCallItem] = []
        while True:
            buf = self._sbuf
            pos = buf.find(self.bot_token) if self.bot_token else -1
            if pos < 0:
                hold = _partial_suffix_len(buf, self.bot_token) if self.bot_token else 0
                emit = buf[: len(buf) - hold]
                normal_parts.append(emit)
                self._sbuf = buf[len(buf) - hold:]
                break
            normal_parts.append(buf[:pos])
            body_start = pos + len(self.bot_token)
            done, consumed_end, call_items = self._stream_complete_call(
                buf, body_start, tools
            )
            if not done:
                self._sbuf = buf[pos:]
                break
            for item in call_items:
                item.tool_index = self._n_stream_calls
                self._n_stream_calls += 1
                calls.append(item)
            self._sbuf = buf[consumed_end:]
        return ParseResult("".join(normal_parts), calls)

    def _stream_complete_call(self, buf: str, body_start: int, tools):
        """Try to complete ONE call whose marker starts the body at
        body_start. Returns (done, consumed_end, calls)."""
        if self.eot_token:
            end = buf.find(self.eot_token, body_start)
            if end < 0:
                return False, 0, []
            obj = _try_json(buf[body_start:end].strip())
            item = self._extract(obj, tools) if obj else None
            return True, end + len(self.eot_token), [item] if item else []
        # no end marker: wait for a balanced JSON value
        k = body_start
        while k < len(buf) and buf[k] not in "{[":
            k += 1
        if k >= len(buf):
            return False, 0, []
        end = _balanced_end(buf, k)
        if end < 0:
            return False, 0, []
        obj = _try_json(buf[k:end])
        items = []
        if obj is not None:
            objs = obj if isinstance(obj, list) else [obj]
            for o in objs:
                it = self._extract(o, tools)
                if it:
                    items.append(it)
        return True, end, items

    def finish_streaming(self, tools) -> ParseResult:
        """Flush held-back text at end of stream."""
        rest, self._sbuf = self._sbuf, ""
        return ParseResult(rest, [])

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

    def parse_streaming_increment(self, delta: str, tools) -> ParseResult:
        # Llama3 may emit bare {"name":...} with no marker: once the stream
        # starts with "{", hold it and wait for balanced JSON.
        self._sbuf += delta
        buf = self._sbuf
        if self.bot_token not in buf and buf.lstrip().startswith("{"):
            k = buf.find("{")
            end = _balanced_end(buf, k)
            if end < 0:
                return ParseResult("", [])
            obj = _try_json(buf[k:end])
            item = self._extract(obj, tools) if obj else None
            self._sbuf = buf[end:].lstrip("; \n")
            if item:
                item.tool_index = self._n_stream_calls
                self._n_stream_calls += 1
                return ParseResult("", [item])
            out, self._sbuf = buf[:end], self._sbuf
            return ParseResult(out, [])
        self._sbuf = ""
        return super().parse_streaming_increment(buf, tools)

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
    """Mistral tool calls (ref mistral_detector.py). Two wire formats:
    1) JSON array:  [TOOL_CALLS] [{"name":..., "arguments":{...}}, ...]
    2) Compact (v11+ templates): [TOOL_CALLS]name[ARGS]{...}"""

    name = "mistral"
    bot_token = "[TOOL_CALLS]"
    _compact_re = re.compile(r"^\s*([\w.\-]+)\s*(?:\[ARGS\])?\s*(?=\{)")

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        calls = []
        m = self._compact_re.match(payload)
        if m:
            # compact: one call, name then JSON args
            end = _balanced_end(payload, m.end())
            obj = _try_json(payload[m.end():end]) if end > 0 else None
            item = self._extract(
                {"name": m.group(1), "arguments": obj or {}}, tools
            )
            if item:
                calls.append(item)
            return ParseResult(pre.strip(), calls)
        found = _find_json_objects(payload)
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

    def parse_streaming_increment(self, delta: str, tools) -> ParseResult:
        self._sbuf += delta
        normal_parts: List[str] = []
        calls: List[ToolCallItem] = []
        while True:
            buf = self._sbuf
            k = min(
                (i for i in (buf.find("{"), buf.find("[")) if i >= 0),
                default=-1,
            )
            if k < 0:
                normal_parts.append(buf)
                self._sbuf = ""
                break
            normal_parts.append(buf[:k])
            end = _balanced_end(buf, k)
            if end < 0:
                self._sbuf = buf[k:]
                break
            obj = _try_json(buf[k:end])
            items = []
            if obj is not None:
                for o in obj if isinstance(obj, list) else [obj]:
                    it = self._extract(o, tools)
                    if it:
                        items.append(it)
            if items:
                for it in items:
                    it.tool_index = self._n_stream_calls
                    self._n_stream_calls += 1
                    calls.append(it)
            else:
                normal_parts.append(buf[k:end])
            self._sbuf = buf[end:]
        return ParseResult("".join(normal_parts), calls)

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


class DeepSeekV3Detector(BaseDetector):
    """DeepSeek-V3/R1 tool-call markup (ref deepseekv3_detector.py):
    <｜tool▁calls▁begin｜><｜tool▁call▁begin｜>fn<｜tool▁sep｜>{name}
    ```json
    {args}
    ```<｜tool▁call▁end｜>...<｜tool▁calls▁end｜>"""

    name = "deepseekv3"
    bot_token = "<｜tool▁calls▁begin｜>"
    eot_token = "<｜tool▁calls▁end｜>"
    _call_re = re.compile(
        r"<｜tool▁call▁begin｜>.*?<｜tool▁sep｜>(.*?)\n```json\n(.*?)\n```",
        re.DOTALL,
    )

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        calls = []
        for m in self._call_re.finditer(payload):
            obj = {"name": m.group(1).strip(),
                   "arguments": _try_json(m.group(2).strip()) or {}}
            item = self._extract(obj, tools)
            if item:
                item.tool_index = len(calls)
                calls.append(item)
        return ParseResult(pre.strip(), calls)


class DeepSeekV31Detector(DeepSeekV3Detector):
    """DeepSeek-V3.1 simplified markup (ref deepseekv31_detector.py):
    <｜tool▁call▁begin｜>{name}<｜tool▁sep｜>{json args}<｜tool▁call▁end｜>
    — no per-call type tag and no ```json fence (unlike V3/R1)."""

    name = "deepseekv31"
    _call_re = re.compile(
        r"<｜tool▁call▁begin｜>(.*?)<｜tool▁sep｜>(.*?)<｜tool▁call▁end｜>",
        re.DOTALL,
    )


class KimiK2Detector(BaseDetector):
    """Kimi K2 tool-call markup (ref kimik2_detector.py):
    <|tool_calls_section_begin|><|tool_call_begin|>functions.{name}:{i}
    <|tool_call_argument_begin|>{json}<|tool_call_end|>...
    <|tool_calls_section_end|>"""

    name = "kimi_k2"
    bot_token = "<|tool_calls_section_begin|>"
    eot_token = "<|tool_calls_section_end|>"
    _call_re = re.compile(
        r"<\|tool_call_begin\|>\s*([^\s<|]+)\s*"
        r"<\|tool_call_argument_begin\|>\s*(\{.*?\})\s*<\|tool_call_end\|>",
        re.DOTALL,
    )
    _id_re = re.compile(r"^(?:functions\.)?([\w.\-]+):(\d+)$")

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        calls = []
        for m in self._call_re.finditer(payload):
            mid = self._id_re.match(m.group(1))
            name = mid.group(1) if mid else m.group(1)
            obj = {"name": name,
                   "arguments": _try_json(m.group(2)) or {}}
            item = self._extract(obj, tools)
            if item:
                item.tool_index = len(calls)
                calls.append(item)
        return ParseResult(pre.strip(), calls)


class Glm4MoeDetector(BaseDetector):
    """GLM-4.5/4.6 XML-ish per-call markup (ref glm4_moe_detector.py):
    <tool_call>{name}\\n<arg_key>k</arg_key><arg_value>v</arg_value>...
    </tool_call>. Values are cast by the tool schema's parameter type."""

    name = "glm45"
    bot_token = "<tool_call>"
    eot_token = "</tool_call>"
    _arg_re = re.compile(
        r"<arg_key>(.*?)</arg_key>(?:\\n|\s)*<arg_value>(.*?)</arg_value>",
        re.DOTALL,
    )

    @staticmethod
    def _cast(name: str, key: str, val: str, tools):
        t = None
        for tool in tools or []:
            fn = tool.get("function", tool)
            if fn.get("name") == name:
                props = (fn.get("parameters") or {}).get("properties") or {}
                t = (props.get(key) or {}).get("type")
        v = val.strip()
        try:
            if t == "integer":
                return int(v)
            if t == "number":
                return float(v)
            if t == "boolean":
                return v.lower() == "true"
            if t in ("object", "array"):
                return json.loads(v)
        except Exception:  # noqa: BLE001
            pass
        return v

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
            body = body.strip()
            name = body.split("\n", 1)[0].split("\\n", 1)[0].strip()
            args = {
                k.strip(): self._cast(name, k.strip(), v, tools)
                for k, v in self._arg_re.findall(body)
            }
            item = self._extract({"name": name, "arguments": args}, tools)
            if item:
                item.tool_index = len(calls)
                calls.append(item)
        normal_parts.append(rest)
        return ParseResult("".join(normal_parts).strip(), calls)


def _pythonic_calls(src: str, tools) -> List[ToolCallItem]:
    """Parse `[fn(a=1, b="x"), g(y=[2])]` (Python literal args) into calls.
    Ref: pythonic_detector.py (Llama-4 default template)."""
    import ast

    try:
        tree = ast.parse(src.strip(), mode="eval")
    except SyntaxError:
        return []
    node = tree.body
    elts = node.elts if isinstance(node, ast.List) else [node]
    calls: List[ToolCallItem] = []
    for e in elts:
        if not isinstance(e, ast.Call) or not isinstance(e.func, ast.Name):
            return []
        args = {}
        for kw in e.keywords:
            if kw.arg is None:
                return []
            try:
                args[kw.arg] = ast.literal_eval(kw.value)
            except (ValueError, SyntaxError):
                return []
        name = e.func.id
        if tools is not None:
            valid = {t["function"]["name"] for t in tools}
            if name not in valid:
                continue
        calls.append(ToolCallItem(len(calls), name,
                                  json.dumps(args, ensure_ascii=False)))
    return calls


class PythonicDetector(BaseDetector):
    """Llama-4 pythonic format: [fn(a=1), g(b="x")] with Python literals.
    Ref: pythonic_detector.py."""

    name = "pythonic"
    _list_re = re.compile(r"\[\s*[A-Za-z_]\w*\s*\(.*?\)\s*\]", re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return bool(self._list_re.search(text))

    def parse_streaming_increment(self, delta: str, tools) -> ParseResult:
        self._sbuf += delta
        buf = self._sbuf
        k = buf.find("[")
        if k < 0:
            self._sbuf = ""
            return ParseResult(buf, [])
        end = _balanced_end(buf, k)
        if end < 0:
            # hold from the bracket on
            self._sbuf = buf[k:]
            return ParseResult(buf[:k], [])
        calls = _pythonic_calls(buf[k:end], tools)
        self._sbuf = buf[end:]
        for c in calls:
            c.tool_index = self._n_stream_calls
            self._n_stream_calls += 1
        if calls:
            return ParseResult(buf[:k], calls)
        return ParseResult(buf[:end], [])

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        m = self._list_re.search(text)
        if not m:
            return ParseResult(text, [])
        calls = _pythonic_calls(m.group(0), tools)
        if not calls:
            return ParseResult(text, [])
        normal = (text[: m.start()] + text[m.end():]).strip()
        return ParseResult(normal, calls)


class Lfm2Detector(BaseDetector):
    """LFM2: <|tool_call_start|>[pythonic or JSON]<|tool_call_end|>.
    Ref: lfm2_detector.py."""

    name = "lfm2"
    bot_token = "<|tool_call_start|>"
    eot_token = "<|tool_call_end|>"

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        calls: List[ToolCallItem] = []
        normal_parts = []
        rest = text
        while self.bot_token in rest:
            pre, rest = rest.split(self.bot_token, 1)
            normal_parts.append(pre)
            if self.eot_token in rest:
                body, rest = rest.split(self.eot_token, 1)
            else:
                body, rest = rest, ""
            body = body.strip()
            obj = _try_json(body)
            if obj is not None:
                for o in obj if isinstance(obj, list) else [obj]:
                    it = self._extract(o, tools)
                    if it:
                        it.tool_index = len(calls)
                        calls.append(it)
            else:
                for it in _pythonic_calls(body, tools):
                    it.tool_index = len(calls)
                    calls.append(it)
        normal_parts.append(rest)
        return ParseResult("".join(normal_parts).strip(), calls)


def _schema_cast(name: str, key: str, val: str, tools):
    """Cast a string parameter value using the tool schema's declared type
    (shared by the XML-parameter formats)."""
    t = None
    for tool in tools or []:
        fn = tool.get("function", tool)
        if fn.get("name") == name:
            props = (fn.get("parameters") or {}).get("properties") or {}
            t = (props.get(key) or {}).get("type")
    v = val.strip()
    try:
        if t == "integer":
            return int(v)
        if t == "number":
            return float(v)
        if t == "boolean":
            return v.lower() == "true"
        if t in ("object", "array"):
            return json.loads(v)
    except Exception:  # noqa: BLE001
        pass
    return v


class Qwen3CoderDetector(BaseDetector):
    """Qwen3-Coder XML: <tool_call><function=NAME><parameter=KEY>value
    </parameter>...</function></tool_call>. Ref: qwen3_coder_detector.py."""

    name = "qwen3_coder"
    bot_token = "<tool_call>"
    eot_token = "</tool_call>"
    _fn_re = re.compile(r"<function=([^>\n]+)>(.*?)(?:</function>|$)",
                        re.DOTALL)
    _param_re = re.compile(
        r"<parameter=([^>\n]+)>(.*?)(?:</parameter>|(?=<parameter=)|$)",
        re.DOTALL,
    )

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        calls: List[ToolCallItem] = []
        normal_parts = []
        rest = text
        while self.bot_token in rest:
            pre, rest = rest.split(self.bot_token, 1)
            normal_parts.append(pre)
            if self.eot_token in rest:
                body, rest = rest.split(self.eot_token, 1)
            else:
                body, rest = rest, ""
            for fm in self._fn_re.finditer(body):
                fname = fm.group(1).strip()
                args = {
                    pm.group(1).strip(): _schema_cast(
                        fname, pm.group(1).strip(),
                        pm.group(2).strip("\n"), tools
                    )
                    for pm in self._param_re.finditer(fm.group(2))
                }
                it = self._extract({"name": fname, "arguments": args}, tools)
                if it:
                    it.tool_index = len(calls)
                    calls.append(it)
        normal_parts.append(rest)
        return ParseResult("".join(normal_parts).strip(), calls)


class Step3Detector(BaseDetector):
    """Step3 steptml: <｜tool_calls_begin｜>...<steptml:invoke name="fn">
    <steptml:parameter name="k">v</steptml:parameter></steptml:invoke>
    ...<｜tool_calls_end｜>. Ref: step3_detector.py."""

    name = "step3"
    bot_token = "<｜tool_calls_begin｜>"
    eot_token = "<｜tool_calls_end｜>"
    _invoke_re = re.compile(
        r'<steptml:invoke name="([^"]+)">(.*?)</steptml:invoke>', re.DOTALL
    )
    _param_re = re.compile(
        r'<steptml:parameter name="([^"]+)">(.*?)</steptml:parameter>',
        re.DOTALL,
    )

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        calls: List[ToolCallItem] = []
        for m in self._invoke_re.finditer(payload):
            fname = m.group(1)
            args = {
                pm.group(1): _schema_cast(fname, pm.group(1), pm.group(2),
                                          tools)
                for pm in self._param_re.finditer(m.group(2))
            }
            it = self._extract({"name": fname, "arguments": args}, tools)
            if it:
                it.tool_index = len(calls)
                calls.append(it)
        return ParseResult(pre.strip(), calls)


class MinimaxM2Detector(BaseDetector):
    """MiniMax M2/M3: <minimax:tool_call><invoke name="fn"><parameter
    name="k">v</parameter></invoke></minimax:tool_call>.
    Ref: minimax_m2.py."""

    name = "minimax"
    bot_token = "<minimax:tool_call>"
    eot_token = "</minimax:tool_call>"
    _invoke_re = re.compile(r'<invoke name="([^"]+)">(.*?)</invoke>',
                            re.DOTALL)
    _param_re = re.compile(
        r'<parameter name="([^"]+)">(.*?)</parameter>', re.DOTALL
    )

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        calls: List[ToolCallItem] = []
        for m in self._invoke_re.finditer(payload):
            fname = m.group(1)
            args = {
                pm.group(1): _schema_cast(fname, pm.group(1), pm.group(2),
                                          tools)
                for pm in self._param_re.finditer(m.group(2))
            }
            it = self._extract({"name": fname, "arguments": args}, tools)
            if it:
                it.tool_index = len(calls)
                calls.append(it)
        return ParseResult(pre.strip(), calls)


class InternlmDetector(BaseDetector):
    """InternLM2/Intern-S1: text<|action_start|><|plugin|>{json}
    <|action_end|>. Ref: internlm_detector.py."""

    name = "internlm"
    bot_token = "<|action_start|>"
    eot_token = "<|action_end|>"

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        payload = payload.replace("<|plugin|>", "").strip()
        calls: List[ToolCallItem] = []
        for _, _, obj in _find_json_objects(payload):
            for o in obj if isinstance(obj, list) else [obj]:
                it = self._extract(o, tools)
                if it:
                    it.tool_index = len(calls)
                    calls.append(it)
        return ParseResult(pre.strip(), calls)


class CommandADetector(BaseDetector):
    """Cohere Command: <|START_ACTION|>[{"tool_name":..., "parameters":
    {...}}, ...]<|END_ACTION|>. Ref: cohere_command4_detector.py."""

    name = "command"
    bot_token = "<|START_ACTION|>"
    eot_token = "<|END_ACTION|>"

    def _extract(self, obj, tools):
        if isinstance(obj, dict) and "tool_name" in obj:
            obj = {"name": obj.get("tool_name"),
                   "arguments": obj.get("parameters", {})}
        return super()._extract(obj, tools)

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        calls: List[ToolCallItem] = []
        for _, _, obj in _find_json_objects(payload):
            for o in obj if isinstance(obj, list) else [obj]:
                it = self._extract(o, tools)
                if it:
                    it.tool_index = len(calls)
                    calls.append(it)
            if calls:
                break
        return ParseResult(pre.strip(), calls)


class GptOssDetector(BaseDetector):
    """GPT-OSS harmony commentary calls: <|channel|>commentary
    to=ns.fn <|constrain|>json<|message|>{args}<|call|>.
    Ref: gpt_oss_detector.py (HarmonyParser tool events)."""

    name = "gpt_oss"
    bot_token = "<|channel|>commentary to="
    _call_re = re.compile(
        r"<\|channel\|>commentary to=([\w.\-]+)\s*"
        r"(?:<\|constrain\|>json)?\s*<\|message\|>(.*?)(?:<\|call\|>|$)",
        re.DOTALL,
    )

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        calls: List[ToolCallItem] = []
        normal = text
        spans = []
        for m in self._call_re.finditer(text):
            fname = m.group(1).split(".")[-1]
            obj = _try_json(m.group(2).strip())
            it = self._extract({"name": fname, "arguments": obj or {}},
                               tools)
            if it:
                it.tool_index = len(calls)
                calls.append(it)
                spans.append((m.start(), m.end()))
        for s, e in reversed(spans):
            normal = normal[:s] + normal[e:]
        return ParseResult(normal.strip(), calls)


class TrinityDetector(Qwen25Detector):
    """Trinity: Qwen-style <tool_call> blocks that may sit inside <think>
    sections — strip the think tags, then parse. Ref: trinity_detector.py."""

    name = "trinity"

    @staticmethod
    def _strip_think(text: str) -> str:
        return text.replace("<think>", "").replace("</think>", "")

    def has_tool_call(self, text: str) -> bool:
        return super().has_tool_call(self._strip_think(text))

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        return super().detect_and_parse(self._strip_think(text), tools)

    def parse_streaming_increment(self, delta: str, tools) -> ParseResult:
        return super().parse_streaming_increment(self._strip_think(delta),
                                                 tools)


class Gemma4Detector(BaseDetector):
    """Gemma4: <|tool_call>call:name{k: <|\"|>str<|\"|>, n: 3}<tool_call|>
    — a custom key:value grammar where strings are delimited by <|\"|>
    and everything else is a JSON-ish literal. Ref: gemma4_detector.py."""

    name = "gemma4"
    bot_token = "<|tool_call>"
    eot_token = "<tool_call|>"
    STRING_DELIM = '<|"|>'

    def _parse_value(self, s: str):
        s = s.strip()
        if s == "true":
            return True
        if s == "false":
            return False
        if s == "null":
            return None
        v = _try_json(s)
        if v is not None:
            return v
        try:
            return int(s)
        except ValueError:
            pass
        try:
            return float(s)
        except ValueError:
            return s

    def _parse_args(self, src: str) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        i, n = 0, len(src)
        D = self.STRING_DELIM
        while i < n:
            while i < n and src[i] in " ,\n\t":
                i += 1
            if i >= n:
                break
            j = src.find(":", i)
            if j < 0:
                break
            key = src[i:j].strip()
            i = j + 1
            while i < n and src[i] in " \n\t":
                i += 1
            if src.startswith(D, i):
                i += len(D)
                end = src.find(D, i)
                if end < 0:
                    out[key] = src[i:]
                    break
                out[key] = src[i:end]
                i = end + len(D)
            elif i < n and src[i] in "{[":
                end = _balanced_end(src, i)
                if end < 0:
                    end = n
                out[key] = self._parse_value(src[i:end])
                i = end
            else:
                end = i
                while end < n and src[end] not in ",":
                    end += 1
                out[key] = self._parse_value(src[i:end])
                i = end
        return out

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        calls: List[ToolCallItem] = []
        normal_parts = []
        rest = text
        while self.bot_token in rest:
            pre, rest = rest.split(self.bot_token, 1)
            normal_parts.append(pre)
            if self.eot_token in rest:
                body, rest = rest.split(self.eot_token, 1)
            else:
                body, rest = rest, ""
            body = body.strip()
            if not body.startswith("call:"):
                continue
            brace = body.find("{")
            if brace < 0:
                continue
            fname = body[5:brace].strip()
            end = _balanced_end(body, brace)
            args_src = body[brace + 1: (end - 1) if end > 0 else len(body)]
            it = self._extract(
                {"name": fname, "arguments": self._parse_args(args_src)},
                tools,
            )
            if it:
                it.tool_index = len(calls)
                calls.append(it)
        normal_parts.append(rest)
        return ParseResult("".join(normal_parts).strip(), calls)


class DsmlDetector(BaseDetector):
    """DeepSeek V3.2/V4 DSML markup (ref deepseekv32_detector.py,
    deepseekv4_detector.py): <｜DSML｜{wrapper}> blocks containing
    <｜DSML｜invoke name="fn"> with either XML parameter tags
    (<｜DSML｜parameter name="k" string="true">v</｜DSML｜parameter>) or a
    direct JSON object body. string="true" keeps raw text; otherwise the
    value is JSON-decoded (fallback: schema cast)."""

    name = "deepseekv32"
    wrapper = "function_calls"
    _invoke_re = re.compile(
        r'<｜DSML｜invoke name="([^"]+)">(.*?)(?:</｜DSML｜invoke>|$)',
        re.DOTALL,
    )
    _param_re = re.compile(
        r'<｜DSML｜parameter\s+name="([^"]+)"(?:\s+string="([^"]+)")?\s*>'
        r"(.*?)</｜DSML｜parameter>",
        re.DOTALL,
    )

    def __init__(self):
        super().__init__()
        self.bot_token = f"<｜DSML｜{self.wrapper}>"
        self.eot_token = f"</｜DSML｜{self.wrapper}>"

    def _stream_complete_call(self, buf: str, body_start: int, tools):
        end = buf.find(self.eot_token, body_start)
        if end < 0:
            return False, 0, []
        res = self._parse_block(buf[body_start:end], tools)
        return True, end + len(self.eot_token), res

    def _parse_block(self, block: str, tools) -> List[ToolCallItem]:
        calls: List[ToolCallItem] = []
        for m in self._invoke_re.finditer(block):
            fname, body = m.group(1), m.group(2)
            args: Dict[str, Any] = {}
            params = self._param_re.findall(body)
            if params:
                for k, is_str, v in params:
                    if is_str == "true":
                        args[k] = v
                    else:
                        parsed = _try_json(v.strip())
                        args[k] = (parsed if parsed is not None
                                   else _schema_cast(fname, k, v, tools))
            else:
                found = _find_json_objects(body)
                if found and isinstance(found[0][2], dict):
                    args = found[0][2]
            it = self._extract({"name": fname, "arguments": args}, tools)
            if it:
                it.tool_index = len(calls)
                calls.append(it)
        return calls

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        return ParseResult(pre.strip(), self._parse_block(payload, tools))


class DeepSeekV4Detector(DsmlDetector):
    """DeepSeek V4: same DSML markup, wrapper tag is tool_calls."""

    name = "deepseekv4"
    wrapper = "tool_calls"


class InklingDetector(BaseDetector):
    """Inkling channel markup (ref inkling_detector.py +
    parser/inkling_tokenizer.py):
    <|message_model|>name<|content_invoke_tool_json|>
    {"name":"...","args":{...}}<|end_message|>
    The JSON body carries the tool name and an "args" object."""

    name = "inkling"
    bot_token = "<|content_invoke_tool_json|>"
    eot_token = "<|end_message|>"
    _msg_token = "<|message_model|>"

    def _extract(self, obj, tools):
        if isinstance(obj, dict) and "args" in obj and (
                "arguments" not in obj):
            obj = {**obj, "arguments": obj["args"]}
        return super()._extract(obj, tools)

    def parse_streaming_increment(self, delta: str, tools) -> ParseResult:
        """Streaming twin of detect_and_parse: the <|message_model|>name
        header preceding a tool frame must be held back and stripped, not
        leaked as normal text (the inherited path knows only bot_token)."""
        self._sbuf += delta
        normal_parts: List[str] = []
        calls: List[ToolCallItem] = []
        while True:
            buf = self._sbuf
            pos = buf.find(self.bot_token)
            if pos < 0:
                h = buf.rfind(self._msg_token)
                if h >= 0:
                    after = buf[h + len(self._msg_token):]
                    first = after.find("<|")
                    # Could this still become `<|message_model|>name<bot>`?
                    # Yes while `after` is a short bare name, possibly
                    # ending in a partial bot_token — then hold from the
                    # header. A complete different frame token or a long
                    # tail means it is not a tool frame: emit it.
                    maybe_tool = (
                        first < 0 and len(after) <= 96
                    ) or (
                        first >= 0
                        and self.bot_token.startswith(after[first:])
                    )
                    if maybe_tool:
                        normal_parts.append(buf[:h])
                        self._sbuf = buf[h:]
                        break
                hold = _partial_suffix_len(buf, self.bot_token)
                hold = max(hold, _partial_suffix_len(buf, self._msg_token))
                normal_parts.append(buf[: len(buf) - hold])
                self._sbuf = buf[len(buf) - hold:]
                break
            head = buf.rfind(self._msg_token, 0, pos)
            cut = head if head >= 0 else pos
            normal_parts.append(buf[:cut])
            done, consumed_end, call_items = self._stream_complete_call(
                buf, pos + len(self.bot_token), tools
            )
            if not done:
                self._sbuf = buf[cut:]
                break
            for item in call_items:
                item.tool_index = self._n_stream_calls
                self._n_stream_calls += 1
                calls.append(item)
            self._sbuf = buf[consumed_end:]
        return ParseResult("".join(normal_parts), calls)

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        calls: List[ToolCallItem] = []
        normal_parts: List[str] = []
        pos = 0
        while True:
            j = text.find(self.bot_token, pos)
            if j < 0:
                normal_parts.append(text[pos:])
                break
            # normal text stops at the <|message_model|> header when the
            # call rides its own message frame
            head = text.rfind(self._msg_token, pos, j)
            normal_parts.append(text[pos:head if head >= 0 else j])
            body_start = j + len(self.bot_token)
            end = text.find(self.eot_token, body_start)
            if end < 0:
                break
            obj = _try_json(text[body_start:end].strip())
            item = self._extract(obj, tools) if obj else None
            if item:
                item.tool_index = len(calls)
                calls.append(item)
            pos = end + len(self.eot_token)
        return ParseResult("".join(normal_parts).strip(), calls)


class HunyuanDetector(BaseDetector):
    """Hunyuan: <tool_calls><tool_call>name<tool_sep><arg_key>k</arg_key>
    <arg_value>v</arg_value>...</tool_call></tool_calls>.
    Ref: hunyuan_detector.py."""

    name = "hunyuan"
    bot_token = "<tool_calls>"
    eot_token = "</tool_calls>"
    _call_re = re.compile(r"<tool_call>(.*?)(?:</tool_call>|$)", re.DOTALL)
    _arg_re = re.compile(
        r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>", re.DOTALL
    )

    def _stream_complete_call(self, buf: str, body_start: int, tools):
        end = buf.find(self.eot_token, body_start)
        if end < 0:
            return False, 0, []
        res = self._parse_block(buf[body_start:end], tools)
        return True, end + len(self.eot_token), res

    def _parse_block(self, block: str, tools) -> List[ToolCallItem]:
        calls: List[ToolCallItem] = []
        for m in self._call_re.finditer(block):
            body = m.group(1)
            fname = re.split(r"<tool_sep>|\n", body, 1)[0].strip()
            args = {
                k.strip(): _schema_cast(fname, k.strip(), v, tools)
                for k, v in self._arg_re.findall(body)
            }
            it = self._extract({"name": fname, "arguments": args}, tools)
            if it:
                it.tool_index = len(calls)
                calls.append(it)
        return calls

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        return ParseResult(pre.strip(), self._parse_block(payload, tools))


class MiniCpm5Detector(BaseDetector):
    """MiniCPM5: <function name="fn"><param name="k">v</param>...
    </function>, CDATA-wrapped values allowed. Ref: minicpm5_detector.py."""

    name = "minicpm5"
    bot_token = "<function"
    eot_token = "</function>"
    _fn_re = re.compile(r"<function\s+name=['\"]([^'\"]+)['\"][^>]*>")
    _param_re = re.compile(
        r"<param\s+name=['\"]([^'\"]+)['\"]>([\s\S]*?)</param>", re.DOTALL
    )
    _cdata_re = re.compile(r"^<!\[CDATA\[([\s\S]*)\]\]>$")

    def _stream_complete_call(self, buf: str, body_start: int, tools):
        end = buf.find(self.eot_token, body_start)
        if end < 0:
            return False, 0, []
        block = buf[body_start - len(self.bot_token): end]
        return True, end + len(self.eot_token), self._parse_block(block, tools)

    def _parse_block(self, block: str, tools) -> List[ToolCallItem]:
        m = self._fn_re.search(block)
        if not m:
            return []
        fname = m.group(1)
        args: Dict[str, Any] = {}
        for k, v in self._param_re.findall(block):
            cd = self._cdata_re.match(v.strip())
            raw = cd.group(1) if cd else v
            args[k] = _schema_cast(fname, k, raw, tools) if not cd else raw
        it = self._extract({"name": fname, "arguments": args}, tools)
        return [it] if it else []

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        calls: List[ToolCallItem] = []
        normal_parts = []
        rest = text
        while self.bot_token in rest and self.eot_token in rest:
            pre, rest = rest.split(self.bot_token, 1)
            normal_parts.append(pre)
            body, rest = rest.split(self.eot_token, 1)
            for it in self._parse_block(self.bot_token + body, tools):
                it.tool_index = len(calls)
                calls.append(it)
        normal_parts.append(rest)
        return ParseResult("".join(normal_parts).strip(), calls)


class ApertusDetector(BaseDetector):
    """Apertus: <|tools_prefix|>[{"tool_name": {...args...}}, ...]
    <|tools_suffix|> — each element is a SINGLE-KEY object mapping tool
    name to its arguments. Ref: apertus2509_detector.py."""

    name = "apertus"
    bot_token = "<|tools_prefix|>"
    eot_token = "<|tools_suffix|>"

    def _extract(self, obj, tools):
        if isinstance(obj, dict) and len(obj) == 1 and "name" not in obj:
            (k, v), = obj.items()
            obj = {"name": k, "arguments": v if isinstance(v, dict) else {}}
        return super()._extract(obj, tools)

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        calls: List[ToolCallItem] = []
        for _, _, obj in _find_json_objects(payload):
            for o in obj if isinstance(obj, list) else [obj]:
                it = self._extract(o, tools)
                if it:
                    it.tool_index = len(calls)
                    calls.append(it)
            if calls:
                break
        return ParseResult(pre.strip(), calls)


class KimiK3Detector(BaseDetector):
    """Kimi K3 XTML channels (ref kimik3_detector.py): tool calls live in
    a tools channel of <|open|>/<|close|> tagged sections:
    <|open|>tools<|sep|> <|open|>call tool="n" index="1"<|sep|>
    <|open|>argument key="k" type="string"<|sep|>raw<|close|>argument<|sep|>
    <|close|>call<|sep|> <|close|>tools<|sep|>. type="string" keeps raw
    text; other types JSON-decode."""

    name = "kimi_k3"
    bot_token = "<|open|>tools<|sep|>"
    eot_token = "<|close|>tools<|sep|>"
    _call_re = re.compile(
        r'<\|open\|>call tool="([^"]+)"[^<]*<\|sep\|>(.*?)<\|close\|>call<\|sep\|>',
        re.DOTALL,
    )
    _arg_re = re.compile(
        r'<\|open\|>argument key="([^"]+)"(?:\s+type="([^"]+)")?[^<]*<\|sep\|>'
        r"(.*?)<\|close\|>argument<\|sep\|>",
        re.DOTALL,
    )

    @staticmethod
    def _unescape(s: str) -> str:
        return s.replace("&quot;", '"').replace("&amp;", "&")

    def _stream_complete_call(self, buf: str, body_start: int, tools):
        end = buf.find(self.eot_token, body_start)
        if end < 0:
            return False, 0, []
        res = self._parse_block(buf[body_start:end], tools)
        return True, end + len(self.eot_token), res

    def _parse_block(self, block: str, tools) -> List[ToolCallItem]:
        calls: List[ToolCallItem] = []
        for m in self._call_re.finditer(block):
            fname = self._unescape(m.group(1))
            args: Dict[str, Any] = {}
            for k, typ, v in self._arg_re.findall(m.group(2)):
                k = self._unescape(k)
                if typ in ("", "string"):
                    args[k] = v
                else:
                    parsed = _try_json(v.strip())
                    args[k] = parsed if parsed is not None else v
            it = self._extract({"name": fname, "arguments": args}, tools)
            if it:
                it.tool_index = len(calls)
                calls.append(it)
        return calls

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        # Plain reply rides a response channel before the tools channel.
        normal = re.sub(
            r"<\|open\|>response<\|sep\|>|<\|close\|>response<\|sep\|>",
            "", pre,
        ).strip()
        return ParseResult(normal, self._parse_block(payload, tools))


class GigaChat3Detector(BaseDetector):
    """GigaChat3: `function call<|role_sep|>\\n{json}` or
    <|function_call|>{json} with a {"name":..., "arguments":{...}} object.
    Ref: gigachat3_detector.py."""

    name = "gigachat3"
    _fc_re = re.compile(
        r"(?:function call<\|role_sep\|>\n?|<\|function_call\|>)(.*)",
        re.DOTALL,
    )

    def has_tool_call(self, text: str) -> bool:
        return bool(self._fc_re.search(text))

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        if text.rstrip().endswith("</s>"):
            text = text[: text.rfind("</s>")]
        m = self._fc_re.search(text)
        if not m:
            return ParseResult(text, [])
        obj = None
        found = _find_json_objects(m.group(1))
        if found:
            obj = found[0][2]
        if not (isinstance(obj, dict) and "name" in obj
                and isinstance(obj.get("arguments"), dict)):
            return ParseResult(text, [])
        it = self._extract(obj, tools)
        return ParseResult(text[: m.start()].strip(), [it] if it else [])


class MinimaxM3Detector(BaseDetector):
    """MiniMax M3: every tag is prefixed by the namespace token
    ]<]minimax[>[ — blocks look like NS<tool_call> NS<invoke name="fn">
    NS<param>value NS</param> NS</invoke> NS</tool_call>. Flat parameters
    with schema-typed leaves (the reference additionally reconstructs
    nested object/array params from nested tags; flat covers the shipped
    templates). Ref: minimax_m3.py."""

    name = "minimax-m3"
    NS = "]<]minimax[>["
    bot_token = NS + "<tool_call>"
    eot_token = NS + "</tool_call>"

    def _stream_complete_call(self, buf: str, body_start: int, tools):
        end = buf.find(self.eot_token, body_start)
        if end < 0:
            return False, 0, []
        res = self._parse_block(buf[body_start:end], tools)
        return True, end + len(self.eot_token), res

    def _parse_block(self, block: str, tools) -> List[ToolCallItem]:
        calls: List[ToolCallItem] = []
        invoke_pre = '<invoke name="'
        chunks = [c for c in block.split(self.NS) if c.strip()]
        fname = None
        args: Dict[str, Any] = {}
        pkey = None
        pval: List[str] = []

        def flush_call():
            nonlocal fname, args
            if fname is not None:
                it = self._extract({"name": fname, "arguments": args}, tools)
                if it:
                    it.tool_index = len(calls)
                    calls.append(it)
            fname, args = None, {}

        for c in chunks:
            s = c.strip()
            if s.startswith(invoke_pre):
                flush_call()
                qe = s.find('">', len(invoke_pre))
                if qe < 0:
                    continue
                fname = s[len(invoke_pre):qe]
                trail = s[qe + 2:]
                if trail.strip():
                    pval.append(trail)
            elif s.startswith("</invoke>"):
                flush_call()
            elif s.startswith("</") and pkey is not None:
                raw = "".join(pval)
                args[pkey] = _schema_cast(fname or "", pkey, raw, tools)
                pkey, pval = None, []
            elif s.startswith("<"):
                gt = s.find(">")
                if gt < 0:
                    continue
                pkey = s[1:gt].strip()
                pval = [s[gt + 1:]] if s[gt + 1:] else []
            elif pkey is not None:
                pval.append(c)
        flush_call()
        return calls

    def detect_and_parse(self, text: str, tools) -> ParseResult:
        pre, _, payload = text.partition(self.bot_token)
        payload = payload.split(self.eot_token, 1)[0]
        return ParseResult(pre.strip(), self._parse_block(payload, tools))


DETECTORS = {
    "llama3": Llama3Detector,
    "llama4": PythonicDetector,
    "qwen25": Qwen25Detector,
    "qwen3": Qwen25Detector,
    "hermes": Qwen25Detector,
    "mistral": MistralDetector,
    "json": JsonDetector,
    "deepseekv3": DeepSeekV3Detector,
    "deepseekv31": DeepSeekV31Detector,
    "kimi_k2": KimiK2Detector,
    "glm45": Glm4MoeDetector,
    "glm4_moe": Glm4MoeDetector,
    "pythonic": PythonicDetector,
    "lfm2": Lfm2Detector,
    "qwen3_coder": Qwen3CoderDetector,
    "step3": Step3Detector,
    "minimax": MinimaxM2Detector,
    "minimax-m2": MinimaxM2Detector,
    "internlm": InternlmDetector,
    "command": CommandADetector,
    "command-a": CommandADetector,
    "gpt_oss": GptOssDetector,
    "gpt-oss": GptOssDetector,
    # Llama-3.2 JSON-with-';'-separator rides the llama3 detector.
    "llama32": Llama3Detector,
    "trinity": TrinityDetector,
    "gemma4": Gemma4Detector,
    "deepseekv32": DsmlDetector,
    "deepseekv4": DeepSeekV4Detector,
    "hunyuan": HunyuanDetector,
    "minicpm5": MiniCpm5Detector,
    "apertus": ApertusDetector,
    "kimi_k3": KimiK3Detector,
    "gigachat3": GigaChat3Detector,
    "minimax-m3": MinimaxM3Detector,
    # MiMo's <tool_call><function=..><parameter=..> IS the qwen3-coder
    # wire format; poolside/GLM-4.7's <tool_call>name<arg_key>/<arg_value>
    # IS the glm4_moe wire format (ref mimo_detector.py,
    # poolside_v1_detector.py, glm47_moe_detector.py).
    "mimo": Qwen3CoderDetector,
    "poolside_v1": Glm4MoeDetector,
    "poolside": Glm4MoeDetector,
    "glm47": Glm4MoeDetector,
    "glm47_moe": Glm4MoeDetector,
    # Command-4 shares the Command-A START/END_ACTION array format.
    "command4": CommandADetector,
    "cohere_command4": CommandADetector,
    "inkling": InklingDetector,
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

    def parse_stream_chunk(
        self, delta: str
    ) -> Tuple[str, List[ToolCallItem]]:
        """Feed one SSE delta; returns (normal text safe to emit now,
        tool calls completed by this delta)."""
        res = self.detector.parse_streaming_increment(delta, self.tools)
        return res.normal_text, res.calls

    def finish_stream(self) -> str:
        """End of stream: any held-back text that never became a call."""
        return self.detector.finish_streaming(self.tools).normal_text
