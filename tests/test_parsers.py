"""Function-call + reasoning parser tests (ref: srt/function_call/,
srt/parser/reasoning_parser.py)."""

import json

from sglang_tpu.function_call.parser import FunctionCallParser
from sglang_tpu.parser.reasoning_parser import ReasoningParser

TOOLS = [
    {"type": "function", "function": {"name": "get_weather"}},
    {"type": "function", "function": {"name": "search"}},
]


def test_qwen25_tool_call():
    p = FunctionCallParser(TOOLS, "qwen25")
    text = (
        'Let me check.\n<tool_call>\n{"name": "get_weather", '
        '"arguments": {"city": "Paris"}}\n</tool_call>'
    )
    assert p.has_tool_call(text)
    normal, calls = p.parse_non_stream(text)
    assert normal == "Let me check."
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Paris"}


def test_qwen25_multiple_calls():
    p = FunctionCallParser(TOOLS, "qwen25")
    text = (
        '<tool_call>{"name": "get_weather", "arguments": {"city": "a"}}'
        "</tool_call><tool_call>"
        '{"name": "search", "arguments": {"q": "b"}}</tool_call>'
    )
    _, calls = p.parse_non_stream(text)
    assert [c.name for c in calls] == ["get_weather", "search"]
    assert calls[1].tool_index == 1


def test_mistral_tool_call():
    p = FunctionCallParser(TOOLS, "mistral")
    text = '[TOOL_CALLS] [{"name": "search", "arguments": {"q": "x"}}]'
    normal, calls = p.parse_non_stream(text)
    assert calls[0].name == "search"


def test_llama3_tool_call():
    p = FunctionCallParser(TOOLS, "llama3")
    text = '{"name": "get_weather", "parameters": {"city": "NYC"}}'
    assert p.has_tool_call(text)
    _, calls = p.parse_non_stream(text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "NYC"}


def test_unknown_tool_rejected():
    p = FunctionCallParser(TOOLS, "qwen25")
    text = '<tool_call>{"name": "rm_rf", "arguments": {}}</tool_call>'
    _, calls = p.parse_non_stream(text)
    assert calls == []


def _stream_all(parser, text, step=3):
    """Feed text in small chunks; collect emitted normal text + calls."""
    normal, calls = "", []
    for i in range(0, len(text), step):
        n, c = parser.parse_stream_chunk(text[i : i + step])
        normal += n
        calls.extend(c)
    normal += parser.finish_stream()
    return normal, calls


def test_qwen25_streaming_tool_call():
    p = FunctionCallParser(TOOLS, "qwen25")
    text = (
        'Sure.\n<tool_call>\n{"name": "search", '
        '"arguments": {"q": "tpu"}}\n</tool_call> done'
    )
    normal, calls = _stream_all(p, text, step=2)
    assert normal == "Sure.\n done"
    assert len(calls) == 1
    assert calls[0].name == "search"
    assert json.loads(calls[0].parameters) == {"q": "tpu"}
    assert calls[0].tool_index == 0


def test_qwen25_streaming_two_calls_indices():
    p = FunctionCallParser(TOOLS, "qwen25")
    text = (
        '<tool_call>{"name": "search", "arguments": {}}</tool_call>'
        '<tool_call>{"name": "get_weather", "arguments": {"c": 1}}</tool_call>'
    )
    normal, calls = _stream_all(p, text, step=5)
    assert normal == ""
    assert [c.tool_index for c in calls] == [0, 1]
    assert [c.name for c in calls] == ["search", "get_weather"]


def test_llama3_streaming_bare_json():
    p = FunctionCallParser(TOOLS, "llama3")
    text = '{"name": "get_weather", "parameters": {"city": "Oslo"}}'
    normal, calls = _stream_all(p, text, step=4)
    assert normal == ""
    assert len(calls) == 1 and calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Oslo"}


def test_mistral_streaming():
    p = FunctionCallParser(TOOLS, "mistral")
    text = 'ok [TOOL_CALLS] [{"name": "search", "arguments": {"q": "x"}}]'
    normal, calls = _stream_all(p, text, step=3)
    assert normal.strip() == "ok"
    assert len(calls) == 1 and calls[0].name == "search"


def test_streaming_no_tool_plain_text():
    p = FunctionCallParser(TOOLS, "qwen25")
    normal, calls = _stream_all(p, "just a plain answer < not a tag", step=4)
    assert normal == "just a plain answer < not a tag"
    assert calls == []


def test_reasoning_non_stream():
    p = ReasoningParser("qwen3")
    r = p.parse_non_stream("<think>step 1... step 2</think>The answer is 4.")
    assert r.reasoning_text == "step 1... step 2"
    assert r.normal_text == "The answer is 4."

    p2 = ReasoningParser("deepseek-r1")  # forced reasoning, no open tag
    r2 = p2.parse_non_stream("thinking hard</think>Done.")
    assert r2.reasoning_text == "thinking hard"
    assert r2.normal_text == "Done."


def test_reasoning_stream():
    p = ReasoningParser("qwen3", stream_reasoning=True)
    chunks = ["<th", "ink>abc", " def</th", "ink>xyz", "!"]
    reasoning, normal = "", ""
    for c in chunks:
        r = p.parse_stream_chunk(c)
        if r.reasoning_text:
            reasoning += r.reasoning_text
        if r.normal_text:
            normal += r.normal_text
    assert reasoning == "abc def"
    assert normal == "xyz!"
