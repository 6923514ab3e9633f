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
