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


# ---- Harmony (gpt-oss) channel parser ----
# Ref: srt/parser/harmony_parser.py


def test_harmony_canonical_channels():
    from sglang_tpu.parser.harmony_parser import HarmonyParser

    p = HarmonyParser()
    text = (
        "<|start|>assistant<|channel|>analysis<|message|>let me think"
        "<|end|><|start|>assistant<|channel|>final<|message|>Hello!"
        "<|return|>"
    )
    events = p.parse(text) + p.flush()
    kinds = [(e.type, e.content) for e in events]
    assert ("reasoning", "let me think") in kinds
    assert ("normal", "Hello!") in kinds


def test_harmony_tool_call_block():
    from sglang_tpu.parser.harmony_parser import HarmonyParser

    p = HarmonyParser()
    text = (
        "<|start|>assistant<|channel|>commentary to=functions.get_weather"
        '<|constrain|>json<|message|>{"city": "Tokyo"}<|call|>'
    )
    events = p.parse(text) + p.flush()
    calls = [e for e in events if e.type == "tool_call"]
    assert len(calls) == 1
    assert calls[0].content == '{"city": "Tokyo"}'
    assert "to=functions.get_weather" in calls[0].raw


def test_harmony_final_without_return_at_eof():
    from sglang_tpu.parser.harmony_parser import HarmonyParser

    p = HarmonyParser()
    events = p.parse("<|channel|>final<|message|>open ended")
    assert events == []  # incomplete: held
    events = p.flush()
    assert [(e.type, e.content) for e in events] == [("normal", "open ended")]


def test_harmony_streaming_partial_analysis():
    from sglang_tpu.parser.harmony_parser import HarmonyParser

    p = HarmonyParser()
    out = []
    for chunk in ["<|channel|>analysis<|mess", "age|>step one ",
                  "and step two<|end|>", "<|channel|>final<|message|>done",
                  "<|return|>"]:
        out.extend(p.parse(chunk))
    out.extend(p.flush())
    reasoning = "".join(e.content for e in out if e.type == "reasoning")
    normal = "".join(e.content for e in out if e.type == "normal")
    assert reasoning == "step one and step two"
    assert normal == "done"
    # partial analysis streamed before its <|end|> arrived
    assert any(e.type == "reasoning" for e in out[:-2])


def test_harmony_text_fallback():
    from sglang_tpu.parser.harmony_parser import HarmonyParser

    p = HarmonyParser()
    events = p.parse("analysis I should greet assistantfinal Hi there")
    events += p.flush()
    reasoning = "".join(e.content for e in events if e.type == "reasoning")
    normal = "".join(e.content for e in events if e.type == "normal")
    assert "I should greet" in reasoning
    assert normal.strip() == "Hi there"


def test_reasoning_parser_gpt_oss_route():
    from sglang_tpu.parser.reasoning_parser import ReasoningParser

    rp = ReasoningParser("gpt-oss")
    res = rp.parse_non_stream(
        "<|channel|>analysis<|message|>hmm<|end|>"
        "<|channel|>final<|message|>42<|return|>"
    )
    assert res.reasoning_text == "hmm"
    assert res.normal_text == "42"

    rp = ReasoningParser("gpt-oss")
    r1 = rp.parse_stream_chunk("<|channel|>analysis<|message|>think")
    r2 = rp.parse_stream_chunk("ing<|end|><|channel|>final<|message|>ok")
    r3 = rp.parse_stream_chunk("<|return|>")
    texts = "".join(filter(None, [r1.normal_text, r2.normal_text,
                                  r3.normal_text]))
    reason = "".join(filter(None, [r1.reasoning_text, r2.reasoning_text,
                                   r3.reasoning_text]))
    assert reason == "thinking"
    assert texts == "ok"
