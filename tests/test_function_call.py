"""Round-2 function-call detector families (ref srt/function_call/).

Existing families are covered in test_parsers.py.
"""

def test_deepseekv3_detector():
    from sglang_tpu.function_call.parser import FunctionCallParser

    tools = [{"type": "function", "function": {"name": "get_weather"}}]
    text = (
        "Let me check.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
        "<｜tool▁sep｜>get_weather\n```json\n{\"city\": \"Tokyo\"}\n```"
        "<｜tool▁call▁end｜><｜tool▁calls▁end｜>"
    )
    p = FunctionCallParser(tools, "deepseekv3")
    assert p.has_tool_call(text)
    normal, calls = p.parse_non_stream(text)
    assert normal == "Let me check."
    assert calls[0].name == "get_weather"
    assert '"Tokyo"' in calls[0].parameters


def test_kimi_k2_detector():
    from sglang_tpu.function_call.parser import FunctionCallParser

    tools = [{"type": "function", "function": {"name": "search"}}]
    text = (
        "<|tool_calls_section_begin|><|tool_call_begin|>functions.search:0"
        "<|tool_call_argument_begin|>{\"q\": \"tpu\"}<|tool_call_end|>"
        "<|tool_calls_section_end|>"
    )
    p = FunctionCallParser(tools, "kimi_k2")
    normal, calls = p.parse_non_stream(text)
    assert calls[0].name == "search"
    assert '"tpu"' in calls[0].parameters


def test_glm45_detector_typed_args():
    from sglang_tpu.function_call.parser import FunctionCallParser
    import json

    tools = [{"type": "function", "function": {
        "name": "get_weather",
        "parameters": {"properties": {
            "city": {"type": "string"},
            "days": {"type": "integer"},
        }},
    }}]
    text = ("<tool_call>get_weather\n<arg_key>city</arg_key>\n"
            "<arg_value>Paris</arg_value>\n<arg_key>days</arg_key>\n"
            "<arg_value>3</arg_value>\n</tool_call>")
    p = FunctionCallParser(tools, "glm45")
    normal, calls = p.parse_non_stream(text)
    assert calls[0].name == "get_weather"
    args = json.loads(calls[0].parameters)
    assert args == {"city": "Paris", "days": 3}
