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


def _parse(parser_name, tools, text):
    from sglang_tpu.function_call.parser import FunctionCallParser

    p = FunctionCallParser(tools, parser_name)
    return p.parse_non_stream(text)


WEATHER_TOOLS = [{"type": "function", "function": {
    "name": "get_weather",
    "parameters": {"properties": {
        "city": {"type": "string"}, "days": {"type": "integer"},
    }},
}}]


def test_pythonic_detector():
    import json

    normal, calls = _parse(
        "pythonic", WEATHER_TOOLS,
        'Sure. [get_weather(city="Paris", days=3)]'
    )
    assert normal == "Sure."
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Paris", "days": 3}


def test_lfm2_detector_both_formats():
    import json

    normal, calls = _parse(
        "lfm2", WEATHER_TOOLS,
        '<|tool_call_start|>[get_weather(city="Oslo")]<|tool_call_end|>'
    )
    assert json.loads(calls[0].parameters) == {"city": "Oslo"}
    normal, calls = _parse(
        "lfm2", WEATHER_TOOLS,
        '<|tool_call_start|>[{"name": "get_weather", "arguments": '
        '{"city": "Oslo"}}]<|tool_call_end|>'
    )
    assert json.loads(calls[0].parameters) == {"city": "Oslo"}


def test_qwen3_coder_detector():
    import json

    text = ("think<tool_call><function=get_weather>\n"
            "<parameter=city>\nTokyo\n</parameter>\n"
            "<parameter=days>\n2\n</parameter>\n"
            "</function></tool_call>")
    normal, calls = _parse("qwen3_coder", WEATHER_TOOLS, text)
    assert normal == "think"
    assert json.loads(calls[0].parameters) == {"city": "Tokyo", "days": 2}


def test_step3_detector():
    import json

    text = ("ok<｜tool_calls_begin｜><｜tool_call_begin｜>function"
            "<｜tool_sep｜><steptml:invoke name=\"get_weather\">"
            "<steptml:parameter name=\"city\">Bern</steptml:parameter>"
            "<steptml:parameter name=\"days\">5</steptml:parameter>"
            "</steptml:invoke><｜tool_call_end｜><｜tool_calls_end｜>")
    normal, calls = _parse("step3", WEATHER_TOOLS, text)
    assert normal == "ok"
    assert json.loads(calls[0].parameters) == {"city": "Bern", "days": 5}


def test_minimax_detector():
    import json

    text = ("<minimax:tool_call>\n<invoke name=\"get_weather\">\n"
            "<parameter name=\"city\">Lima</parameter>\n</invoke>\n"
            "</minimax:tool_call>")
    _, calls = _parse("minimax", WEATHER_TOOLS, text)
    assert json.loads(calls[0].parameters) == {"city": "Lima"}


def test_internlm_detector():
    import json

    text = ("What's the weather?<|action_start|> <|plugin|>\n"
            '{"name": "get_weather", "parameters": {"city": "Kyiv"}}'
            "<|action_end|>")
    normal, calls = _parse("internlm", WEATHER_TOOLS, text)
    assert normal == "What's the weather?"
    assert json.loads(calls[0].parameters) == {"city": "Kyiv"}


def test_command_a_detector():
    import json

    text = ('<|START_ACTION|>[{"tool_call_id": "0", "tool_name": '
            '"get_weather", "parameters": {"city": "Rome"}}]<|END_ACTION|>')
    _, calls = _parse("command", WEATHER_TOOLS, text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Rome"}


def test_gpt_oss_detector():
    import json

    text = ("<|channel|>commentary to=functions.get_weather "
            '<|constrain|>json<|message|>{"city": "Doha"}<|call|>')
    _, calls = _parse("gpt_oss", WEATHER_TOOLS, text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Doha"}


def test_mistral_compact_format():
    import json

    _, calls = _parse(
        "mistral", WEATHER_TOOLS,
        '[TOOL_CALLS]get_weather[ARGS]{"city": "Nice"}'
    )
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Nice"}


def test_pythonic_streaming():
    from sglang_tpu.function_call.parser import FunctionCallParser

    p = FunctionCallParser(WEATHER_TOOLS, "pythonic")
    out1, calls1 = p.parse_stream_chunk("Here: [get_weather(")
    assert calls1 == []
    out2, calls2 = p.parse_stream_chunk('city="Quito")]')
    assert calls2 and calls2[0].name == "get_weather"
    assert (out1 + out2).strip() == "Here:"
