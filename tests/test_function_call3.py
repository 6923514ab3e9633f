"""Round-3 function-call detector families (ref srt/function_call/).

Earlier families: test_parsers.py (round 1), test_function_call.py (r2).
"""

import json

from sglang_tpu.function_call.parser import FunctionCallParser

WEATHER = [{"type": "function", "function": {
    "name": "get_weather",
    "parameters": {"properties": {
        "city": {"type": "string"},
        "days": {"type": "integer"},
        "units": {"type": "string"},
    }},
}}]


def test_trinity_strips_think():
    text = ("<think>I should check the weather.<tool_call>"
            '{"name": "get_weather", "arguments": {"city": "Oslo"}}'
            "</tool_call></think>")
    p = FunctionCallParser(WEATHER, "trinity")
    assert p.has_tool_call(text)
    normal, calls = p.parse_non_stream(text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Oslo"}
    assert "tool_call" not in normal


def test_gemma4_custom_grammar():
    text = ('Sure.<|tool_call>call:get_weather{city: <|"|>San Francisco'
            '<|"|>, days: 3, units: <|"|>metric<|"|>}<tool_call|>')
    p = FunctionCallParser(WEATHER, "gemma4")
    assert p.has_tool_call(text)
    normal, calls = p.parse_non_stream(text)
    assert normal == "Sure."
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {
        "city": "San Francisco", "days": 3, "units": "metric"}


def test_dsml_v32_xml_params():
    text = ("ok<｜DSML｜function_calls>\n"
            '<｜DSML｜invoke name="get_weather">\n'
            '<｜DSML｜parameter name="city" string="true">Berlin'
            "</｜DSML｜parameter>\n"
            '<｜DSML｜parameter name="days" string="false">5'
            "</｜DSML｜parameter>\n"
            "</｜DSML｜invoke>\n</｜DSML｜function_calls>")
    p = FunctionCallParser(WEATHER, "deepseekv32")
    normal, calls = p.parse_non_stream(text)
    assert normal == "ok"
    assert json.loads(calls[0].parameters) == {"city": "Berlin", "days": 5}


def test_dsml_v4_direct_json():
    text = ("<｜DSML｜tool_calls>\n"
            '<｜DSML｜invoke name="get_weather">\n'
            '{ "city": "Quito" }\n'
            "</｜DSML｜invoke>\n</｜DSML｜tool_calls>")
    p = FunctionCallParser(WEATHER, "deepseekv4")
    _, calls = p.parse_non_stream(text)
    assert json.loads(calls[0].parameters) == {"city": "Quito"}


def test_hunyuan_arg_pairs():
    text = ("Check:<tool_calls><tool_call>get_weather<tool_sep>"
            "<arg_key>city</arg_key><arg_value>Lima</arg_value>"
            "<arg_key>days</arg_key><arg_value>2</arg_value>"
            "</tool_call></tool_calls>")
    p = FunctionCallParser(WEATHER, "hunyuan")
    normal, calls = p.parse_non_stream(text)
    assert normal == "Check:"
    assert json.loads(calls[0].parameters) == {"city": "Lima", "days": 2}


def test_minicpm5_params_and_cdata():
    text = ('<function name="get_weather"><param name="city">'
            "<![CDATA[multi\nline]]></param>"
            '<param name="days">7</param></function>')
    p = FunctionCallParser(WEATHER, "minicpm5")
    _, calls = p.parse_non_stream(text)
    assert json.loads(calls[0].parameters) == {
        "city": "multi\nline", "days": 7}


def test_apertus_single_key_objects():
    text = ('<|tools_prefix|>[{"get_weather": {"city": "Rome"}}]'
            "<|tools_suffix|>")
    p = FunctionCallParser(WEATHER, "apertus")
    _, calls = p.parse_non_stream(text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Rome"}


def test_kimi_k3_channels():
    text = ("<|open|>response<|sep|>Here you go.<|close|>response<|sep|>"
            "<|open|>tools<|sep|>"
            '<|open|>call tool="get_weather" index="1"<|sep|>'
            '<|open|>argument key="city" type="string"<|sep|>Nuuk'
            "<|close|>argument<|sep|>"
            '<|open|>argument key="days" type="integer"<|sep|>4'
            "<|close|>argument<|sep|>"
            "<|close|>call<|sep|><|close|>tools<|sep|>")
    p = FunctionCallParser(WEATHER, "kimi_k3")
    normal, calls = p.parse_non_stream(text)
    assert normal == "Here you go."
    assert json.loads(calls[0].parameters) == {"city": "Nuuk", "days": 4}


def test_gigachat3_role_sep():
    text = ('function call<|role_sep|>\n{"name": "get_weather", '
            '"arguments": {"city": "Kazan"}}</s>')
    p = FunctionCallParser(WEATHER, "gigachat3")
    assert p.has_tool_call(text)
    _, calls = p.parse_non_stream(text)
    assert json.loads(calls[0].parameters) == {"city": "Kazan"}


def test_minimax_m3_namespaced_tags():
    NS = "]<]minimax[>["
    text = (f"thinking...{NS}<tool_call>"
            f'{NS}<invoke name="get_weather">'
            f"{NS}<city>Osaka{NS}</city>"
            f"{NS}<days>6{NS}</days>"
            f"{NS}</invoke>{NS}</tool_call>")
    p = FunctionCallParser(WEATHER, "minimax-m3")
    normal, calls = p.parse_non_stream(text)
    assert normal == "thinking..."
    assert json.loads(calls[0].parameters) == {"city": "Osaka", "days": 6}


def test_aliases_resolve():
    for alias in ("mimo", "poolside_v1", "glm47", "command4", "llama32"):
        FunctionCallParser(WEATHER, alias)  # must not raise


def test_streaming_dsml():
    """DSML streams: text before the block emits, call completes at the
    closing wrapper."""
    text = ("hi there<｜DSML｜function_calls>"
            '<｜DSML｜invoke name="get_weather">{"city": "Kyiv"}'
            "</｜DSML｜invoke></｜DSML｜function_calls> bye")
    p = FunctionCallParser(WEATHER, "deepseekv32")
    out_text, out_calls = "", []
    for i in range(0, len(text), 7):
        t, c = p.parse_stream_chunk(text[i:i + 7])
        out_text += t
        out_calls += c
    out_text += p.finish_stream()
    assert out_calls and out_calls[0].name == "get_weather"
    assert json.loads(out_calls[0].parameters) == {"city": "Kyiv"}
    assert "hi there" in out_text and "DSML" not in out_text


def test_inkling_detector():
    from sglang_tpu.function_call.parser import FunctionCallParser

    tools = [{"type": "function",
              "function": {"name": "get_weather", "parameters": {}}}]
    p = FunctionCallParser(tools, "inkling")
    text = (
        'Let me check.<|message_model|>get_weather'
        '<|content_invoke_tool_json|>{"name": "get_weather", '
        '"args": {"city": "Tokyo"}}<|end_message|>'
    )
    normal, calls = p.parse_non_stream(text)
    assert normal == "Let me check."
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    import json as _json
    assert _json.loads(calls[0].parameters) == {"city": "Tokyo"}


def test_inkling_streaming():
    from sglang_tpu.function_call.parser import FunctionCallParser

    tools = [{"type": "function",
              "function": {"name": "add", "parameters": {}}}]
    p = FunctionCallParser(tools, "inkling")
    chunks = [
        "sure<|content_invoke_",
        'tool_json|>{"name": "add", "args": {"a": 1}}',
        "<|end_message|>done",
    ]
    texts, all_calls = [], []
    for c in chunks:
        normal, calls = p.parse_stream_chunk(c)
        texts.append(normal)
        all_calls.extend(calls)
    texts.append(p.finish_stream())
    assert "".join(texts) == "suredone"
    assert len(all_calls) == 1 and all_calls[0].name == "add"


def test_inkling_streaming_strips_message_header():
    """Streaming must match detect_and_parse: the <|message_model|>name
    header before a tool frame is stripped, not leaked as normal text."""
    from sglang_tpu.function_call.parser import FunctionCallParser

    tools = [{"type": "function",
              "function": {"name": "get_weather", "parameters": {}}}]
    p = FunctionCallParser(tools, "inkling")
    chunks = [
        "Let me check.<|message_",
        "model|>get_wea",
        "ther<|content_invoke_tool_json|>",
        '{"name": "get_weather", "args": {"city": "Tokyo"}}',
        "<|end_message|>done",
    ]
    texts, all_calls = [], []
    for c in chunks:
        normal, calls = p.parse_stream_chunk(c)
        texts.append(normal)
        all_calls.extend(calls)
    texts.append(p.finish_stream())
    assert "".join(texts) == "Let me check.done"
    assert len(all_calls) == 1 and all_calls[0].name == "get_weather"
    import json as _json
    assert _json.loads(all_calls[0].parameters) == {"city": "Tokyo"}


def test_inkling_streaming_header_without_tool_frame():
    """A <|message_model|> header followed by a non-tool frame is normal
    text (only headers preceding the invoke frame are stripped)."""
    from sglang_tpu.function_call.parser import FunctionCallParser

    tools = [{"type": "function",
              "function": {"name": "add", "parameters": {}}}]
    p = FunctionCallParser(tools, "inkling")
    chunks = ["x<|message_model|>assistant", "<|content_text|>hello"]
    texts = []
    for c in chunks:
        normal, calls = p.parse_stream_chunk(c)
        texts.append(normal)
        assert not calls
    texts.append(p.finish_stream())
    assert "".join(texts) == "x<|message_model|>assistant<|content_text|>hello"


def test_deepseekv31_simplified_format():
    """V3.1 drops the ```json fence (ref deepseekv31_detector.py)."""
    import json as _json

    from sglang_tpu.function_call.parser import FunctionCallParser

    tools = [{"type": "function",
              "function": {"name": "get_weather", "parameters": {}}}]
    p = FunctionCallParser(tools, "deepseekv31")
    text = (
        "ok<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>get_weather"
        '<｜tool▁sep｜>{"city": "Paris"}<｜tool▁call▁end｜>'
        "<｜tool▁calls▁end｜>"
    )
    normal, calls = p.parse_non_stream(text)
    assert normal == "ok"
    assert len(calls) == 1 and calls[0].name == "get_weather"
    assert _json.loads(calls[0].parameters) == {"city": "Paris"}


def test_hermes_and_mimo_aliases():
    """hermes = <tool_call>{json}</tool_call> (qwen25 wire format);
    mimo = <function=..><parameter=..> (qwen3_coder wire format)."""
    import json as _json

    from sglang_tpu.function_call.parser import FunctionCallParser

    tools = [{"type": "function",
              "function": {"name": "add", "parameters": {
                  "type": "object",
                  "properties": {"a": {"type": "integer"},
                                 "b": {"type": "integer"}}}}}]
    p = FunctionCallParser(tools, "hermes")
    normal, calls = p.parse_non_stream(
        'x<tool_call>{"name": "add", "arguments": {"a": 1, "b": 2}}'
        "</tool_call>"
    )
    assert calls and calls[0].name == "add"
    assert _json.loads(calls[0].parameters) == {"a": 1, "b": 2}

    p = FunctionCallParser(tools, "mimo")
    normal, calls = p.parse_non_stream(
        "y<tool_call><function=add><parameter=a>1</parameter>"
        "<parameter=b>2</parameter></function></tool_call>"
    )
    assert calls and calls[0].name == "add"
    assert _json.loads(calls[0].parameters) == {"a": 1, "b": 2}


def test_poolside_glm47_alias():
    from sglang_tpu.function_call.parser import FunctionCallParser

    tools = [{"type": "function",
              "function": {"name": "now", "parameters": {}}}]
    for fam in ("poolside_v1", "glm47_moe"):
        p = FunctionCallParser(tools, fam)
        normal, calls = p.parse_non_stream(
            "t<tool_call>now\n<arg_key>tz</arg_key>"
            "<arg_value>utc</arg_value></tool_call>"
        )
        assert calls and calls[0].name == "now", fam
