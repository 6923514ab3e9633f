from sglang_tpu.function_call.parser import FunctionCallParser, ToolCallItem
