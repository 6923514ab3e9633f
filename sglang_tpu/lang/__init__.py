"""sgl frontend DSL.

Ref: python/sglang/lang/{api.py:23-289,ir.py:141,interpreter.py:57}.
Programs compose prompt fragments, gen() calls, select() choices, and role
tags; the interpreter executes them against a backend (in-process Engine
or a remote sglang-tpu HTTP endpoint). select() is implemented natively
with the grammar engine: a regex constraint over the choice strings.
"""

from sglang_tpu.lang.api import (
    assistant,
    function,
    gen,
    gen_int,
    image,
    run_parallel,
    select,
    set_default_backend,
    system,
    user,
    video,
)
from sglang_tpu.lang.backends import (
    AnthropicBackend,
    EngineBackend,
    OpenAIBackend,
    RuntimeEndpoint,
)
