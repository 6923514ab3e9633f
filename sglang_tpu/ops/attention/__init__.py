from sglang_tpu.ops.attention.base import (
    ATTENTION_BACKENDS,
    AttentionBackend,
    get_attention_backend,
    register_attention_backend,
)
from sglang_tpu.ops.attention import xla_backend  # noqa: F401 (registers)
from sglang_tpu.ops.attention import pallas_backend  # noqa: F401 (registers)
