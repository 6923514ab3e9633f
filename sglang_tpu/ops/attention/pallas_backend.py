"""Pallas ragged paged attention backend (TPU production path).

Kernels live in sglang_tpu/ops/attention/pallas_kernels.py; this module
wires them behind the backend registry. Until the kernels land this
delegates to the XLA-native math (still jit-compiled; XLA fuses reasonably)
so the rest of the stack is independent of kernel bring-up.
"""

from __future__ import annotations

from sglang_tpu.ops.attention.base import register_attention_backend
from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend


@register_attention_backend("pallas")
class PallasBackend(XlaNativeBackend):
    pass
