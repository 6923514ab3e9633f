"""Model gateway: routing, PD-pair dispatch, rate limiting, discovery.

Behavioral reference: sgl-model-gateway (Rust, sgl-model-gateway/src/) —
the reference's standalone router/gateway in front of engine replicas.
This package is the TPU build's equivalent: the per-request CPU-hot data
plane (radix routing tree, registry, policies, circuit breaker, token
buckets) runs native C++ (csrc/gateway_core.cpp over ctypes); the async
HTTP shell, PD-pair dispatch, discovery loops, and conversation storage
live here.
"""

from sglang_tpu.gateway.rate_limit import (  # noqa: F401
    ConcurrencyGate,
    KeyedRateLimiter,
    TokenBucket,
)
from sglang_tpu.gateway.discovery import (  # noqa: F401
    FileDiscovery,
    HttpDiscovery,
    StaticDiscovery,
    WorkerSpec,
)
from sglang_tpu.gateway.conversations import (  # noqa: F401
    ConversationStore,
    MemoryConversationStore,
    SqliteConversationStore,
)
from sglang_tpu.gateway.pd import PDPair, PDPool  # noqa: F401
