"""Back-compat shim: the router grew into the gateway package.

Ref: sgl-model-gateway (Rust) — see sglang_tpu/gateway/ for the full
gateway (PD-pair routing, rate limits, retries, discovery, conversation
storage). `python -m sglang_tpu.router` keeps working.
"""

from sglang_tpu.gateway.app import (  # noqa: F401
    CharTree,
    Router,
    Worker,
    main,
)

if __name__ == "__main__":
    main()
