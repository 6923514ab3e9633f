"""Request tracing (OpenTelemetry) across the manager pipeline.

Ref: srt/observability/trace.py:102-553 (TraceReqContext:270; spans
propagated across processes inside ZMQ structs). Ours propagates a
lightweight trace context dict (trace_id/span timestamps) on the request
path and emits OTel spans when an exporter is configured
(SGLANG_TPU_OTLP_ENDPOINT); without one, spans go to an in-memory ring
readable via /get_server_info-style debugging.
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import os
import threading
import time
import uuid
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)

_TRACER = None
_ENABLED = False
_RING = collections.deque(maxlen=1024)
_LOCK = threading.Lock()


def init_tracing(service_name: str = "sglang-tpu") -> bool:
    """Enable tracing; wires an OTLP exporter if configured."""
    global _TRACER, _ENABLED
    if _ENABLED:
        return True
    endpoint = os.environ.get("SGLANG_TPU_OTLP_ENDPOINT")
    try:
        from opentelemetry import trace as ot_trace
        from opentelemetry.sdk.resources import Resource
        from opentelemetry.sdk.trace import TracerProvider

        provider = TracerProvider(
            resource=Resource.create({"service.name": service_name})
        )
        if endpoint:
            from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
                OTLPSpanExporter,
            )
            from opentelemetry.sdk.trace.export import BatchSpanProcessor

            provider.add_span_processor(
                BatchSpanProcessor(OTLPSpanExporter(endpoint=endpoint))
            )
        ot_trace.set_tracer_provider(provider)
        _TRACER = ot_trace.get_tracer(service_name)
    except Exception:  # noqa: BLE001
        logger.info("opentelemetry unavailable; using in-memory spans only")
        _TRACER = None
    _ENABLED = True
    return True


@dataclasses.dataclass
class ReqTrace:
    """Per-request slice timeline, carried in ZMQ structs as a dict."""

    trace_id: str
    slices: List[Dict] = dataclasses.field(default_factory=list)

    @classmethod
    def new(cls) -> "ReqTrace":
        return cls(trace_id=uuid.uuid4().hex)

    def slice_begin(self, name: str) -> None:
        self.slices.append({"name": name, "start": time.time(), "end": None})

    def slice_end(self, name: str) -> None:
        for s in reversed(self.slices):
            if s["name"] == name and s["end"] is None:
                s["end"] = time.time()
                return

    def finish(self) -> None:
        with _LOCK:
            _RING.append(dataclasses.asdict(self))
        if _TRACER is not None:
            root_start = min(
                (s["start"] for s in self.slices), default=time.time()
            )
            with _TRACER.start_as_current_span(
                "request", start_time=int(root_start * 1e9)
            ) as root:
                root.set_attribute("rid", self.trace_id)
                for s in self.slices:
                    if s["end"] is None:
                        continue
                    sp = _TRACER.start_span(
                        s["name"], start_time=int(s["start"] * 1e9)
                    )
                    sp.end(end_time=int(s["end"] * 1e9))


def recent_traces(n: int = 32) -> List[Dict]:
    with _LOCK:
        return list(_RING)[-n:]
