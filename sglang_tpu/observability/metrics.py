"""Prometheus metrics.

Ref: srt/observability/metrics_collector.py:238 (SchedulerMetricsCollector
gauges/counters/histograms) and tokenizer-side TTFT/ITL histograms. Two
collectors: SchedulerMetrics lives in the scheduler process and snapshots
are shipped to the API process inside control responses; TokenizerMetrics
(TTFT/ITL/e2e histograms) lives in the API process and backs /metrics.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

from prometheus_client import (
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
    generate_latest,
)

_TIME_BUCKETS = (
    0.001, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0,
    30.0, 60.0, 120.0, 300.0,
)


@dataclasses.dataclass
class SchedulerStats:
    """Snapshot shipped from the scheduler over ZMQ."""

    num_running_reqs: int = 0
    num_waiting_reqs: int = 0
    num_generated_tokens: int = 0
    num_prefill_tokens: int = 0
    num_cached_tokens: int = 0
    free_pages: int = 0
    radix_pages: int = 0
    token_usage: float = 0.0
    gen_throughput: float = 0.0


class TokenizerMetrics:
    """API-process metrics: request latency histograms + scheduler gauges."""

    def __init__(self, model_name: str):
        self.registry = CollectorRegistry()
        labels = {"model_name": model_name}
        self.labels = labels

        def gauge(name, doc):
            return Gauge(
                name, doc, list(labels.keys()), registry=self.registry
            ).labels(**labels)

        def counter(name, doc):
            return Counter(
                name, doc, list(labels.keys()), registry=self.registry
            ).labels(**labels)

        def hist(name, doc, buckets=_TIME_BUCKETS):
            return Histogram(
                name, doc, list(labels.keys()), buckets=buckets,
                registry=self.registry,
            ).labels(**labels)

        self.num_running = gauge(
            "sglang:num_running_reqs", "Running requests on the scheduler"
        )
        self.num_waiting = gauge(
            "sglang:num_queue_reqs", "Waiting requests on the scheduler"
        )
        self.token_usage = gauge("sglang:token_usage", "KV token usage ratio")
        self.cache_hit_rate = gauge(
            "sglang:cache_hit_rate", "Radix cache hit rate"
        )
        self.gen_throughput = gauge(
            "sglang:gen_throughput", "Decode tokens/s"
        )
        self.prompt_tokens_total = counter(
            "sglang:prompt_tokens_total", "Prefill tokens processed"
        )
        self.generation_tokens_total = counter(
            "sglang:generation_tokens_total", "Tokens generated"
        )
        self.cached_tokens_total = counter(
            "sglang:cached_tokens_total", "Prefix-cache tokens reused"
        )
        self.num_requests_total = counter(
            "sglang:num_requests_total", "Requests completed"
        )
        self.ttft = hist(
            "sglang:time_to_first_token_seconds", "TTFT (s)"
        )
        self.itl = hist(
            "sglang:inter_token_latency_seconds", "Inter-token latency (s)",
            buckets=(0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.25, 0.5, 1.0, 2.0),
        )
        self.e2e = hist(
            "sglang:e2e_request_latency_seconds", "End-to-end latency (s)"
        )

        self._last_counts = dict(prompt=0, gen=0, cached=0)

    def observe_request(self, ttft: Optional[float], e2e: float,
                        itl_samples=()):
        if ttft is not None:
            self.ttft.observe(ttft)
        self.e2e.observe(e2e)
        for itl in itl_samples:
            self.itl.observe(itl)
        self.num_requests_total.inc()

    def update_scheduler_stats(self, s: Dict) -> None:
        self.num_running.set(s.get("running_requests", 0))
        self.num_waiting.set(s.get("waiting_requests", 0))
        self.token_usage.set(s.get("token_usage", 0.0))
        self.gen_throughput.set(s.get("gen_throughput", 0.0))
        for key, counter, field in (
            ("prompt", self.prompt_tokens_total, "prefill_tokens"),
            ("gen", self.generation_tokens_total, "generated_tokens"),
            ("cached", self.cached_tokens_total, "cached_tokens"),
        ):
            cur = s.get(field, 0)
            delta = cur - self._last_counts[key]
            if delta > 0:
                counter.inc(delta)
                self._last_counts[key] = cur

    def render(self) -> bytes:
        return generate_latest(self.registry)
