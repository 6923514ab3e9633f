"""Gateway rate limiting: token buckets + bounded concurrency queue.

Behavioral reference: sgl-model-gateway/src/middleware (rate limiting /
max-concurrency with a bounded wait queue; requests beyond the queue get
429). Redesigned for asyncio: the token bucket is a plain monotonic-time
refill (no background task), and the concurrency gate is a semaphore with
a bounded waiter count plus a queue timeout.
"""

from __future__ import annotations

import asyncio
import time
from typing import Dict, Optional


class TokenBucket:
    """Classic token bucket: `rate` tokens/s, capacity `burst`."""

    def __init__(self, rate: float, burst: float):
        self.rate = float(rate)
        self.burst = float(burst)
        self.tokens = float(burst)
        self.last = time.monotonic()

    def try_acquire(self, n: float = 1.0) -> bool:
        now = time.monotonic()
        self.tokens = min(self.burst, self.tokens + (now - self.last) * self.rate)
        self.last = now
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False

    def time_until(self, n: float = 1.0) -> float:
        """Seconds until `n` tokens will be available (0 if now)."""
        if self.tokens >= n:
            return 0.0
        return (n - self.tokens) / self.rate if self.rate > 0 else float("inf")


class KeyedRateLimiter:
    """Per-key (API key / client IP) token buckets with idle eviction."""

    def __init__(self, rate: float, burst: float, max_keys: int = 4096):
        self.rate = rate
        self.burst = burst
        self.max_keys = max_keys
        self.buckets: Dict[str, TokenBucket] = {}

    def try_acquire(self, key: str, n: float = 1.0) -> bool:
        b = self.buckets.get(key)
        if b is None:
            if len(self.buckets) >= self.max_keys:
                # evict the stalest bucket
                stale = min(self.buckets, key=lambda k: self.buckets[k].last)
                del self.buckets[stale]
            b = self.buckets[key] = TokenBucket(self.rate, self.burst)
        return b.try_acquire(n)


class RateLimitExceeded(Exception):
    def __init__(self, retry_after: float = 1.0):
        super().__init__("rate limit exceeded")
        self.retry_after = retry_after


class ConcurrencyGate:
    """At most `max_concurrent` requests in flight; up to `max_queue`
    more wait (FIFO) for at most `timeout` seconds; the rest get 429."""

    def __init__(self, max_concurrent: int, max_queue: int = 0,
                 timeout: float = 30.0):
        self.max_concurrent = max_concurrent
        self.max_queue = max_queue
        self.timeout = timeout
        self._sem = asyncio.Semaphore(max_concurrent)
        self._waiting = 0

    @property
    def waiting(self) -> int:
        return self._waiting

    async def __aenter__(self):
        if self._sem.locked():
            if self._waiting >= self.max_queue:
                raise RateLimitExceeded(retry_after=self.timeout)
            self._waiting += 1
            try:
                await asyncio.wait_for(self._sem.acquire(), self.timeout)
            except asyncio.TimeoutError:
                raise RateLimitExceeded(retry_after=self.timeout) from None
            finally:
                self._waiting -= 1
        else:
            await self._sem.acquire()
        return self

    async def __aexit__(self, *exc):
        self._sem.release()
        return False


class RetryConfig:
    """Exponential backoff with a per-attempt worker re-pick (the failed
    worker is excluded on the retry)."""

    def __init__(self, max_retries: int = 1, base_backoff: float = 0.2,
                 max_backoff: float = 5.0, factor: float = 2.0):
        self.max_retries = max_retries
        self.base_backoff = base_backoff
        self.max_backoff = max_backoff
        self.factor = factor

    def backoff(self, attempt: int) -> float:
        return min(self.max_backoff, self.base_backoff * self.factor ** attempt)
