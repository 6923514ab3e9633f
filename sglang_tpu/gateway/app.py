"""Gateway HTTP application: routing, PD dispatch, limits, retries.

Behavioral reference: sgl-model-gateway/src/ (Rust): `routers/` (regular
+ PD routers), `middleware` (auth, rate limits), `service_discovery`,
`data_connector` (conversations), `core/` (worker registry). The
per-request hot core (radix tree, registry, circuit breaker, policy
selection) is native C++ (csrc/gateway_core.cpp); this module is the
asyncio shell: proxying with retries/backoff, PD dual dispatch,
discovery reconciliation, admin/metrics endpoints.
"""

from __future__ import annotations

import asyncio
import itertools
import json
import logging
import random
import time
from typing import Dict, List, Optional, Tuple

import aiohttp
from aiohttp import web

from sglang_tpu.gateway.conversations import add_routes as add_conversation_routes
from sglang_tpu.gateway.conversations import make_store
from sglang_tpu.gateway.discovery import (
    FileDiscovery,
    HttpDiscovery,
    WorkerSpec,
)
from sglang_tpu.gateway.pd import PDPool
from sglang_tpu.gateway.rate_limit import (
    ConcurrencyGate,
    KeyedRateLimiter,
    RateLimitExceeded,
    RetryConfig,
)

logger = logging.getLogger(__name__)

RETRYABLE_STATUS = {500, 502, 503, 504}


class CharTree:
    """Approximate radix tree over request-text prefixes per worker
    (character granularity, like the reference's gateway tree). Python
    fallback when the native core is unavailable."""

    def __init__(self, max_nodes: int = 1 << 16):
        self.root: Dict = {}
        self.count = 0
        self.max_nodes = max_nodes

    def insert(self, text: str, worker: int, chunk: int = 16) -> None:
        node = self.root
        for i in range(0, min(len(text), 512), chunk):
            key = text[i : i + chunk]
            nxt = node.get(key)
            if nxt is None:
                if self.count >= self.max_nodes:
                    return
                nxt = {"_w": set()}
                node[key] = nxt
                self.count += 1
            nxt["_w"].add(worker)
            node = nxt

    def match(self, text: str, chunk: int = 16) -> Dict[int, int]:
        """worker -> matched chars."""
        scores: Dict[int, int] = {}
        node = self.root
        depth = 0
        for i in range(0, min(len(text), 512), chunk):
            nxt = node.get(text[i : i + chunk])
            if nxt is None:
                break
            depth += chunk
            for w in nxt["_w"]:
                scores[w] = depth
            node = nxt
        return scores


class Worker:
    def __init__(self, url: str, spec: Optional[WorkerSpec] = None):
        self.url = url.rstrip("/")
        self.spec = spec or WorkerSpec(url=self.url)
        self.healthy = True
        self.inflight = 0
        self.consecutive_failures = 0
        self.total_requests = 0
        self.total_failures = 0


class Router:
    """The gateway. Regular mode routes each request to one worker by
    policy; PD mode (prefill+decode pools) dual-dispatches with bootstrap
    injection. Optional api-key auth, per-key token-bucket rate limits,
    bounded concurrency with queuing, retries with exponential backoff,
    file/HTTP discovery, and conversation storage."""

    def __init__(self, workers: List[str], policy: str = "cache_aware",
                 use_native: bool = True,
                 pd_prefill: Optional[List[WorkerSpec]] = None,
                 pd_decode: Optional[List[WorkerSpec]] = None,
                 api_key: Optional[str] = None,
                 rate_limit_rps: float = 0.0,
                 rate_limit_burst: float = 0.0,
                 max_concurrent: int = 0,
                 max_queue: int = 64,
                 queue_timeout: float = 60.0,
                 retries: int = 1,
                 discovery=None,
                 conversation_store: str = "none",
                 conversation_db: Optional[str] = None,
                 health_interval: float = 5.0):
        self.workers = [Worker(u) for u in workers]
        self.policy = policy
        self.core = None
        if use_native:
            try:
                from sglang_tpu.gateway_core import GatewayCore

                self.core = GatewayCore()
                for w in self.workers:
                    self.core.add_worker(w.url)
            except Exception as e:  # noqa: BLE001
                logger.warning(
                    "native gateway core unavailable (%s); "
                    "falling back to the Python tree", e,
                )
        self.tree = CharTree()
        self._rr = itertools.count()
        self._sticky: Dict[str, int] = {}  # manual policy (py fallback)
        self.session: Optional[aiohttp.ClientSession] = None

        self.pd_pool = None
        if pd_prefill or pd_decode:
            self.pd_pool = PDPool(pd_prefill or [], pd_decode or [],
                                  policy if policy in
                                  ("round_robin", "random") else
                                  "shortest_queue")
        self.api_key = api_key
        self.rate_limiter = (
            KeyedRateLimiter(rate_limit_rps, rate_limit_burst or
                             max(rate_limit_rps, 1.0))
            if rate_limit_rps > 0 else None
        )
        self.gate = (
            ConcurrencyGate(max_concurrent, max_queue, queue_timeout)
            if max_concurrent > 0 else None
        )
        self.retry = RetryConfig(max_retries=retries)
        self.discovery = discovery
        self.conversations = (
            make_store(conversation_store, conversation_db)
            if conversation_store != "none" else None
        )
        self.health_interval = health_interval
        self.start_time = time.time()
        self.total_requests = 0
        self.total_rate_limited = 0
        self.total_retries = 0

    # ----------------------------------------------------------- registry
    def _alive(self) -> List[Tuple[int, Worker]]:
        return [(i, w) for i, w in enumerate(self.workers) if w.healthy]

    def sync_workers(self, specs: List[WorkerSpec]) -> None:
        """Reconcile against a discovery snapshot."""
        regular = [s for s in specs if s.role == "regular"]
        pd_specs = [s for s in specs if s.role in ("prefill", "decode")]
        if self.pd_pool is None and pd_specs:
            self.pd_pool = PDPool([], [])
        if self.pd_pool is not None:
            self.pd_pool.sync(
                [s for s in specs if s.role == "prefill"],
                [s for s in specs if s.role == "decode"],
            )
        by_url = {w.url: w for w in self.workers}
        new = [by_url.get(s.url) or Worker(s.url, s) for s in regular]
        if [w.url for w in new] != [w.url for w in self.workers]:
            logger.info("discovery: workers now %s", [w.url for w in new])
            self.workers = new
            if self.core is not None:
                # registry indices shift on reconcile: rebuild
                from sglang_tpu.gateway_core import GatewayCore

                self.core = GatewayCore()
                for w in self.workers:
                    self.core.add_worker(w.url)

    def record_insert(self, text: str, idx: int) -> None:
        if self.core is not None:
            self.core.insert(text, idx)
        else:
            self.tree.insert(text, idx)

    def pick(self, text: str, exclude: Optional[set] = None,
             key: str = "") -> Tuple[int, Worker]:
        exclude = exclude or set()
        if self.core is not None and not exclude:
            i = self.core.pick(text or "", self.policy, key=key or "")
            if i < 0:
                raise web.HTTPServiceUnavailable(text="no healthy workers")
            return i, self.workers[i]
        alive = [(i, w) for i, w in self._alive() if i not in exclude]
        if not alive:
            raise web.HTTPServiceUnavailable(text="no healthy workers")
        if self.policy == "round_robin":
            i = next(self._rr) % len(alive)
            return alive[i]
        if self.policy == "random":
            return random.choice(alive)
        if self.policy == "shortest_queue":
            return min(alive, key=lambda x: x[1].inflight)
        if self.policy == "power_of_two":
            # two distinct random choices, lower load wins
            # (ref sgl-model-gateway/src/policies/power_of_two.rs)
            if len(alive) == 1:
                return alive[0]
            a, b = random.sample(alive, 2)
            return a if a[1].inflight <= b[1].inflight else b
        if self.policy in ("consistent_hashing", "prefix_hash"):
            # stable hash of the routing key (or request prefix) over the
            # alive list; prefix_hash falls back to least-loaded when the
            # hash choice is overloaded (ref policies/{consistent_hashing,
            # prefix_hash}.rs — the native core carries the true ring).
            hkey = key if self.policy == "consistent_hashing" else (
                text or "")[:512]
            if not hkey:
                return (random.choice(alive)
                        if self.policy == "consistent_hashing"
                        else min(alive, key=lambda x: x[1].inflight))
            import hashlib

            hv = int.from_bytes(
                hashlib.blake2b(hkey.encode(), digest_size=8).digest(),
                "big",
            )
            cand = min(
                alive,
                key=lambda x: int.from_bytes(hashlib.blake2b(
                    (x[1].url + str(hv)).encode(), digest_size=8
                ).digest(), "big"),
            )  # rendezvous hashing: same stability property as a ring
            if self.policy == "prefix_hash":
                avg = sum(w.inflight for _, w in alive) / len(alive)
                if cand[1].inflight > avg * 1.25 + 1.0:
                    return min(alive, key=lambda x: x[1].inflight)
            return cand
        if self.policy == "bucket":
            hkey = key or (text or "")[:512]
            start = hash(hkey) % len(alive)
            return alive[start]
        if self.policy == "manual":
            if not key:
                return random.choice(alive)
            pinned = self._sticky.get(key)
            for i, w in alive:
                if i == pinned:
                    return i, w
            choice = random.choice(alive)
            self._sticky[key] = choice[0]
            return choice
        # cache_aware: best prefix match unless its queue is much longer
        scores = self.tree.match(text or "")
        best = None
        for i, w in alive:
            s = scores.get(i, 0)
            if best is None or s > best[2]:
                best = (i, w, s)
        i, w, s = best
        least_i, least_w = min(alive, key=lambda x: x[1].inflight)
        if s == 0 or w.inflight > least_w.inflight + 8:
            return least_i, least_w
        return i, w

    async def health_loop(self) -> None:
        while True:
            pd_workers = (
                self.pd_pool.prefill + self.pd_pool.decode
                if self.pd_pool is not None else []
            )
            for w in list(self.workers) + pd_workers:
                try:
                    async with self.session.get(
                        w.url + "/health",
                        timeout=aiohttp.ClientTimeout(total=5),
                    ) as r:
                        ok = r.status == 200
                except Exception:  # noqa: BLE001
                    ok = False
                is_regular = isinstance(w, Worker) and w in self.workers
                if ok:
                    w.healthy = True
                    w.consecutive_failures = 0
                    if self.core is not None and is_regular:
                        self.core.set_health(self.workers.index(w), True)
                else:
                    w.consecutive_failures += 1
                    if self.core is not None and is_regular:
                        # native circuit breaker mirrors the state
                        w.healthy = self.core.record_failure(
                            self.workers.index(w), threshold=3
                        )
                    elif w.consecutive_failures >= 3:  # circuit breaker
                        w.healthy = False
            await asyncio.sleep(self.health_interval)

    # ------------------------------------------------------------ middleware
    def _check_auth(self, request: web.Request) -> Optional[web.Response]:
        if not self.api_key:
            return None
        auth = request.headers.get("Authorization", "")
        key = auth[7:] if auth.startswith("Bearer ") else \
            request.headers.get("X-API-Key", "")
        if key != self.api_key:
            return web.json_response(
                {"error": {"message": "invalid api key",
                           "type": "authentication_error"}}, status=401)
        return None

    def _client_key(self, request: web.Request) -> str:
        auth = request.headers.get("Authorization", "")
        if auth.startswith("Bearer "):
            return auth[7:]
        peer = request.transport.get_extra_info("peername") \
            if request.transport else None
        return peer[0] if peer else "anon"

    # ------------------------------------------------------------- handlers
    @staticmethod
    def _extract_text(body: Dict) -> str:
        text = body.get("text") or ""
        if not text and body.get("messages"):
            text = json.dumps(body["messages"])[:512]
        if not text and body.get("prompt"):
            p = body["prompt"]
            text = p if isinstance(p, str) else json.dumps(p)[:512]
        if not text and body.get("input_ids"):
            text = json.dumps(body["input_ids"])[:512]
        return text

    async def proxy(self, request: web.Request) -> web.StreamResponse:
        denied = self._check_auth(request)
        if denied is not None:
            return denied
        if self.rate_limiter is not None and not self.rate_limiter.try_acquire(
            self._client_key(request)
        ):
            self.total_rate_limited += 1
            return web.json_response(
                {"error": {"message": "rate limit exceeded",
                           "type": "rate_limit_error"}},
                status=429, headers={"Retry-After": "1"})
        body_bytes = await request.read()
        body: Dict = {}
        try:
            body = json.loads(body_bytes) if body_bytes else {}
        except ValueError:
            pass
        self.total_requests += 1
        try:
            if self.gate is not None:
                async with self.gate:
                    return await self._dispatch(request, body_bytes, body)
            return await self._dispatch(request, body_bytes, body)
        except RateLimitExceeded as e:
            self.total_rate_limited += 1
            return web.json_response(
                {"error": {"message": "too many concurrent requests",
                           "type": "rate_limit_error"}},
                status=429,
                headers={"Retry-After": str(int(e.retry_after))})

    async def _dispatch(self, request, body_bytes: bytes,
                        body: Dict) -> web.StreamResponse:
        # MCP tool loop (ref routers/mcp_utils.rs): the gateway drives
        # tool execution for requests carrying type:"mcp" tools.
        if (request.path == "/v1/chat/completions"
                and not body.get("stream")
                and any(t.get("type") == "mcp"
                        for t in body.get("tools") or [])):
            return await self._dispatch_mcp(request, body)
        if self.pd_pool is not None and request.path in (
            "/generate", "/v1/completions", "/v1/chat/completions"
        ):
            return await self._dispatch_pd(request, body)
        text = self._extract_text(body)
        key = (request.headers.get("X-SMG-Routing-Key")
               or body.get("routing_key") or "")
        tried: set = set()
        for attempt in range(self.retry.max_retries + 1):
            idx, worker = self.pick(text, exclude=tried, key=key)
            tried.add(idx)
            worker.inflight += 1
            worker.total_requests += 1
            if self.core is not None:
                self.core.inc_inflight(idx)
            started_stream = False
            try:
                async with self.session.request(
                    request.method,
                    worker.url + request.path_qs,
                    data=body_bytes,
                    headers={"Content-Type":
                             request.headers.get("Content-Type",
                                                 "application/json")},
                    timeout=aiohttp.ClientTimeout(total=3600),
                ) as upstream:
                    if (upstream.status in RETRYABLE_STATUS
                            and attempt < self.retry.max_retries):
                        worker.total_failures += 1
                        raise _RetryableError(upstream.status)
                    if text:
                        self.record_insert(text, idx)
                    resp = web.StreamResponse(
                        status=upstream.status,
                        headers=upstream.headers.copy(),
                    )
                    await resp.prepare(request)
                    started_stream = True
                    async for chunk in upstream.content.iter_any():
                        await resp.write(chunk)
                    return resp
            except _RetryableError:
                pass
            except (aiohttp.ClientError, asyncio.TimeoutError) as e:
                worker.total_failures += 1
                if started_stream or attempt >= self.retry.max_retries:
                    raise web.HTTPBadGateway(text=f"upstream failed: {e}")
            finally:
                worker.inflight -= 1
                if self.core is not None:
                    self.core.dec_inflight(idx)
            self.total_retries += 1
            await asyncio.sleep(self.retry.backoff(attempt))
        raise web.HTTPBadGateway(text="all retries exhausted")

    async def _dispatch_mcp(self, request, body: Dict) -> web.Response:
        """Run the MCP tool loop: every model turn goes through the
        normal worker-pick path; MCP servers are called from here."""
        from sglang_tpu.gateway.mcp import run_mcp_tool_loop

        async def forward(chat_body: Dict) -> Dict:
            text = self._extract_text(chat_body)
            idx, worker = self.pick(text)
            worker.inflight += 1
            worker.total_requests += 1
            try:
                async with self.session.post(
                    worker.url + "/v1/chat/completions", json=chat_body,
                    timeout=aiohttp.ClientTimeout(total=3600),
                ) as upstream:
                    if upstream.status >= 400:
                        worker.total_failures += 1
                        raise web.HTTPBadGateway(
                            text=f"upstream {upstream.status}")
                    if text:
                        self.record_insert(text, idx)
                    return await upstream.json()
            finally:
                worker.inflight -= 1

        result = await run_mcp_tool_loop(forward, body,
                                         session=self.session)
        return web.json_response(result)

    async def _dispatch_pd(self, request,
                           body: Dict) -> web.StreamResponse:
        """PD dual dispatch: POST the mutated request to the prefill AND
        decode engines concurrently; stream the decode side back. On a
        prefill failure the parked decode request is aborted by rid."""
        pair = self.pd_pool.pick_pair()
        if pair is None:
            raise web.HTTPServiceUnavailable(text="no healthy PD pair")
        pbody, dbody = PDPool.mutate_bodies(body, pair)
        rid = dbody.get("rid") or ("gwreq-" + pair.room)
        dbody["rid"] = rid
        pbody["rid"] = rid + "-prefill"
        pair.prefill.inflight += 1
        pair.decode.inflight += 1
        timeout = aiohttp.ClientTimeout(total=3600)

        async def run_prefill_and_watch():
            """If the prefill side dies, the decode request is parked on a
            KV handoff that will never arrive — abort it by rid so the
            client's stream terminates instead of hanging."""
            try:
                async with self.session.post(
                    pair.prefill.url + request.path, json=pbody,
                    timeout=timeout
                ) as r:
                    await r.read()
                    status = r.status
            except (aiohttp.ClientError, asyncio.TimeoutError):
                status = 599
            if status >= 400:
                pair.prefill.consecutive_failures += 1
                try:
                    await self.session.post(
                        pair.decode.url + "/abort_request",
                        json={"rid": rid},
                        timeout=aiohttp.ClientTimeout(total=10),
                    )
                except aiohttp.ClientError:
                    pass
            return status

        ptask = asyncio.ensure_future(run_prefill_and_watch())
        try:
            async with self.session.post(
                pair.decode.url + request.path, json=dbody, timeout=timeout
            ) as upstream:
                resp = web.StreamResponse(
                    status=upstream.status, headers=upstream.headers.copy()
                )
                await resp.prepare(request)
                async for chunk in upstream.content.iter_any():
                    await resp.write(chunk)
                return resp
        finally:
            pair.prefill.inflight -= 1
            pair.decode.inflight -= 1
            if not ptask.done():
                # client disconnected mid-flight: let the prefill finish in
                # the background (its watcher aborts the decode on failure)
                ptask.add_done_callback(lambda t: t.exception())

    # --------------------------------------------------------------- admin
    async def list_workers(self, request: web.Request) -> web.Response:
        out = {
            "workers": [
                {"url": w.url, "healthy": w.healthy, "inflight": w.inflight,
                 "total_requests": w.total_requests,
                 "total_failures": w.total_failures}
                for w in self.workers
            ],
            "policy": self.policy,
        }
        if self.pd_pool is not None:
            out["pd"] = self.pd_pool.stats()
        return web.json_response(out)

    async def add_worker(self, request: web.Request) -> web.Response:
        body = await request.json()
        spec = WorkerSpec.parse(body)
        if spec.role == "prefill" and self.pd_pool is not None:
            from sglang_tpu.gateway.pd import PDWorker

            self.pd_pool.prefill.append(PDWorker(spec))
        elif spec.role == "decode" and self.pd_pool is not None:
            from sglang_tpu.gateway.pd import PDWorker

            self.pd_pool.decode.append(PDWorker(spec))
        else:
            self.workers.append(Worker(spec.url, spec))
            if self.core is not None:
                self.core.add_worker()
        return web.json_response({"success": True})

    async def remove_worker(self, request: web.Request) -> web.Response:
        body = await request.json()
        url = body["url"].rstrip("/")
        before = len(self.workers)
        self.sync_workers(
            [w.spec for w in self.workers if w.url != url]
            + ([s for s in
                ([w.spec for w in self.pd_pool.prefill]
                 + [w.spec for w in self.pd_pool.decode])
                if s.url != url] if self.pd_pool is not None else [])
        )
        return web.json_response({"success": len(self.workers) < before})

    async def metrics(self, request: web.Request) -> web.Response:
        lines = [
            "# TYPE sglang_gateway_requests_total counter",
            f"sglang_gateway_requests_total {self.total_requests}",
            "# TYPE sglang_gateway_rate_limited_total counter",
            f"sglang_gateway_rate_limited_total {self.total_rate_limited}",
            "# TYPE sglang_gateway_retries_total counter",
            f"sglang_gateway_retries_total {self.total_retries}",
            "# TYPE sglang_gateway_uptime_seconds gauge",
            f"sglang_gateway_uptime_seconds {time.time() - self.start_time:.1f}",
        ]
        for w in self.workers:
            lab = f'{{worker="{w.url}"}}'
            lines += [
                f"sglang_gateway_worker_healthy{lab} {int(w.healthy)}",
                f"sglang_gateway_worker_inflight{lab} {w.inflight}",
                f"sglang_gateway_worker_requests_total{lab} {w.total_requests}",
                f"sglang_gateway_worker_failures_total{lab} {w.total_failures}",
            ]
        if self.gate is not None:
            lines.append(
                f"sglang_gateway_queue_waiting {self.gate.waiting}"
            )
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def health(self, request: web.Request) -> web.Response:
        pd_ok = (
            self.pd_pool is None
            or (any(w.healthy for w in self.pd_pool.prefill)
                and any(w.healthy for w in self.pd_pool.decode))
        )
        ok = (bool(self._alive()) or self.pd_pool is not None) and pd_ok
        return web.Response(text="ok" if ok else "unhealthy",
                            status=200 if ok else 503)

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=64 * 1024 * 1024)

        async def on_start(app_):
            self.session = aiohttp.ClientSession()
            asyncio.get_event_loop().create_task(self.health_loop())
            if self.discovery is not None:
                asyncio.get_event_loop().create_task(
                    self.discovery.run(self.sync_workers)
                )

        app.on_startup.append(on_start)
        app.router.add_get("/router/workers", self.list_workers)
        app.router.add_post("/router/add_worker", self.add_worker)
        app.router.add_post("/router/remove_worker", self.remove_worker)
        app.router.add_get("/router/metrics", self.metrics)
        app.router.add_get("/router/health", self.health)
        if self.conversations is not None:
            add_conversation_routes(app, self.conversations)
        app.router.add_route("*", "/{path:.*}", self.proxy)
        return app


class _RetryableError(Exception):
    def __init__(self, status: int):
        super().__init__(f"upstream status {status}")
        self.status = status


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser("sglang-tpu gateway")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--workers", nargs="*", default=[])
    parser.add_argument("--prefill", nargs="*", default=[],
                        help="PD mode: prefill worker URLs")
    parser.add_argument("--decode", nargs="*", default=[],
                        help="PD mode: decode worker URLs")
    parser.add_argument(
        "--policy",
        default="cache_aware",
        choices=["cache_aware", "round_robin", "random", "shortest_queue",
                 "power_of_two", "consistent_hashing", "prefix_hash",
                 "bucket", "manual"],
    )
    parser.add_argument("--api-key", default=None)
    parser.add_argument("--rate-limit-rps", type=float, default=0.0)
    parser.add_argument("--rate-limit-burst", type=float, default=0.0)
    parser.add_argument("--max-concurrent", type=int, default=0)
    parser.add_argument("--max-queue", type=int, default=64)
    parser.add_argument("--queue-timeout", type=float, default=60.0)
    parser.add_argument("--retries", type=int, default=1)
    parser.add_argument("--discovery-file", default=None)
    parser.add_argument("--discovery-url", default=None)
    parser.add_argument("--conversation-store", default="none",
                        choices=["none", "memory", "sqlite"])
    parser.add_argument("--conversation-db", default=None)
    args = parser.parse_args(argv)
    discovery = None
    if args.discovery_file:
        discovery = FileDiscovery(args.discovery_file)
    elif args.discovery_url:
        discovery = HttpDiscovery(args.discovery_url)
    router = Router(
        args.workers, args.policy,
        pd_prefill=[WorkerSpec.parse(u) for u in args.prefill],
        pd_decode=[WorkerSpec.parse(u) for u in args.decode],
        api_key=args.api_key,
        rate_limit_rps=args.rate_limit_rps,
        rate_limit_burst=args.rate_limit_burst,
        max_concurrent=args.max_concurrent,
        max_queue=args.max_queue,
        queue_timeout=args.queue_timeout,
        retries=args.retries,
        discovery=discovery,
        conversation_store=args.conversation_store,
        conversation_db=args.conversation_db,
    )
    web.run_app(router.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
